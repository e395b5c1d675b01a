"""Model registry: ModelConfig -> Flax module.

Replaces the reference's if/elif dispatch on Config.MODEL_TYPE
(ref trainer.py:50-95) with a declarative registry; every backbone shares
the (B, T, C, F) -> (B, T, M, G) class-major contract (ref
verify_dims.py:14-23 uses (..., G, M)).
"""

from __future__ import annotations

import jax.numpy as jnp

from seld_tpu.config import GridConfig, ModelConfig
from seld_tpu.models.conformer import SELDConformer
from seld_tpu.models.crnn import SELDCRNN
from seld_tpu.models.cspdarknet import SELDCSPDarkNet
from seld_tpu.models.resnet_conformer import SELDResNetConformer


def _dtypes(cfg: ModelConfig):
    return dict(
        dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
        norm_dtype=jnp.dtype(cfg.norm_dtype),
    )


def _build_crnn(cfg: ModelConfig, grid: GridConfig):
    return SELDCRNN(
        grid_size=(grid.n_el, grid.n_az),
        num_classes=cfg.num_classes,
        cnn_channels=cfg.crnn_cnn_channels,
        rnn_hidden=cfg.crnn_rnn_hidden,
        rnn_layers=cfg.crnn_rnn_layers,
        dropout=cfg.crnn_dropout,
        **_dtypes(cfg),
    )


def _build_conformer(cfg: ModelConfig, grid: GridConfig):
    return SELDConformer(
        grid_size=(grid.n_el, grid.n_az),
        num_classes=cfg.num_classes,
        cnn_channels=cfg.crnn_cnn_channels,
        d_model=cfg.conf_d_model,
        n_heads=cfg.conf_n_heads,
        n_layers=cfg.conf_n_layers,
        kernel_size=cfg.conf_kernel_size,
        dropout=cfg.conf_dropout,
        remat=cfg.remat,
        **_dtypes(cfg),
    )


def _build_resnet_conformer(cfg: ModelConfig, grid: GridConfig):
    return SELDResNetConformer(
        grid_size=(grid.n_el, grid.n_az),
        num_classes=cfg.num_classes,
        d_model=cfg.resnet_conf_d_model,
        n_heads=cfg.resnet_conf_n_heads,
        n_layers=cfg.resnet_conf_n_layers,
        dropout=cfg.resnet_dropout,
        remat=cfg.remat,
        **_dtypes(cfg),
    )


def _build_cspdarknet(cfg: ModelConfig, grid: GridConfig):
    return SELDCSPDarkNet(
        grid_size=(grid.n_el, grid.n_az),
        num_classes=cfg.num_classes,
        use_small=cfg.csp_use_small,
        **_dtypes(cfg),
    )


def _build_accdoa_conformer(cfg: ModelConfig, grid: GridConfig, tracks: int = 1):
    from seld_tpu.accdoa import SELDConformerACCDOA

    return SELDConformerACCDOA(
        num_tracks=tracks,
        num_event_classes=grid.num_classes - 1,
        cnn_channels=cfg.crnn_cnn_channels,
        d_model=cfg.conf_d_model,
        n_heads=cfg.conf_n_heads,
        n_layers=cfg.conf_n_layers,
        kernel_size=cfg.conf_kernel_size,
        dropout=cfg.conf_dropout,
        **_dtypes(cfg),
    )


MODEL_REGISTRY = {
    "crnn": _build_crnn,
    "conformer": _build_conformer,
    "resnet_conformer": _build_resnet_conformer,
    "cnn": _build_cspdarknet,  # the reference's name for CSPDarkNet
    "cspdarknet": _build_cspdarknet,
    # ACCDOA output representation (vectors, not grid logits):
    "accdoa_conformer": _build_accdoa_conformer,
    # multi-ACCDOA: 3 track slots per class (ADPIT training) — supports
    # same-class overlapping sources (Shimada et al. 2022)
    "multi_accdoa_conformer": lambda cfg, grid: _build_accdoa_conformer(
        cfg, grid, tracks=3
    ),
}

ACCDOA_MODELS = {"accdoa_conformer", "multi_accdoa_conformer"}
MULTI_ACCDOA_MODELS = {"multi_accdoa_conformer"}


def build_model(model_cfg: ModelConfig, grid_cfg: GridConfig | None = None):
    grid_cfg = grid_cfg or GridConfig(num_classes=model_cfg.num_classes)
    try:
        factory = MODEL_REGISTRY[model_cfg.model_type]
    except KeyError:
        raise ValueError(
            f"unknown model_type {model_cfg.model_type!r}; "
            f"available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return factory(model_cfg, grid_cfg)
