"""AOT serving export: checkpoint -> self-contained StableHLO artifact.

Production-deployment story the reference cannot offer (its serving
artifact is a pickle that needs the exact torch model classes on the
loading side, ref trainer.py:428-476): `export_serving` serializes the
predictor's jitted forward — fused mel-normalized input -> backbone ->
argmax grid decode, with the trained weights baked in as constants — via
`jax.export` (StableHLO). The artifact is loadable by ANY process with
jax installed (`load_serving`), with no seld_tpu model code, no flax, and
no checkpoint tree; it can also be consumed by non-JAX StableHLO
runtimes (IFRT/PJRT serving stacks).

The exported signature matches SELDPredictor._forward:
    (batch_windows, window_frames, C_feat, n_mels) float32
        -> (batch_windows, window_frames, n_cells) int8 class grid

Grid models also get `<out>.probs` (the softmax probability forward,
the overlapped-serving executable) and the sidecar embeds the full
config, so `SELDPredictor.from_artifact(path)` reconstructs a complete
predictor — every serving surface (predict, streaming, the TCP daemon)
— from the artifact alone, with no checkpoint tree or Flax rebuild.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from seld_tpu.postprocess import validate_width
from seld_tpu.utils.logging import get_logger


def export_serving(
    checkpoint_dir,
    out_path,
    batch_windows: int = 8,
    platforms: tuple[str, ...] | None = None,
    cfg=None,
    int8_calib_waves=None,
    int8_calib_mel=None,
    int8_weight_only: bool = False,
    bg_bias: float = 0.0,
    median_filter: int = 0,
    accdoa_threshold: float | None = None,
) -> Path:
    """Export the checkpoint's forward pass; returns the artifact path.

    Writes `<out_path>` (serialized StableHLO) and `<out_path>.json`
    (shapes + grid geometry + source checkpoint metadata). `cfg` is the
    fallback architecture config for checkpoint trees without an embedded
    config (same semantics as SELDPredictor's cfg argument).

    Passing `int8_calib_waves` ((C, N) float32 waveforms) and/or
    `int8_calib_mel` ((B, win, C, F) batches) exports the INT8
    post-training-quantized forward instead (seld_tpu.quant): the int8
    weights and scales bake into the artifact, so the StableHLO runs the
    MXU int8 path on TPU consumers with no seld_tpu code on the loading
    side.
    """
    from jax import export as jexport

    from seld_tpu.infer import SELDPredictor

    # bg_bias (grid models) / accdoa_threshold (ACCDOA models): the
    # validation-tuned decode operating point bakes into the exported
    # forwards (see SELDPredictor.bg_bias / .accdoa_threshold)
    p = SELDPredictor(checkpoint_dir, cfg, batch_windows=batch_windows,
                      bg_bias=bg_bias, accdoa_threshold=accdoa_threshold)
    if int8_calib_waves is not None or int8_calib_mel is not None:
        # weight-only: int8 storage (smaller artifact), original-
        # precision compute — near-float accuracy without the MXU int8
        # path; default: full w8a8 (1.33x measured serving speedup)
        p.quantize(calib_waves=int8_calib_waves, calib_mel=int8_calib_mel,
                   weight_only=int8_weight_only)
    cfg = p.cfg
    from seld_tpu.features.spatial import feature_channels

    n_feat_ch = feature_channels(cfg.features.feature_set, cfg.model.n_channels)
    mel_shape = jax.ShapeDtypeStruct(
        (batch_windows, p.win, n_feat_ch, cfg.model.n_mels), np.float32
    )

    state = p.state

    def forward(mel):  # weights baked in as constants
        return p._forward(state, mel)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(forward), **kwargs)(mel_shape)

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(exported.serialize())

    # Every model also exports the REPRESENTATION forward (the
    # overlapped-serving executable: softmax probs for grid models,
    # vectors for ACCDOA, class-activity votes for multi-ACCDOA) to
    # `<out>.probs`, so an artifact-backed predictor
    # (SELDPredictor.from_artifact) serves every mode the
    # checkpoint-backed one does.
    def forward_probs(mel):
        return p._forward_probs(state, mel)

    exported_probs = jexport.export(jax.jit(forward_probs), **kwargs)(
        mel_shape
    )
    Path(str(out_path) + ".probs").write_bytes(exported_probs.serialize())

    from seld_tpu.config import config_to_dict

    sidecar = {
        "input_shape": list(mel_shape.shape),
        "input_dtype": "float32",
        "output": "int8 argmax class grid (B, T, n_cells)",
        "n_el": cfg.grid.n_el,
        "n_az": cfg.grid.n_az,
        "num_classes": cfg.grid.num_classes,
        "model_type": cfg.model.model_type,
        "feature_set": cfg.features.feature_set,
        "window_frames": p.win,
        "batch_windows": int(batch_windows),
        "has_probs": True,  # sidecar key kept for pre-overlap artifacts
        "platforms": list(exported.platforms),
        "source_epoch": int(p.meta["epoch"]),
        "quantized_int8": bool(p.quantized),
        "int8_weight_only": bool(p.quantized and int8_weight_only),
        "bg_bias": float(bg_bias),
        # baked into the argmax/vote forwards; also read back host-side
        # by from_artifact for the single-ACCDOA overlap decode
        "accdoa_threshold": float(p.accdoa_threshold),
        # host-side post-op: recorded so from_artifact applies the tuned
        # width automatically (not baked into the device program)
        "median_filter": int(validate_width(median_filter)),
        # Full config: lets SELDPredictor.from_artifact rebuild the
        # feature front-end + window geometry with no checkpoint tree.
        "config": config_to_dict(cfg),
    }
    Path(str(out_path) + ".json").write_text(json.dumps(sidecar, indent=2))
    get_logger().info(
        "Exported %s (%s, epoch %d) -> %s (%.1f MB, platforms %s)",
        cfg.model.model_type, cfg.features.feature_set, p.meta["epoch"],
        out_path, out_path.stat().st_size / 1e6, list(exported.platforms),
    )
    return out_path


def load_serving(path):
    """Load an exported artifact; returns (callable(mel) -> int8 grid,
    sidecar dict). Needs only jax — no model code, no checkpoint."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    sidecar = json.loads(Path(str(path) + ".json").read_text())
    return exported.call, sidecar
