"""SELD ResNet50-Conformer — the flagship/default backbone.

Capability parity with ref resnet50_model.py:6-204: an audio-modified
ResNet50 (4-channel input, 3x3 stem, all strides (1, 2) so time is
preserved while frequency shrinks 64 -> 2; bottleneck counts [3, 4, 6, 3])
feeding d_model=512, 8-head, 4-layer Conformer blocks and a 1024-hidden
grid head.

TPU design notes: NHWC convolutions (XLA's native TPU layout); BN stats
in fp32 with bf16 compute; residual adds in compute dtype. The
frequency-only striding means each conv keeps a long (T=250) spatial dim —
good MXU tiling — while the flatten to (B, T, 2*2048) feeds the conformer
without any transpose-heavy reshaping.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConformerBlock, GridHead


class BottleneckBlock(nn.Module):
    """1x1 reduce -> 3x3 (freq stride) -> 1x1 expand(4x), residual + ReLU
    (ref resnet50_model.py:6-48)."""

    planes: int
    stride: tuple[int, int] = (1, 1)
    expansion: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.norm_dtype,
                param_dtype=self.param_dtype,
                name=name,
            )

        out_ch = self.planes * self.expansion
        identity = x
        y = nn.Conv(self.planes, (1, 1), name="conv1", **kw)(x)
        y = nn.relu(bn("bn1")(y)).astype(self.dtype)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, name="conv2", **kw)(y)
        y = nn.relu(bn("bn2")(y)).astype(self.dtype)
        y = nn.Conv(out_ch, (1, 1), name="conv3", **kw)(y)
        y = bn("bn3")(y).astype(self.dtype)

        if x.shape[-1] != out_ch or self.stride != (1, 1):
            identity = nn.Conv(
                out_ch, (1, 1), strides=self.stride, name="downsample", **kw
            )(x)
            identity = bn("downsample_bn")(identity).astype(self.dtype)
        return nn.relu(y + identity)


class ResNet50Encoder(nn.Module):
    """Audio ResNet50: (B, T, F, C) NHWC -> (B, T, F/32, 2048).

    Stem conv 3x3 stride (1, 2) + maxpool 3x3 stride (1, 2); stages
    [3, 4, 6, 3] with frequency-only striding in stages 2-4
    (ref resnet50_model.py:61-90).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        x = nn.Conv(
            64, (3, 3), strides=(1, 2), padding=1, use_bias=False, name="stem",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.norm_dtype,
            param_dtype=self.param_dtype,
            name="stem_bn",
        )(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(1, 2), padding=((1, 1), (1, 1)))

        # Activation checkpointing: recompute each bottleneck in the
        # backward pass instead of saving its internals (train is static
        # arg 2 of __call__).
        block_cls = (
            nn.remat(BottleneckBlock, static_argnums=(2,))
            if self.remat else BottleneckBlock
        )
        planes = (64, 128, 256, 512)
        strides = ((1, 1), (1, 2), (1, 2), (1, 2))
        for stage, (p, s, n) in enumerate(zip(planes, strides, self.layers)):
            for block in range(n):
                x = block_cls(
                    planes=p,
                    stride=s if block == 0 else (1, 1),
                    name=f"stage{stage + 1}_block{block}",
                    **kw,
                )(x, train)
        return x


class SELDResNetConformer(nn.Module):
    """(B, T, C, F) -> (B, T, M, G) class-major logits (ref resnet50_model.py:122-204 emits (..., G, M))."""

    grid_size: tuple[int, int] = (18, 36)
    num_classes: int = 14
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 4
    kernel_size: int = 31
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    # 'none' | 'resnet' | 'conformer' | 'all' (jax.checkpoint granularity)
    remat: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nkw = dict(norm_dtype=self.norm_dtype, **kw)
        x = x.astype(self.dtype)
        x = jnp.swapaxes(x, 2, 3)  # (B, T, F, C) NHWC
        x = ResNet50Encoder(
            remat=self.remat in ("resnet", "all"), **nkw
        )(x, train=train)  # (B, T, F/32, 2048)
        b, t, f, c = x.shape
        # Match the reference's channel-major flatten (C_out * F_out,
        # ref resnet50_model.py:186-188).
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        x = nn.Dense(self.d_model, name="proj", **kw)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        conformer_cls = (
            nn.remat(ConformerBlock, static_argnums=(2,))
            if self.remat in ("conformer", "all") else ConformerBlock
        )
        for i in range(self.n_layers):
            x = conformer_cls(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=4 * self.d_model,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                name=f"block_{i}",
                **nkw,
            )(x, train)
        return GridHead(
            hidden=1024,
            grid_cells=self.grid_size[0] * self.grid_size[1],
            num_classes=self.num_classes,
            dropout=self.dropout,
            **nkw,
        )(x, train=train)
