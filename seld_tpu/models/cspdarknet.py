"""SELD CSPDarkNet ('cnn' model type): per-frame YOLOv5-style backbone with
multi-scale fusion and grid pooling.

Capability parity with ref model.py:5-221: Conv(=conv+BN+SiLU), residual
Bottleneck, CSP C3 blocks, SPPF, a 4-stage backbone emitting [P2..P5];
the SELD head folds time into batch — each frame is a (F, 1) image —
reduces P3/P4/P5 to 256 channels, bilinearly upsamples to P3's size,
fuses, pools adaptively onto the (I, J) DOA grid, L2-normalizes each cell
and applies a shared 256->128->M classifier.

TPU design notes: the (B*T, F, 1, C) per-frame batching maps directly to
XLA's batched convolutions (huge effective batch, great MXU utilization);
adaptive grid pooling is two exact matmuls (seld_tpu.ops.pooling) instead
of a pooling gather; bilinear upsampling uses jax.image.resize with
half-pixel centers (torch align_corners=False semantics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from seld_tpu.models.layers import BN_EPS, BN_MOMENTUM
from seld_tpu.ops.pooling import adaptive_avg_pool_2d


class ConvBnSiLU(nn.Module):
    """Conv + BN + SiLU (ref model.py:5-14)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.norm_dtype,
            param_dtype=self.param_dtype,
        )(x)
        return nn.silu(x).astype(self.dtype)


class CSPBottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (ref model.py:17-26)."""

    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        y = ConvBnSiLU(self.features, 1, 1, 0, **kw)(x, train=train)
        y = ConvBnSiLU(self.features, 3, 1, 1, **kw)(y, train=train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C3(nn.Module):
    """CSP block with 3 convs (ref model.py:29-42)."""

    features: int
    n_blocks: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        hidden = self.features // 2
        a = ConvBnSiLU(hidden, 1, 1, 0, name="cv1", **kw)(x, train=train)
        for i in range(self.n_blocks):
            a = CSPBottleneck(hidden, self.shortcut, name=f"m{i}", **kw)(a, train=train)
        b = ConvBnSiLU(hidden, 1, 1, 0, name="cv2", **kw)(x, train=train)
        return ConvBnSiLU(self.features, 1, 1, 0, name="cv3", **kw)(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (ref model.py:45-59)."""

    features: int
    kernel: int = 5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        hidden = x.shape[-1] // 2
        x = ConvBnSiLU(hidden, 1, 1, 0, name="cv1", **kw)(x, train=train)
        p = self.kernel // 2
        pool = lambda v: nn.max_pool(
            v, (self.kernel, self.kernel), strides=(1, 1), padding=((p, p), (p, p))
        )
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBnSiLU(self.features, 1, 1, 0, name="cv2", **kw)(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train=train
        )


def _scaled(c: int, width: float) -> int:
    return max(round(c * width), 1)


def _depth(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class CSPDarkNet(nn.Module):
    """Stem + 4 stages -> multi-scale [P2, P3, P4, P5] (ref model.py:62-109)."""

    depth_multiple: float = 1.0
    width_multiple: float = 1.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        w, d = self.width_multiple, self.depth_multiple
        x = ConvBnSiLU(_scaled(64, w), 3, 1, 1, name="stem", **kw)(x, train=train)
        feats = []
        for stage, (ch, n) in enumerate(zip((128, 256, 512, 1024), (3, 6, 9, 3))):
            x = ConvBnSiLU(_scaled(ch, w), 3, 2, 1, name=f"down{stage}", **kw)(
                x, train=train
            )
            x = C3(_scaled(ch, w), _depth(n, d), name=f"c3_{stage}", **kw)(
                x, train=train
            )
            if stage == 3:
                x = SPPF(_scaled(1024, w), name="sppf", **kw)(x, train=train)
            feats.append(x)
        return feats  # [P2, P3, P4, P5]


class SELDCSPDarkNet(nn.Module):
    """(B, T, C, F) -> (B, T, M, G) class-major logits (ref
    model.py:112-221 emits (..., G, M)). The per-cell classifier computes
    (B*T, G, M) naturally; one output transpose re-emits the repo-wide
    class-major layout (the same transpose every model paid inside the
    fused-loss path before the layout switch)."""

    grid_size: tuple[int, int] = (18, 36)
    num_classes: int = 14
    use_small: bool = True
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        b, t, c, f = x.shape
        # Fold time into batch; each frame is an (F, 1) 'image' in NHWC
        # (ref model.py:182 uses (B*T, C, F, 1) NCHW).
        x = x.astype(self.dtype).reshape(b * t, c, f, 1)
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B*T, F, 1, C)

        depth, width = (0.33, 0.5) if self.use_small else (1.0, 1.0)
        feats = CSPDarkNet(depth, width, name="backbone", **kw)(x, train=train)
        p3, p4, p5 = feats[1], feats[2], feats[3]

        reduce = lambda name: nn.Conv(
            256, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        p3 = reduce("reduce_p3")(p3)
        p4 = reduce("reduce_p4")(p4)
        p5 = reduce("reduce_p5")(p5)

        target = p3.shape[1:3]
        resize = lambda v: jax.image.resize(
            v, (v.shape[0], *target, v.shape[-1]), method="bilinear"
        ).astype(self.dtype)
        fused = jnp.concatenate([p3, resize(p4), resize(p5)], axis=-1)

        # conv_fuse: 3x3 -> BN -> SiLU -> 1x1 -> BN -> SiLU (ref model.py:150-157)
        fused = ConvBnSiLU(512, 3, 1, 1, name="fuse1", **kw)(fused, train=train)
        fused = ConvBnSiLU(256, 1, 1, 0, name="fuse2", **kw)(fused, train=train)

        grid = adaptive_avg_pool_2d(fused, self.grid_size)  # (B*T, I, J, 256)
        g = self.grid_size[0] * self.grid_size[1]
        grid = grid.reshape(b * t, g, 256)

        # Per-cell L2 normalization (ref model.py:210)
        norm = jnp.sqrt(jnp.sum(jnp.square(grid.astype(jnp.float32)), -1, keepdims=True))
        grid = (grid.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(self.dtype)

        # Shared per-cell classifier 256 -> 128 -> M (ref model.py:164-170)
        dkw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.Dense(128, name="cls1", **dkw)(grid)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.num_classes, name="cls2", **dkw)(y)
        y = y.reshape(b, t, g, self.num_classes).astype(jnp.float32)
        return jnp.swapaxes(y, 2, 3)  # (B, T, M, G) class-major
