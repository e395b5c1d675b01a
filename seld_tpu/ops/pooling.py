"""Adaptive average pooling as matrix multiplication.

The reference maps the fused CSPDarkNet feature map onto the (I, J) DOA
grid with `nn.AdaptiveAvgPool2d((18, 36))` (ref: model.py:161, 204).
Adaptive pooling with data-independent static shapes is a fixed linear
map, so on TPU we build the exact per-axis averaging matrices once and
apply them as two matmuls — MXU work instead of a gather/scatter pattern.

Torch adaptive_avg_pool semantics: output index i averages input indices
[floor(i * in / out), ceil((i + 1) * in / out)).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) float32 matrix M with x_out = x_in @ M."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[start:end, i] = 1.0 / (end - start)
    return m


def adaptive_avg_pool_2d(x, out_hw: tuple[int, int]):
    """x: (..., H, W, C) NHWC -> (..., out_h, out_w, C), exact torch
    adaptive_avg_pool2d semantics via two matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    mh = jnp.asarray(adaptive_pool_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(adaptive_pool_matrix(w, out_w), dtype=x.dtype)
    x = jnp.einsum("...hwc,hi->...iwc", x, mh)
    x = jnp.einsum("...iwc,wj->...ijc", x, mw)
    return x
