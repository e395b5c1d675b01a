"""SELD Conformer: CNN encoder + Conformer blocks + grid head.

Capability parity with ref model_conformer.py:116-215: the CRNN's CNN
encoder, linear projection to d_model=256, N=2 ConformerBlocks (half-step
FFNs, 4-head MHSA, depthwise-conv module k=31), and the shared FC head.
Contract: (B, T, C, F) -> (B, T, M, G) float32 logits (class-major).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.models.layers import CNNEncoder, ConformerBlock, GridHead


class SELDConformer(nn.Module):
    grid_size: tuple[int, int] = (18, 36)
    num_classes: int = 14
    cnn_channels: Sequence[int] = (64, 128, 256, 512)
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 2
    kernel_size: int = 31
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    remat: str = "none"  # 'none' | 'conformer' | 'all'

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nkw = dict(norm_dtype=self.norm_dtype, **kw)
        x = x.astype(self.dtype)
        x = jnp.swapaxes(x, 2, 3)  # (B, T, F, C) NHWC
        x = CNNEncoder(tuple(self.cnn_channels), **nkw)(x, train=train)
        x = nn.Dense(self.d_model, name="proj", **kw)(x)
        block_cls = (
            nn.remat(ConformerBlock, static_argnums=(2,))
            if self.remat in ("conformer", "all") else ConformerBlock
        )
        for i in range(self.n_layers):
            x = block_cls(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=4 * self.d_model,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                name=f"block_{i}",
                **nkw,
            )(x, train)
        return GridHead(
            hidden=512,
            grid_cells=self.grid_size[0] * self.grid_size[1],
            num_classes=self.num_classes,
            dropout=self.dropout,
            **nkw,
        )(x, train=train)
