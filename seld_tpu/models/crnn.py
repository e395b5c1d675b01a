"""SELD CRNN: CNN encoder + bidirectional GRU + grid head.

Capability parity with ref model_crnn.py:19-127: 4x ConvBlock pooling
freq 64 -> 4 (time preserved), 2-layer bidirectional GRU hidden 256 with
inter-layer dropout, head Linear 512 -> LayerNorm -> ReLU -> Dropout ->
Linear to G*M.

TPU design notes: the GRU recurrence is a `lax.scan` under the hood
(flax nn.RNN), the one inherently sequential op in the framework
(SURVEY §5 long-context note). Each scan step is a (B, 3H) x (H, 3H)
matmul — MXU work — and the CNN encoder and head amortize the scan.
Layout is NHWC; contract: (B, T, C, F) -> (B, T, M, G) float32 logits
(class-major).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.models.layers import CNNEncoder, GridHead


class BiGRU(nn.Module):
    """Stacked bidirectional GRU, torch-style: per layer, forward and
    backward GRUs run over the sequence and concatenate; dropout between
    layers only (ref nn.GRU(dropout=...) semantics, model_crnn.py:65-72)."""

    hidden: int
    num_layers: int = 2
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for layer in range(self.num_layers):
            cell_kwargs = dict(
                features=self.hidden, dtype=self.dtype, param_dtype=self.param_dtype
            )
            fwd = nn.RNN(nn.GRUCell(**cell_kwargs), name=f"gru_fwd_{layer}")
            bwd = nn.RNN(
                nn.GRUCell(**cell_kwargs), reverse=True, keep_order=True,
                name=f"gru_bwd_{layer}",
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            if layer + 1 < self.num_layers and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class SELDCRNN(nn.Module):
    """(B, T, C, F) -> (B, T, M, G) logits (class-major)."""

    grid_size: tuple[int, int] = (18, 36)
    num_classes: int = 14
    cnn_channels: Sequence[int] = (64, 128, 256, 512)
    rnn_hidden: int = 256
    rnn_layers: int = 2
    dropout: float = 0.3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nkw = dict(norm_dtype=self.norm_dtype, **kw)
        x = x.astype(self.dtype)
        # (B, T, C, F) -> NHWC (B, T, F, C)
        x = jnp.swapaxes(x, 2, 3)
        x = CNNEncoder(tuple(self.cnn_channels), **nkw)(x, train=train)
        x = BiGRU(self.rnn_hidden, self.rnn_layers, self.dropout, **kw)(x, train=train)
        return GridHead(
            hidden=512,
            grid_cells=self.grid_size[0] * self.grid_size[1],
            num_classes=self.num_classes,
            dropout=self.dropout,
            **nkw,
        )(x, train=train)
