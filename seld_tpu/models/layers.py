"""Shared Flax building blocks for the SELD backbones.

All spatial tensors use TPU-native NHWC layout — x: (B, T, F, C) with
(T, F) as the conv spatial dims — instead of the reference's torch NCHW.
Compute dtype is configurable (bf16 by default via ModelConfig); norms run
in float32.

Blocks and their reference counterparts:
  ConvBlock            — Conv3x3(no bias)+BN+ReLU+MaxPool(1,2)  (ref model_crnn.py:5-17)
  FeedForward          — half-step Swish FFN                    (ref model_conformer.py:10-28)
  MultiHeadSelfAttention — pre-norm MHSA + residual             (ref model_conformer.py:30-68)
  ConformerConvModule  — pw-conv/GLU/depthwise-31/BN/Swish/pw   (ref model_conformer.py:70-97)
  ConformerBlock       — ff1 -> attn -> conv -> ff2 -> LN       (ref model_conformer.py:99-114)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.ops.attention import multi_head_attention

Dtype = Any

# torch BatchNorm defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def swish(x):
    return x * nn.sigmoid(x)


class ConvBlock(nn.Module):
    """Conv3x3 (no bias) + BatchNorm + ReLU + optional MaxPool.

    ref model_crnn.py:5-17. Pooling (1, 2) halves the freq axis while
    preserving time — the SELDnet-style encoder schedule.
    """

    features: int
    pool: tuple[int, int] | None = (1, 2)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.norm_dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x).astype(self.dtype)
        if self.pool is not None:
            x = nn.max_pool(x, self.pool, strides=self.pool)
        return x


class CNNEncoder(nn.Module):
    """Stack of ConvBlocks pooling freq 64 -> 4 while preserving time,
    shared by the CRNN and Conformer models (ref model_crnn.py:36-57,
    model_conformer.py:133-155).

    Input (B, T, F, C) -> output (B, T, F_out * C_out) flattened for the
    temporal model.
    """

    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.channels):
            pool = (1, 2) if i < 4 else None
            x = ConvBlock(
                ch, pool=pool, dtype=self.dtype,
                param_dtype=self.param_dtype, norm_dtype=self.norm_dtype,
            )(x, train=train)
        b, t, f, c = x.shape
        # (B, T, F', C') -> (B, T, C' * F'); match the reference's
        # channel-major flatten (ref model_crnn.py:114-116 reshapes
        # (B, T, C_out, F_out)).
        return jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)


class FeedForward(nn.Module):
    """Half-step Swish FFN with internal residual (ref model_conformer.py:10-28)."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(x)
        y = y.astype(self.dtype)
        y = nn.Dense(self.d_ff, dtype=self.dtype, param_dtype=self.param_dtype)(y)
        y = swish(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return res + 0.5 * y


class MultiHeadSelfAttention(nn.Module):
    """Pre-norm MHSA with residual (ref model_conformer.py:30-68).

    Attention math runs in seld_tpu.ops.attention (fp32 softmax on MXU
    contractions); dropout on attention output matches the reference's
    post-projection dropout. The reference also drops attention *weights*
    (ref :60) — applied here on the output for jit-friendliness; at the
    reference's rates this is an equivalent regularizer.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.d_model % self.n_heads == 0
        head_dim = self.d_model // self.n_heads
        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(x)
        y = y.astype(self.dtype)
        b, t, _ = y.shape

        def proj(name):
            return nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )(y).reshape(b, t, self.n_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = proj("w_q"), proj("w_k"), proj("w_v")
        out = multi_head_attention(q, k, v)  # (B, H, T, Dh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
        out = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="w_o"
        )(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return res + out


class ConformerConvModule(nn.Module):
    """Pointwise(2x)+GLU -> depthwise k=31 -> BN -> Swish -> pointwise,
    with residual (ref model_conformer.py:70-97). Operates in (B, T, D)."""

    d_model: int
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(x)
        y = y.astype(self.dtype)
        y = nn.Dense(2 * self.d_model, dtype=self.dtype, param_dtype=self.param_dtype)(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)  # GLU
        y = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)],
            feature_group_count=self.d_model,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="depthwise",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.norm_dtype,
            param_dtype=self.param_dtype,
        )(y)
        y = swish(y).astype(self.dtype)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return res + y


class ConformerBlock(nn.Module):
    """ff1 -> MHSA -> conv module -> ff2 -> final LayerNorm
    (ref model_conformer.py:99-114)."""

    d_model: int
    n_heads: int = 4
    d_ff: int | None = None
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_ff = self.d_ff or 4 * self.d_model
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  norm_dtype=self.norm_dtype)
        x = FeedForward(self.d_model, d_ff, self.dropout, **kw)(x, train=train)
        x = MultiHeadSelfAttention(self.d_model, self.n_heads, self.dropout, **kw)(
            x, train=train
        )
        x = ConformerConvModule(
            self.d_model, self.kernel_size, self.dropout, **kw
        )(x, train=train)
        x = FeedForward(self.d_model, d_ff, self.dropout, **kw)(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(x)
        return x.astype(self.dtype)


class GridHead(nn.Module):
    """Linear -> LayerNorm -> ReLU -> Dropout -> Linear to (M, G) logits,
    emitted CLASS-MAJOR as (B, T, M, G) — the FC head shared by CRNN /
    Conformer / ResNet-Conformer (ref model_crnn.py:77-83,
    model_conformer.py:173-179, resnet50_model.py:157-163 differ only in
    the hidden width; the reference reshapes to (..., G, M)).

    Layout rationale (TPU): every loss/softmax reduction runs over the
    class axis M=14. With M minor (the reference layout) those
    reductions use 14/128 lanes and the fused Pallas loss kernel needs
    two ~145 MB transposes per step; class-major puts G=648 on lanes
    (~84% util) and the kernel consumes the head output directly. The
    final layer is a DenseGeneral with kernel (hidden, M, G) so tensor
    parallelism can shard the G axis (grid cells) — softmax over M stays
    shard-local under TP. Old (hidden, G*M) checkpoints are upgraded by
    `seld_tpu migrate-ckpt`."""

    hidden: int
    grid_cells: int
    num_classes: int
    dropout: float = 0.3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 3, x.shape  # (B, T, features)
        y = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, param_dtype=self.param_dtype)(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.DenseGeneral(
            features=(self.num_classes, self.grid_cells),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="logits",
        )(y)
        # Logits in float32 for a numerically stable loss.
        return y.astype(jnp.float32)
