"""Flash-style blocked self-attention Pallas kernels (forward + backward).

The reference computes full (T x T) attention scores per head in one shot
(ref model_conformer.py:53-63) — fine at its fixed T=250, but quadratic
HBM traffic blocks longer analysis windows (SURVEY §5: keep longer windows
possible). The forward kernel never materializes the score matrix: each
(batch, head, q-block) program streams K/V blocks through VMEM with an
online softmax (running max + normalizer), producing exact attention in
O(T) memory and saving the per-row logsumexp for the backward.

The backward is the standard FlashAttention-2 scheme, also O(T) memory:
  * delta = rowsum(dO * O) per query row (one XLA elementwise pass);
  * a dQ kernel over (bh, q-block) programs recomputes score blocks
    p = exp(s - lse), forms ds = p (dp - delta) scale and accumulates
    dq += ds K, streaming K/V;
  * a dK/dV kernel over (bh, k-block) programs streams Q/dO blocks and
    accumulates dv += p^T dO and dk += ds^T Q.

Streaming is expressed in the grid (round-3 rework, VERDICT r2 #5/#7):
every kernel runs on a (bh, outer-block, reduction-block) grid whose
innermost dimension walks the streamed operand via index-mapped
BlockSpecs, so VMEM holds only one (block x d) tile of each operand at a
time — never a whole padded (T, d) operand. Running state (online-softmax
max/normalizer/accumulator, or the dk/dv accumulators) lives in VMEM
scratch, initialized when the reduction index is 0 and emitted on its
last step (TPU grids iterate the last dimension innermost, so the
revisited output block pattern is exact). This lifts the practical T
ceiling from ~8192 (VMEM-bound) to HBM-bound lengths (T=16384 validated
on chip).

Nothing of size (T x T) ever hits HBM in either direction, so long-window
TRAINING is O(T) memory too (round-1's einsum VJP rematerialized the full
probability tensor). The einsum VJP is kept as `bwd_impl="xla"`, the
correctness oracle for parity tests.

Layout: q/k/v (BH, T, Dh) with T padded to the block size and Dh
lane-padded to 128 outside the kernels. Padded keys are masked to -inf
before the running max; padded query rows carry zero dO so their
contributions vanish. Matmuls accumulate in f32 on the MXU; softmax math
is f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512-blocks measured 6.3x faster than 128-blocks at T=2048 on v5e
# (fewer, larger MXU contractions; same exact result).
BLOCK_Q = 512
BLOCK_K = 512
NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref,
                acc_ref, m_ref, denom_ref, *, scale: float,
                t_actual: int, num_k_blocks: int):
    kb = pl.program_id(2)
    block_k = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        denom_ref[...] = jnp.zeros_like(denom_ref)

    q = q_ref[0]      # (BQ, D)
    k_blk = k_ref[0]  # (BK, D) — this reduction step's streamed block
    v_blk = v_ref[0]
    scores = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (BQ, BK)
    key_idx = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1
    )
    scores = jnp.where(key_idx < t_actual, scores, NEG_INF)

    m_run = m_ref[...]
    m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_run - m_new)
    p = jnp.exp(scores - m_new)
    denom_ref[...] = denom_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(kb == num_k_blocks - 1)
    def _emit():
        denom = jnp.maximum(denom_ref[...], 1e-30)
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(denom)  # (BQ, 1)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc_ref, *, scale: float, t_actual: int,
                   num_k_blocks: int):
    kb = pl.program_id(2)
    block_k = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)

    q = q_ref[0]            # (BQ, D)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]        # (BQ, 1) f32
    delta = delta_ref[0]    # (BQ, 1) f32
    k_blk = k_ref[0]        # (BK, D) — streamed
    v_blk = v_ref[0]
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < t_actual, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK); padded keys -> exp(-inf) = 0
    dp = jax.lax.dot_general(
        do.astype(v_blk.dtype), v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * scale).astype(k_blk.dtype)
    dq_acc_ref[...] = dq_acc_ref[...] + jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == num_k_blocks - 1)
    def _emit():
        dq_ref[0] = dq_acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc_ref, dv_acc_ref, *, scale: float,
                    t_actual: int, num_q_blocks: int):
    qb = pl.program_id(2)
    kb = pl.program_id(1)
    k_blk = k_ref[0]  # (BK, D) — this program's key block
    v_blk = v_ref[0]
    block_k = k_blk.shape[0]
    block_q = q_ref.shape[1]

    @pl.when(qb == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    key_idx = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    q = q_ref[0]      # (BQ, D) — streamed
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]        # (BQ, 1)
    delta = delta_ref[0]    # (BQ, 1)
    s = (
        jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    s = jnp.where(key_idx < t_actual, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK)
    dv_acc_ref[...] = dv_acc_ref[...] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, D)
    dp = jax.lax.dot_general(
        do.astype(v_blk.dtype), v_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    ds = p * (dp - delta) * scale
    dk_acc_ref[...] = dk_acc_ref[...] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, D)

    @pl.when(qb == num_q_blocks - 1)
    def _emit():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _block_geometry(t: int, d: int):
    """Adaptive blocks: one block when T is small, 512 tiles when long."""
    block = min(BLOCK_Q, -(-t // 128) * 128)
    t_pad = -(-t // block) * block
    d_pad = -(-d // 128) * 128
    return block, t_pad, d_pad


def flash_attention(q, k, v, *, scale: float | None = None,
                    interpret: bool = False, bwd_impl: str = "pallas"):
    """q, k, v: (B, H, T, Dh) -> (B, H, T, Dh); exact softmax attention.

    Differentiable: forward and backward both run blocked Pallas kernels
    (FlashAttention-2 scheme, O(T) memory end to end). bwd_impl="xla"
    selects the einsum VJP instead (materializes the (T x T) probabilities;
    kept as the correctness oracle for tests).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    assert bwd_impl in ("pallas", "xla"), bwd_impl
    return _flash_attention(float(scale), bool(interpret), bwd_impl, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_attention(scale, interpret, bwd_impl, q, k, v):
    out, _ = _flash_attention_fwd_impl(scale, interpret, q, k, v)
    return out


def _flash_attention_fwd(scale, interpret, bwd_impl, q, k, v):
    out, lse = _flash_attention_fwd_impl(scale, interpret, q, k, v)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(scale, interpret, bwd_impl, residuals, g):
    q, k, v, out, lse = residuals
    if bwd_impl == "xla":
        return _flash_attention_bwd_xla(scale, q, k, v, g)
    return _flash_attention_bwd_pallas(scale, interpret, q, k, v, out, lse, g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _flash_attention_bwd_xla(scale, q, k, v, g):
    """Einsum VJP (rematerializes the full probability tensor) — the
    reference-shaped oracle; O(T^2) memory, fine at T<=1024."""
    f32 = jnp.float32
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=f32)
    probs = jax.nn.softmax(scores.astype(f32) * scale, axis=-1)
    dv = jnp.einsum("bhts,bhtd->bhsd", probs.astype(q.dtype), g,
                    preferred_element_type=f32).astype(v.dtype)
    dp = jnp.einsum("bhtd,bhsd->bhts", g, v, preferred_element_type=f32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = jnp.einsum("bhts,bhsd->bhtd", ds, k, preferred_element_type=f32)
    dk = jnp.einsum("bhts,bhtd->bhsd", ds, q, preferred_element_type=f32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv


def _outer_blk3(block, d_pad):
    """Operand blocked along the OUTER grid dim (constant over the
    streamed reduction dim)."""
    return pl.BlockSpec(
        (1, block, d_pad), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM
    )


def _stream_blk3(block, d_pad):
    """Operand streamed by the innermost reduction grid dim."""
    return pl.BlockSpec(
        (1, block, d_pad), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM
    )


def _outer_blk2(block):
    return pl.BlockSpec(
        (1, block, 1), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM
    )


def _stream_blk2(block):
    return pl.BlockSpec(
        (1, block, 1), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM
    )


def _flash_attention_fwd_impl(scale, interpret, q, k, v):
    b, h, t, d = q.shape
    block, t_pad, d_pad = _block_geometry(t, d)
    nblk = t_pad // block

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    bh = b * h

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=float(scale), t_actual=t, num_k_blocks=nblk
        ),
        grid=(bh, nblk, nblk),
        in_specs=[_outer_blk3(block, d_pad),
                  _stream_blk3(block, d_pad), _stream_blk3(block, d_pad)],
        out_specs=[_outer_blk3(block, d_pad), _outer_blk2(block)],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d_pad), jnp.float32),  # acc
            pltpu.VMEM((block, 1), jnp.float32),      # running max
            pltpu.VMEM((block, 1), jnp.float32),      # denom
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d_pad,
            bytes_accessed=3 * bh * t_pad * d_pad * q.dtype.itemsize
            + bh * t_pad * d_pad * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t, :d].reshape(b, h, t, d), lse


def _flash_attention_bwd_pallas(scale, interpret, q, k, v, out, lse, g):
    b, h, t, d = q.shape
    block, t_pad, d_pad = _block_geometry(t, d)
    nblk = t_pad // block
    bh = b * h

    def prep(x):
        x = x.reshape(bh, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    qp, kp, vp, dop = prep(q), prep(k), prep(v), prep(g)
    # delta = rowsum(dO * O) per query row; padded rows are zero.
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(bh, t, 1)
    delta = jnp.pad(delta, ((0, 0), (0, t_pad - t), (0, 0)))

    matmul_flops = 4 * bh * t_pad * t_pad * d_pad

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=float(scale), t_actual=t, num_k_blocks=nblk
        ),
        grid=(bh, nblk, nblk),
        in_specs=[_outer_blk3(block, d_pad),                        # q
                  _stream_blk3(block, d_pad),                       # k
                  _stream_blk3(block, d_pad),                       # v
                  _outer_blk3(block, d_pad),                        # dO
                  _outer_blk2(block), _outer_blk2(block)],          # lse, delta
        out_specs=_outer_blk3(block, d_pad),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block, d_pad), jnp.float32)],   # dq acc
        cost_estimate=pl.CostEstimate(
            flops=3 * matmul_flops // 2,
            bytes_accessed=5 * bh * t_pad * d_pad * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=float(scale), t_actual=t, num_q_blocks=nblk
        ),
        grid=(bh, nblk, nblk),
        in_specs=[_stream_blk3(block, d_pad),                       # q
                  _outer_blk3(block, d_pad),                        # k
                  _outer_blk3(block, d_pad),                        # v
                  _stream_blk3(block, d_pad),                       # dO
                  _stream_blk2(block), _stream_blk2(block)],        # lse, delta
        out_specs=[_outer_blk3(block, d_pad), _outer_blk3(block, d_pad)],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, d_pad), jnp.float32),  # dk acc
            pltpu.VMEM((block, d_pad), jnp.float32),  # dv acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * matmul_flops,
            bytes_accessed=5 * bh * t_pad * d_pad * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    unpad = lambda x: x[:, :t, :d].reshape(b, h, t, d)
    return unpad(dq), unpad(dk), unpad(dv)
