"""Ring attention: exact sequence-parallel attention over a time-sharded mesh.

Under sequence parallelism (`mesh.shard_time`: the window's time axis is
sharded over the model mesh axis) the reference-shaped einsum attention
(ref model_conformer.py:47-68) is GSPMD-partitionable but still
materializes O(T^2 / n) score blocks per device and all-gathers a full
operand axis. Ring attention removes both: each device keeps only its
local (B, H, T/n, Dh) query chunk plus ONE visiting key/value chunk, and
the chunks rotate around the mesh axis with `lax.ppermute` while an
online-softmax merge accumulates the exact global attention — the
standard TPU ring schedule (collectives ride ICI neighbor links; memory
is O(T/n) activations + O((T/n)^2) transient scores inside the flash
kernel's blocks, i.e. never materialized at all).

Compute reuses the streamed flash-attention Pallas kernels chunk-by-chunk
(seld_tpu.ops.flash_attention): the forward calls the flash forward on
(Q_local, K_chunk, V_chunk) — its per-row logsumexp output is exactly
what the cross-chunk merge needs — and the backward exploits that
FlashAttention-2's partials decompose over key chunks given the GLOBAL
logsumexp and delta:

  dQ_i  = sum_j ds_ij K_j          (accumulated locally as chunks visit)
  dK_j  = sum_i ds_ij^T Q_i        (accumulated on the rotating chunk)
  dV_j  = sum_i p_ij^T dO_i        (ditto)

where p = exp(s - lse_global) and delta_i = rowsum(dO_i * O_i) is local
per query row. So one ring pass over (K, V, dK_acc, dV_acc) computes the
whole backward with the unmodified per-chunk kernels.

Must be called INSIDE `jax.shard_map` with q/k/v already local time
chunks; dispatch (mesh plumbing, divisibility fallbacks) lives in
seld_tpu.ops.attention.multi_head_attention.

No reference counterpart (the reference is single-GPU, T=250 fixed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from seld_tpu.ops.flash_attention import (
    NEG_INF,
    _block_geometry,
    _flash_attention_bwd_pallas,
    _flash_attention_fwd_impl,
)


def ring_flash_attention(q, k, v, *, axis_name: str,
                         scale: float | None = None,
                         interpret: bool = False):
    """q, k, v: LOCAL (B, H, T_local, Dh) time chunks inside shard_map.

    Returns the exact global-softmax attention output for the local
    query rows, (B, H, T_local, Dh). Differentiable (custom VJP; the
    backward runs its own ring pass). All devices on `axis_name` must
    hold equal-length chunks (the dispatcher guarantees T % n == 0).

    Precision note: the merge itself runs in f32, but each chunk's
    partial output is emitted by the flash kernel in q.dtype first — in
    bfloat16 the ring result therefore carries up to n extra bf16
    roundings (~n * 4e-3 relative) vs the single-kernel flash path,
    which casts once from its f32 scratch. Exact in float32 (pinned by
    tests); within the documented ~2e-3-per-op bf16 noise floor
    otherwise.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _ring(float(scale), bool(interpret), axis_name, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ring(scale, interpret, axis_name, q, k, v):
    out, _ = _ring_fwd_impl(scale, interpret, axis_name, q, k, v)
    return out


def _ring_fwd(scale, interpret, axis_name, q, k, v):
    out, lse = _ring_fwd_impl(scale, interpret, axis_name, q, k, v)
    return out, (q, k, v, out, lse)


def _ring_fwd_impl(scale, interpret, axis_name, q, k, v):
    n = lax.axis_size(axis_name)
    b, h, t, d = q.shape
    _, t_pad, _ = _block_geometry(t, d)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(i, carry):
        k_c, v_c, o_run, lse_run = carry
        # Start the neighbor rotation BEFORE the chunk's compute: the
        # permute reads the same chunk the kernel reads (no dependence),
        # so the async collective-permute overlaps the flash kernel.
        k_nxt = lax.ppermute(k_c, axis_name, perm)
        v_nxt = lax.ppermute(v_c, axis_name, perm)
        o_c, lse_c = _flash_attention_fwd_impl(scale, interpret, q, k_c, v_c)
        # Exact online-softmax merge of the chunk's partial result into
        # the running global result (order-independent up to f32 rounding).
        lse_new = jnp.logaddexp(lse_run, lse_c)            # (bh, t_pad, 1)
        w_old = jnp.exp(lse_run - lse_new)[:, :t, :].reshape(b, h, t, 1)
        w_new = jnp.exp(lse_c - lse_new)[:, :t, :].reshape(b, h, t, 1)
        o_run = o_run * w_old + o_c.astype(jnp.float32) * w_new
        return (k_nxt, v_nxt, o_run, lse_new)

    o0 = jnp.zeros((b, h, t, d), jnp.float32)
    lse0 = jnp.full((b * h, t_pad, 1), NEG_INF, jnp.float32)
    # After n shifts every chunk has visited every device and is home.
    _, _, o_run, lse = lax.fori_loop(0, n, body, (k, v, o0, lse0))
    return o_run.astype(q.dtype), lse


def _ring_bwd(scale, interpret, axis_name, residuals, g):
    q, k, v, out, lse = residuals  # all local; lse is the GLOBAL merge
    n = lax.axis_size(axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]
    f32 = jnp.float32

    def body(i, carry):
        k_c, v_c, dk_c, dv_c, dq_acc = carry
        k_nxt = lax.ppermute(k_c, axis_name, perm)
        v_nxt = lax.ppermute(v_c, axis_name, perm)
        # Per-chunk FA-2 backward with the global lse: p = exp(s - lse)
        # and delta = rowsum(dO*O) (local per row) make every partial an
        # exact slice of the global gradient sums.
        dq_p, dk_p, dv_p = _flash_attention_bwd_pallas(
            scale, interpret, q, k_c, v_c, out, lse, g
        )
        dq_acc = dq_acc + dq_p.astype(f32)
        # dK/dV accumulators travel WITH their chunk around the ring.
        dk_c = lax.ppermute(dk_c + dk_p.astype(f32), axis_name, perm)
        dv_c = lax.ppermute(dv_c + dv_p.astype(f32), axis_name, perm)
        return (k_nxt, v_nxt, dk_c, dv_c, dq_acc)

    zero_kv = jnp.zeros(k.shape, f32)
    carry = (k, v, zero_kv, zero_kv, jnp.zeros(q.shape, f32))
    _, _, dk_acc, dv_acc, dq_acc = lax.fori_loop(0, n, body, carry)
    return (dq_acc.astype(q.dtype), dk_acc.astype(k.dtype),
            dv_acc.astype(v.dtype))


_ring.defvjp(_ring_fwd, _ring_bwd)
