"""Fused Pallas kernel for the grid-loss softmax region.

Why: the measured flagship train step spends 6.8 ms (MSE) / 7.8 ms
(3-term) of ~31 ms in the loss region (benchmarks/results/loss_cost.json)
— XLA materializes several full (B, T, M, G) float32 tensors for the
softmax, the squared error, and their backward. This kernel computes the
whole per-cell region in ONE pass over the logits:

  * softmax over classes (numerically stable, f32),
  * per-(b, t) row sums of (p - onehot(mask))^2  — the MSE numerator,
  * the background probability plane p_bg        — what the CL term
    needs (pred_nonbg = 1 - p_bg),

with a custom VJP whose backward recomputes p in one more pass and emits
   dlogits = g_sq * 2 p (r - c) + g_bg * p_bg (1[m=bg] - p)
where r = p - t, c = sum_m r_m p_m (softmax Jacobian applied to both
outputs).

Layout: the kernel wants classes on SUBLANES and grid cells on LANES —
(B*T, M, G) — because softmax reduces over M: class-minor (..., G, M)
would put M on 14/128 lanes (11% utilization). Since the round-3
class-major layout switch the models emit (B, T, M, G) natively, so the
kernel consumes a pure reshape of the head output (the two ~145 MB
transposes the class-minor layout needed are gone, forward and
backward); M=14 pads to 16 sublanes and G=648 to 768 lanes (~84% util).

The XLA (jnp) path in seld_tpu.losses stays the reference semantics and
the CPU/test oracle; interpret-mode parity is pinned in
tests/test_pallas_kernels.py.

STATUS (post-layout-switch): OPT-IN, no longer the default. The kernel
beat XLA only while the head was class-minor and XLA paid the 145 MB
transposes (27.3 vs 28.3 ms/step). With class-major logits the jnp
softmax region is lane-efficient and XLA fuses it into the surrounding
backward better than the custom-call boundary allows — measured b16
flagship: 25.4-26.5 ms/step XLA vs ~29.8 fused
(benchmarks/results/step_layout_ab.json, step_fused_confirm.json).
SELDLossFn.from_bitmask(fused=True) keeps it exercised; tests pin
values and gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 32  # (b*t) rows per program


def _bit_targets_tile(mask_tile, m_idx, num_classes: int):
    """(nb, M, G) one-hot from the (nb, 1, G) int32 bitmask tile."""
    event = ((mask_tile >> jnp.minimum(m_idx, num_classes - 2)) & 1)
    bg = (mask_tile == 0).astype(jnp.int32)
    return jnp.where(m_idx < num_classes - 1, event, bg).astype(jnp.float32)


def _softmax_tile(x):
    """Stable softmax over the class (sublane) axis of an (nb, M, G) tile."""
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(x_ref, mask_ref, sq_ref, pbg_ref, *, num_classes: int):
    x = x_ref[...].astype(jnp.float32)            # (nb, M, G)
    mask = mask_ref[...].astype(jnp.int32)        # (nb, 1, G)
    nb, M, G = x.shape
    m_idx = jax.lax.broadcasted_iota(jnp.int32, (nb, M, G), 1)
    p = _softmax_tile(x)
    t = _bit_targets_tile(mask, m_idx, num_classes)
    r = p - t
    # per-CELL partial sums (classes reduced in-kernel; the tiny lane/row
    # reductions finish in XLA) — keeps every ref free of trailing
    # singleton pairs, which Mosaic's layout inference rejects
    sq_ref[...] = jnp.sum(r * r, axis=1, keepdims=True)
    pbg_ref[...] = p[:, num_classes - 1 : num_classes, :]


def _bwd_kernel(x_ref, mask_ref, gsq_ref, gbg_ref, dx_ref, *,
                num_classes: int):
    x = x_ref[...].astype(jnp.float32)            # (nb, M, G)
    mask = mask_ref[...].astype(jnp.int32)        # (nb, 1, G)
    gsq = gsq_ref[...]                            # (nb, 1, G) f32
    gbg = gbg_ref[...]                            # (nb, 1, G) f32
    nb, M, G = x.shape
    m_idx = jax.lax.broadcasted_iota(jnp.int32, (nb, M, G), 1)
    p = _softmax_tile(x)
    t = _bit_targets_tile(mask, m_idx, num_classes)
    r = p - t
    c = jnp.sum(r * p, axis=1, keepdims=True)     # (nb, 1, G)
    is_bg = (m_idx == num_classes - 1).astype(jnp.float32)
    pbg = p[:, num_classes - 1 : num_classes, :]  # (nb, 1, G)
    dx = gsq * 2.0 * p * (r - c) + (gbg * pbg) * (is_bg - p)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _shard_rows(mesh):
    """(n_shards, wrapper) for running a rows-independent callable under
    shard_map over the mesh's data axis (the kernel is per-(b, t)-row
    independent, so batch sharding splits the row dim contiguously and
    needs no collectives). mesh=None -> identity.

    The ROW_BLOCK padding happens INSIDE the mapped callable (per shard):
    the global arrays are padded only to a multiple of n_shards, so
    shard boundaries coincide with the natural batch sharding and GSPMD
    inserts no resharding collectives around the kernel."""
    if mesh is None:
        return 1, lambda fn, n_in, n_out: fn
    from jax.sharding import PartitionSpec as P

    from seld_tpu.parallel.mesh import DATA_AXIS

    row_spec = P(DATA_AXIS, None, None)

    def wrap(fn, n_in, n_out):
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(row_spec,) * n_in,
            out_specs=(row_spec,) * n_out if n_out > 1 else row_spec,
            check_vma=False,
        )

    return mesh.shape[DATA_AXIS], wrap


def _with_local_row_pad(kernel_of_rows, n_out):
    """Wrap an (arrays sharing a leading row dim) -> outputs callable so
    rows pad to a ROW_BLOCK multiple locally and outputs slice back.
    Shapes are static per shard, so the pallas grid stays static."""
    def fn(*arrays):
        r = arrays[0].shape[0]
        r_pad = -(-r // ROW_BLOCK) * ROW_BLOCK
        padded = [
            jnp.pad(a, ((0, r_pad - r),) + ((0, 0),) * (a.ndim - 1))
            for a in arrays
        ]
        out = kernel_of_rows(r_pad)(*padded)
        if n_out == 1:
            return out[:r]
        return tuple(o[:r] for o in out)

    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_loss_terms(logits_mg, mask, num_classes: int, interpret: bool = False,
                    mesh=None):
    """(sq_cells (N, G), p_bg (N, G)) from (N, M, G) logits + (N, G) mask.

    sq_cells[n, g] = sum_m (softmax(logits)[n,m,g] - onehot[n,m,g])^2;
    p_bg is the background-class probability plane. Differentiable w.r.t.
    logits_mg via the fused backward kernel. With `mesh`, both kernels
    run under shard_map over the data axis — rows pad to ROW_BLOCK
    multiples PER SHARD so shard boundaries coincide with the natural
    batch sharding (no resharding collectives) — instead of appearing
    to GSPMD as an opaque replicated custom call.
    """
    out, _ = _fwd_impl(logits_mg, mask, num_classes, interpret, mesh)
    return out


def _fwd_impl(logits_mg, mask, num_classes, interpret, mesh):
    n, M, G = logits_mg.shape
    n_shards, wrap = _shard_rows(mesh)
    rows = -(-n // n_shards) * n_shards  # equal shards; block pad is local
    x = jnp.pad(logits_mg, ((0, rows - n), (0, 0), (0, 0)))
    mk = jnp.pad(mask.astype(jnp.int32), ((0, rows - n), (0, 0)))
    mk = mk[:, None, :]  # (N, 1, G)

    def call_of(r_pad):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, num_classes=num_classes),
            grid=(r_pad // ROW_BLOCK,),
            in_specs=[
                pl.BlockSpec((ROW_BLOCK, M, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r_pad, 1, G), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, 1, G), jnp.float32),
            ],
            interpret=interpret,
        )

    sq, pbg = wrap(_with_local_row_pad(call_of, 2), 2, 2)(x, mk)
    return (sq[:n, 0, :], pbg[:n, 0, :]), (logits_mg, mask)


def _vjp_fwd(logits_mg, mask, num_classes, interpret, mesh):
    return _fwd_impl(logits_mg, mask, num_classes, interpret, mesh)


def _vjp_bwd(num_classes, interpret, mesh, residuals, cotangents):
    logits_mg, mask = residuals
    g_sq, g_bg = cotangents
    n, M, G = logits_mg.shape
    n_shards, wrap = _shard_rows(mesh)
    rows = -(-n // n_shards) * n_shards
    x = jnp.pad(logits_mg, ((0, rows - n), (0, 0), (0, 0)))
    mk = jnp.pad(mask.astype(jnp.int32), ((0, rows - n), (0, 0)))[:, None, :]
    gs = jnp.pad(g_sq.astype(jnp.float32), ((0, rows - n), (0, 0)))[:, None, :]
    gb = jnp.pad(g_bg.astype(jnp.float32), ((0, rows - n), (0, 0)))[:, None, :]

    def call_of(r_pad):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, num_classes=num_classes),
            grid=(r_pad // ROW_BLOCK,),
            in_specs=[
                pl.BlockSpec((ROW_BLOCK, M, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_BLOCK, 1, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROW_BLOCK, M, G), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r_pad, M, G), logits_mg.dtype),
            interpret=interpret,
        )

    dx = wrap(_with_local_row_pad(call_of, 1), 4, 1)(x, mk, gs, gb)
    return dx[:n], None


grid_loss_terms.defvjp(_vjp_fwd, _vjp_bwd)

