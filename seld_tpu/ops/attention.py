"""Multi-head self-attention compute op.

The reference computes vanilla full (T x T) attention per head in fp32
(ref: model_conformer.py:47-68). Here the contraction runs on the MXU in
the model's compute dtype with an fp32 softmax; a Pallas flash-attention
kernel (seld_tpu.ops.flash_attention) can be swapped in for long windows —
at the reference's T=250 the full score matrix is tiny (250x250 per head)
and XLA's fused path is already at speed of light, so the einsum form is
the default.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp


FLASH_MIN_SEQ_LEN = 512  # flash kernel wins above this on v5e (2.8x @ 2048)

# Trace-time mesh context: flax modules have no mesh handle, so the
# jitted train/eval steps set this while tracing and the flash dispatch
# below wraps the kernel in shard_map over both mesh axes (per-(b, h)
# independent -> row sharding, no collectives; GSPMD otherwise treats
# the Pallas call as an opaque custom call it must replicate). A
# ContextVar so concurrent traces in different threads cannot see each
# other's mesh; any jit site that wants mesh-aware flash MUST trace
# inside attention_mesh(...) (steps.py and evaluate.py do).
import contextvars

_MESH = contextvars.ContextVar("seld_tpu_attention_mesh", default=None)
_TIME_SHARDED = contextvars.ContextVar(
    "seld_tpu_attention_time_sharded", default=False
)
_FORCE = contextvars.ContextVar("seld_tpu_attention_force_flash", default=None)


@contextlib.contextmanager
def force_flash(enabled: bool = True, interpret: bool = False):
    """Override the AUTO flash policy while tracing (tests/measurement).

    Sites that pass an explicit use_flash are unaffected. interpret=True
    additionally forces kernel interpret mode so the flash/ring paths can
    be exercised end-to-end through model code on the CPU test backend."""
    token = _FORCE.set((bool(enabled), bool(interpret)))
    try:
        yield
    finally:
        _FORCE.reset(token)


@contextlib.contextmanager
def attention_mesh(mesh, time_sharded: bool = False):
    """Scope a mesh for flash-attention dispatch during step tracing.

    `time_sharded=True` (sequence parallelism: the T axis is sharded
    over the model mesh axis) dispatches to RING attention when a mesh
    handle is available and the shapes divide the mesh: the flash
    kernels run per time chunk inside shard_map while K/V chunks rotate
    around the model axis via ppermute (seld_tpu.ops.ring_attention) —
    O(T/n) memory, no all-gather. Otherwise (no mesh handle, or
    indivisible shapes) the einsum path runs: GSPMD partitions the
    (T x T) score einsums with the required collectives. The plain
    flash kernel's shard_map over (b*h) rows is never used here — it
    would force an all-gather of the time axis first."""
    # The flag engages regardless of whether a mesh was traced here:
    # a step can run sequence-parallel purely from its INPUT shardings
    # (no out_state_shardings -> step_mesh None), and the flash kernel
    # must still be bypassed in that case.
    token = _MESH.set(mesh)
    token_t = _TIME_SHARDED.set(bool(time_sharded))
    try:
        yield
    finally:
        _MESH.reset(token)
        _TIME_SHARDED.reset(token_t)


def multi_head_attention(q, k, v, *, scale: float | None = None, dtype=None,
                         use_flash: bool | None = None,
                         interpret: bool = False):
    """q, k, v: (B, H, T, Dh) -> (B, H, T, Dh).

    Softmax is computed in float32 regardless of input dtype (bf16-safe),
    matching the numerics the reference gets from fp32 torch.

    use_flash=None auto-dispatches to the Pallas flash kernel on TPU for
    sequences >= FLASH_MIN_SEQ_LEN (at the reference's T=250 the fused
    XLA einsum path is already optimal).
    """
    import jax

    forced = _FORCE.get()
    if use_flash is None and forced is not None:
        use_flash = forced[0]
        interpret = interpret or forced[1]
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[-2] >= FLASH_MIN_SEQ_LEN
        )
    if use_flash:
        from seld_tpu.ops.flash_attention import flash_attention

        mesh = _MESH.get()
        if _TIME_SHARDED.get():
            # Sequence parallelism: T is sharded over the model axis.
            # Ring attention keeps it that way (flash per chunk, K/V
            # rotation via ppermute); requires a mesh handle and shapes
            # that divide the mesh — otherwise fall through to the
            # einsum path, which GSPMD partitions with collectives.
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                from seld_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

                from seld_tpu.ops.ring_attention import ring_flash_attention

                b, h, t, d = q.shape
                n_d = mesh.shape[DATA_AXIS]
                n_m = mesh.shape[MODEL_AXIS]
                if b % n_d == 0 and t % n_m == 0:
                    spec = P(DATA_AXIS, None, MODEL_AXIS, None)
                    fn = jax.shard_map(
                        lambda q4, k4, v4: ring_flash_attention(
                            q4, k4, v4, axis_name=MODEL_AXIS, scale=scale,
                            interpret=interpret,
                        ),
                        mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                        check_vma=False,
                    )
                    return fn(q, k, v)
        elif mesh is not None:
            from jax.sharding import PartitionSpec as P

            from seld_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            b, h, t, d = q.shape
            # shard the merged (b*h) rows over BOTH axes: batch shards
            # ride "data" and head shards ride "model" (the attention
            # projections are head-sharded under TP), so no all-gather
            n = mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
            if (b * h) % n == 0:
                spec = P((DATA_AXIS, MODEL_AXIS), None, None, None)
                fn = jax.shard_map(
                    lambda q3, k3, v3: flash_attention(
                        q3, k3, v3, scale=scale, interpret=interpret
                    ),
                    mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                    check_vma=False,
                )
                rs = lambda x: x.reshape(b * h, 1, t, d)
                return fn(rs(q), rs(k), rs(v)).reshape(b, h, t, d)
            # (b*h) not divisible by the data axis: the exact einsum path
            # below is mesh-friendly (GSPMD shards plain einsums fine)
        else:
            return flash_attention(q, k, v, scale=scale, interpret=interpret)

    if scale is None:
        scale = q.shape[-1] ** -0.5
    compute_dtype = dtype or q.dtype
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    )
    probs = jnp.astype(
        jnp.exp(scores * scale - jnp.max(scores * scale, axis=-1, keepdims=True)), jnp.float32
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(compute_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(compute_dtype)
