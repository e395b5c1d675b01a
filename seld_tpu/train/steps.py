"""Jitted train / eval steps.

One fused XLA program per step: bitmask -> one-hot target decode, model
forward (bf16 on the MXU), composite loss, backward, Adam update — all
on device. The only host<->device traffic per step is the input batch in
and a handful of scalar metrics out (the reference syncs loss.item()
every step and runs its whole target pipeline on the host,
ref trainer.py:165-191).

Under a mesh, batches are sharded over the "data" axis and params follow
seld_tpu.parallel.sharding rules (replicated or tensor-parallel); XLA
derives the gradient all-reduce and TP collectives from the shardings.
"""

from __future__ import annotations

from contextlib import nullcontext

import jax
import jax.numpy as jnp

from seld_tpu.losses import SELDLossFn
from seld_tpu.ops.attention import attention_mesh
from seld_tpu.targets.rasterize import decode_class_bitmask
from seld_tpu.train.state import TrainState


def _apply(model, state: TrainState, mel, train: bool, dropout_rng=None):
    variables = state.variables()
    kwargs = dict(train=train)
    if train:
        out, updates = model.apply(
            variables,
            mel,
            mutable=["batch_stats"] if state.batch_stats else [],
            rngs={"dropout": dropout_rng},
            **kwargs,
        )
        return out, updates.get("batch_stats", state.batch_stats)
    return model.apply(variables, mel, **kwargs), state.batch_stats


def _mesh_of(shardings):
    """Mesh of a NamedSharding pytree (None when unsharded)."""
    if shardings is None:
        return None
    for leaf in jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "mesh")
    ):
        if hasattr(leaf, "mesh"):
            return leaf.mesh
    return None


def make_train_step(model, loss_fn: SELDLossFn, optimizer, num_classes: int,
                    donate: bool = True, out_state_shardings=None,
                    target_decoder=None, input_augment=None,
                    spatial_augment=None, accum_steps: int = 1,
                    qat: bool = False, time_sharded: bool = False,
                    distill=None):
    """Returns step(state, mel, raw_targets, example_mask, rng) ->
    (state, metrics). `out_state_shardings` pins the output TrainState's
    shardings (e.g. ZeRO-sharded optimizer moments) so GSPMD keeps them
    stable across steps. `target_decoder` maps the raw target batch to the
    loss's format (ACCDOA passes vectors through). With the default
    decoder and a bitmask-capable loss (SELDLossFn), the loss consumes
    the uint16 bitmask directly (loss_fn.from_bitmask) — value-identical
    to decoding one-hot first, but the dense (B, T, M, G) targets never
    hit HBM. `input_augment` is an optional on-device (rng, mel) -> mel
    hook (e.g. SpecAugment), train-side only. `spatial_augment` is an
    optional on-device (rng, mel, label_mask) -> (mel, label_mask) hook
    transforming features AND labels together (e.g. the FOA ACS scene
    transforms), applied before input_augment.

    `accum_steps` > 1 runs gradient accumulation: the batch is split
    into that many microbatches, a lax.scan computes their gradients
    (one microbatch of activations live at a time) weighted by each
    microbatch's share of the example-mask weight, and a single
    optimizer update applies the result — effective batches larger than
    HBM allows. The share weighting makes em-normalized decomposable
    losses (MSE, AIUR) EXACTLY equal to the full-batch step, including
    padded tail batches (an all-padding microbatch contributes 0).
    BatchNorm statistics thread through the scan (train-mode statistics
    are drawn per microbatch) and weighted-CE/CL normalize per
    microbatch — the standard accumulation caveats.

    `qat=True` trains quantization-aware: eligible layers (the PTQ set,
    seld_tpu.quant) fake-quantize weights and activations to the int8
    grid with straight-through gradients, so the learned weights
    survive int8 PTQ serving with minimal accuracy loss.

    `distill` (a seld_tpu.distill.DistillSpec) adds knowledge
    distillation: the returned step takes a trailing
    `teacher_variables` argument (jit ARGS, never closure constants —
    big constant trees blow up remote compiles), runs the teacher's
    eval-mode forward on each (augmented) microbatch under
    stop_gradient OUTSIDE the QAT interceptor, and blends
    (1 - alpha) * hard + alpha * kd into the total. The metrics gain
    "kd" and "hard" entries."""
    bitmask_native = target_decoder is None and hasattr(loss_fn, "from_bitmask")
    if target_decoder is None:
        target_decoder = lambda m: decode_class_bitmask(
            m, num_classes, class_major=True
        )
    step_mesh = _mesh_of(out_state_shardings)

    def step(state: TrainState, mel, label_mask, example_mask, rng,
             teacher_vars=None):
        if distill is not None and teacher_vars is None:
            # Caught at trace time: without this, the teacher forward
            # fails deep inside model.apply with a cryptic flax error.
            raise ValueError(
                "this train step was built with distillation "
                "(distill is set): pass the teacher_vars argument"
            )
        dropout_rng = jax.random.fold_in(rng, state.step)
        if spatial_augment is not None:
            sp_rng, dropout_rng = jax.random.split(dropout_rng)
            mel, label_mask = spatial_augment(sp_rng, mel, label_mask)
        if input_augment is not None:
            aug_rng, dropout_rng = jax.random.split(dropout_rng)
            mel = input_augment(aug_rng, mel)
        targets = None if bitmask_native else target_decoder(label_mask)

        def loss_of(params, stats, mb_mel, mb_targets, mb_mask, mb_em, rng_mb):
            if qat:
                from flax import linen as nn

                from seld_tpu.quant import qat_interceptor

                qat_ctx = nn.intercept_methods(qat_interceptor)
            else:
                qat_ctx = nullcontext()
            with qat_ctx, attention_mesh(step_mesh, time_sharded=time_sharded):
                out, new_stats = _apply(
                    model,
                    state.replace(params=params, batch_stats=stats),
                    mb_mel,
                    train=True,
                    dropout_rng=rng_mb,
                )
            if bitmask_native:
                # fused=None auto-selects the loss implementation; under
                # a mesh a Pallas kernel would run inside shard_map over
                # the data axis (row-sharded, collective-free) instead of
                # appearing to GSPMD as an opaque replicated custom call.
                total, breakdown = loss_fn.from_bitmask(
                    out, mb_mask, mb_em, mesh=step_mesh,
                )
            else:
                total, breakdown = loss_fn(out, mb_targets, mb_em)
            if distill is not None:
                # Teacher forward: same augmented inputs, eval mode,
                # OUTSIDE the QAT interceptor (only the student is
                # fake-quantized), inside the attention-mesh context so
                # SP meshes dispatch its attention correctly too.
                with attention_mesh(step_mesh, time_sharded=time_sharded):
                    t_out = jax.lax.stop_gradient(
                        distill.apply(teacher_vars, mb_mel)
                    )
                kd = distill.kd(out, t_out, mb_em,
                                temperature=distill.temperature)
                hard = total
                total = (1.0 - distill.alpha) * hard + distill.alpha * kd
                breakdown = {**breakdown, "hard": hard, "kd": kd}
            return total, (breakdown, new_stats)

        grad_fn = jax.value_and_grad(loss_of, has_aux=True)
        if accum_steps <= 1:
            (total, (breakdown, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, mel, targets,
                label_mask, example_mask, dropout_rng,
            )
        else:
            b = mel.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps={accum_steps}"
            )
            mb = b // accum_steps

            def split(x, lo, hi):
                if x is None:
                    return None
                return x.reshape(accum_steps, mb, *x.shape[1:])[lo:hi]

            def micro(stats, idx_arrays):
                i, mb_mel, mb_targets, mb_mask, mb_em = idx_arrays
                rng_mb = jax.random.fold_in(dropout_rng, i)
                return grad_fn(
                    state.params, stats, mb_mel, mb_targets, mb_mask,
                    mb_em, rng_mb,
                )

            def take0(x):
                return None if x is None else x[0]

            # Each microbatch contributes weighted by its SHARE of the
            # example weight: the full-batch em-normalized losses
            # decompose exactly as L = sum_i (S_i / S) * L_i where
            # S_i = sum(em over microbatch i). Without a mask every
            # share is 1/accum (a plain mean), and an all-padding tail
            # microbatch contributes exactly 0 instead of NaN.
            if example_mask is not None:
                em_f = example_mask.astype(jnp.float32).reshape(accum_steps, mb)
                shares = em_f.sum(axis=1) / jnp.maximum(em_f.sum(), 1e-8)
            else:
                shares = jnp.full((accum_steps,), 1.0 / accum_steps)

            # Carry structures from eval_shape — NOT from an unrolled
            # microbatch-0 call, which would trace a second full
            # fwd+bwd copy into the program (doubling HLO size; remote
            # compiles reject very large programs).
            probe = (
                jnp.zeros((), jnp.int32),
                take0(split(mel, 0, accum_steps)),
                take0(split(targets, 0, accum_steps)),
                take0(split(label_mask, 0, accum_steps)),
                take0(split(example_mask, 0, accum_steps)),
            )
            (t_shape, (bd_shape, _)), g_shape = jax.eval_shape(
                micro, state.batch_stats, probe
            )
            zeros_like_shape = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree
            )
            total = zeros_like_shape(t_shape)
            breakdown = zeros_like_shape(bd_shape)
            grads = zeros_like_shape(g_shape)

            def body(carry, inp):
                stats, grad_sum, total_sum, bd_sum = carry
                i = inp[0]
                (t, (bd, stats)), g = micro(stats, inp)
                s = shares[i]
                grad_sum = jax.tree_util.tree_map(
                    lambda a, gi: a + s * gi, grad_sum, g
                )
                bd_sum = {k: bd_sum[k] + s * v for k, v in bd.items()}
                return (stats, grad_sum, total_sum + s * t, bd_sum), None

            xs = (
                jnp.arange(accum_steps, dtype=jnp.int32),
                split(mel, 0, accum_steps),
                split(targets, 0, accum_steps),
                split(label_mask, 0, accum_steps),
                split(example_mask, 0, accum_steps),
            )
            (new_stats, grads, total, breakdown), _ = jax.lax.scan(
                body, (state.batch_stats, grads, total, breakdown), xs
            )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": total, **breakdown}
        return new_state, metrics

    kwargs = {}
    if out_state_shardings is not None:
        kwargs["out_shardings"] = (out_state_shardings, None)
    return jax.jit(step, donate_argnums=(0,) if donate else (), **kwargs)


def make_metric_eval_step(model, loss_fn, num_classes: int,
                          grid_decoder=None, target_decoder=None,
                          mesh=None, time_sharded: bool = False):
    """Eval step that additionally returns decoded class grids, for
    validation-metric checkpoint selection (train.select_metric).

    Returns step(state, mel, loss_targets, example_mask, label_mask)
      -> (metrics, pred_cls int8 (B, T, G), true_cls int8 (B, T, G)).

    ``loss_targets`` is whatever the loss consumes (the uint16 bitmasks
    for grid losses — pass label_mask twice — or ACCDOA/ADPIT vectors);
    ``label_mask`` is always the uint16 class bitmask, decoded on device
    into the argmax ground-truth grid. ``grid_decoder`` maps the raw
    model output to int8 class grids; the default is the class-major
    argmax used by grid heads (ACCDOA callers pass their decoder)."""
    from seld_tpu.losses.seld_loss import _bit_labels

    bitmask_native = target_decoder is None and hasattr(loss_fn, "from_bitmask")
    if target_decoder is None:
        target_decoder = lambda m: decode_class_bitmask(
            m, num_classes, class_major=True
        )
    if grid_decoder is None:
        grid_decoder = lambda out: jnp.argmax(out, axis=2).astype(jnp.int8)

    def step(state: TrainState, mel, loss_targets, example_mask, label_mask):
        with attention_mesh(mesh, time_sharded=time_sharded):
            out, _ = _apply(model, state, mel, train=False)
        if bitmask_native:
            total, breakdown = loss_fn.from_bitmask(
                out, loss_targets, example_mask, mesh=mesh,
            )
        else:
            total, breakdown = loss_fn(out, target_decoder(loss_targets),
                                       example_mask)
        pred_cls = grid_decoder(out)
        true_cls = _bit_labels(label_mask, num_classes).astype(jnp.int8)
        return {"loss": total, **breakdown}, pred_cls, true_cls

    return jax.jit(step)


def make_eval_step(model, loss_fn: SELDLossFn, num_classes: int,
                   return_logits: bool = False, target_decoder=None,
                   mesh=None, time_sharded: bool = False):
    """Returns step(state, mel, raw_targets, example_mask) -> metrics
    (and logits when return_logits). Bitmask-capable losses consume the
    raw uint16 masks directly (see make_train_step); under a mesh the
    fused loss kernel runs in shard_map over the data axis."""
    bitmask_native = target_decoder is None and hasattr(loss_fn, "from_bitmask")
    if target_decoder is None:
        target_decoder = lambda m: decode_class_bitmask(
            m, num_classes, class_major=True
        )

    def step(state: TrainState, mel, label_mask, example_mask):
        with attention_mesh(mesh, time_sharded=time_sharded):
            out, _ = _apply(model, state, mel, train=False)
        if bitmask_native:
            total, breakdown = loss_fn.from_bitmask(
                out, label_mask, example_mask, mesh=mesh,
            )
        else:
            total, breakdown = loss_fn(out, target_decoder(label_mask),
                                       example_mask)
        metrics = {"loss": total, **breakdown}
        if return_logits:
            return metrics, out
        return metrics

    return jax.jit(step)
