"""Knowledge distillation: train a small student against a trained teacher.

The reference has no distillation anywhere (SURVEY §2 — repo-wide search);
this is a production-serving lever in the same family as int8 PTQ/QAT
(`seld_tpu.quant`): train a cheap serving model (e.g. a CRNN) to mimic
the flagship ResNet50-Conformer's outputs, then serve the student —
optionally int8-quantized — at a fraction of the flagship's cost.

Config-driven (`train.distill_ckpt` + `distill_alpha` / `distill_temperature`):

  * the teacher is loaded from its checkpoint tree exactly like eval does
    (architecture from the ckpt-embedded config, BEST weights — which are
    the EMA weights when the teacher trained with `train.ema_decay>0`);
  * inside the jitted train step the teacher runs an eval-mode forward on
    the SAME augmented features the student sees (ACS / SpecAugment
    consistency comes for free), under `stop_gradient`;
  * the total objective is `(1 - alpha) * hard_loss + alpha * kd_loss`,
    where the KD term depends on the output representation:
      - grid heads (class-major (B, T, M, G) logits): temperature-scaled
        KL(teacher || student) over the class axis, scaled by T^2
        (Hinton et al. 2015) so gradients keep their magnitude as T grows,
        with each cell weighted by the teacher's predicted class under the
        hard CE's background down-weighting (uniform KD over a ~99%-
        background grid otherwise drowns the event signal — measured);
      - ACCDOA heads: masked MSE between the teacher's and student's
        Cartesian vectors (the representation IS already a regression
        target);
      - multi-ACCDOA heads: the same MSE made PERMUTATION-INVARIANT over
        the track axis, per (frame, class) — min over the N! track
        orderings of the teacher, exactly the granularity the hard ADPIT
        loss uses. A track assignment is arbitrary (that is why ADPIT
        exists), so position-wise matching is a noisy objective near
        teacher track-swap boundaries; the min removes that noise while
        reducing to the position-wise value wherever the identity
        ordering is already the best match.
        `train.distill_track_matching=position` restores the plain
        position-wise MSE (the pre-round-4 behavior).
        Both ACCDOA KD variants weight each (frame, class) cell by the
        TEACHER's decoded activity (`loss.background_class_weight` on
        inactive cells, 1.0 on active — the vector analogue of the grid
        branch's class weighting): ~99.7% of cells are zero-vectors a
        trained teacher nails, and uniform vector KD measurably
        collapses students to silence (round-4 study; grid precedent
        commit 63b8953, ref CE bg weight reference trainer.py:99-101);
  * teacher variables travel as jitted-step ARGUMENTS, never closure
    constants (a 60M-param constant tree blows up remote TPU compiles —
    the same rule `seld_tpu.quant` follows for quant trees).

Cross-representation distillation (grid teacher -> ACCDOA student or the
reverse) is rejected with a named error: the output semantics differ and
a principled mapping (decode -> re-encode) would break differentiability.
With `train.qat=true`, fake-quantization applies to the STUDENT only —
the teacher forward runs outside the QAT interceptor.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp


def grid_kd_loss(student_logits, teacher_logits, example_mask=None,
                 temperature: float = 1.0, class_weights=None):
    """Temperature-scaled KL(teacher || student) over the class axis.

    Logits are class-major `(B, T, M, G)` (class axis = -2, the layout
    every grid head emits). Each cell's KL is weighted by
    `class_weights[teacher argmax class]` and the total normalized
    torch-CE-style (`sum(w*kl*em) / sum(w*em)`), mirroring
    `losses.seld_loss.class_ce_loss` exactly; with `class_weights=None`
    this reduces to the uniform cell mean. Scaled by `temperature**2`
    (Hinton et al. 2015).

    The weighting matters: SELD grids are ~99% background cells on
    which a trained teacher is near-certain, so an unweighted KD term
    is dominated by "predict background confidently" pressure that the
    background-down-weighted hard CE does not counter — measured to
    collapse a distilled student's non-background accuracy 57% -> 25%
    (benchmarks/results/distill_accuracy.json, round-4 study v1).
    """
    s = student_logits.astype(jnp.float32) / temperature
    t = teacher_logits.astype(jnp.float32) / temperature
    log_ps = jax.nn.log_softmax(s, axis=-2)
    log_pt = jax.nn.log_softmax(t, axis=-2)
    # sum_M p_t * (log p_t - log p_s): compute in log space for stability
    kl = jnp.sum(jnp.exp(log_pt) * (log_pt - log_ps), axis=-2)  # (B, T, G)
    if class_weights is None:
        w = jnp.ones_like(kl)
    else:  # argmax is temperature-invariant: the teacher's hard class
        w = class_weights[jnp.argmax(teacher_logits, axis=-2)]
    em = jnp.ones((kl.shape[0],), jnp.float32) if example_mask is None \
        else example_mask.astype(jnp.float32)
    em = em.reshape((-1,) + (1,) * (kl.ndim - 1))
    kl = jnp.sum(w * kl * em) / jnp.maximum(jnp.sum(w * em), 1e-8)
    return kl * temperature**2


def _teacher_activity_weights(teacher_vectors, background_weight: float,
                              activity_threshold: float):
    """Per-(frame, class) weights from the TEACHER's decoded activity:
    1.0 where any track's vector norm exceeds the decode threshold,
    `background_weight` elsewhere. Input `(B, T, C, 3)` or
    `(B, T, N, C, 3)`; returns `(B, T, C)`."""
    norms = jnp.linalg.norm(teacher_vectors.astype(jnp.float32), axis=-1)
    active = norms > activity_threshold
    if active.ndim == 4:  # (B, T, N, C): any track activates the cell
        active = jnp.any(active, axis=2)
    return jnp.where(active, 1.0, jnp.float32(background_weight))


def _weighted_cell_mean(per_cell, weights, example_mask):
    """`sum(w * x * em) / sum(w * em)` over (B, T, C) cells — the same
    normalization shape as the class-weighted grid CE/KD, so active
    cells keep gradient share no matter how background-dominated the
    scene is. `weights=None` is the uniform mean (the em-weighted mean
    of per-example cell means, since every example has T*C cells)."""
    if weights is None:
        weights = jnp.ones_like(per_cell)
    em = jnp.ones((per_cell.shape[0],), jnp.float32) if example_mask is None \
        else example_mask.astype(jnp.float32)
    em = em.reshape((-1,) + (1,) * (per_cell.ndim - 1))
    return (jnp.sum(weights * per_cell * em)
            / jnp.maximum(jnp.sum(weights * em), 1e-8))


def vector_kd_loss(student_vectors, teacher_vectors, example_mask=None,
                   temperature: float = 1.0, background_weight=None,
                   activity_threshold: float = 0.5):
    """Masked MSE between ACCDOA vector outputs (any track layout).

    `temperature` is accepted for interface symmetry and ignored — MSE
    between bounded regression outputs has no softening knob.

    `background_weight` (the vector analogue of the grid KD's class
    weighting, default off): per-(frame, class) cells where the teacher
    is INACTIVE (every track's vector norm <= `activity_threshold`, the
    decode rule) are down-weighted to `background_weight` and the total
    renormalized by the weight mass. SELD scenes are ~99.7% inactive
    cells on which a trained teacher emits near-zero vectors; uniform
    vector KD is therefore dominated by "predict zero everywhere"
    pressure — measured to collapse multi-ACCDOA students to zero
    activity (benchmarks/results/multi_accdoa_distill.json, round 4;
    the same failure the grid KD fixed with class weights, and the
    vector counterpart of the reference CE's background weight 0.05,
    reference trainer.py:99-101).
    """
    del temperature
    s = student_vectors.astype(jnp.float32)
    t = teacher_vectors.astype(jnp.float32)
    sq = jnp.square(s - t)
    if sq.ndim == 5:  # (B, T, N, C, 3) -> per-(frame, class) over (N, xyz)
        per_cell = jnp.mean(sq, axis=(2, 4))
    else:  # (B, T, C, 3) -> over xyz
        per_cell = jnp.mean(sq, axis=-1)
    w = None if background_weight is None else _teacher_activity_weights(
        t, background_weight, activity_threshold)
    return _weighted_cell_mean(per_cell, w, example_mask)


def multi_accdoa_kd_loss(student_vectors, teacher_vectors,
                         example_mask=None, temperature: float = 1.0,
                         background_weight=None,
                         activity_threshold: float = 0.5):
    """Track-permutation-invariant KD for multi-ACCDOA heads.

    Inputs are `(B, T, N, C, 3)` (tracks, event classes, Cartesian axes).
    Per (frame, class) the KD term is the MINIMUM over the N! orderings
    of the teacher's track axis of the MSE over (track, axis) — the same
    per-(frame, class) assignment granularity as `accdoa.adpit_loss`,
    whose candidate set exists for exactly this reason: track slots are
    an arbitrary labelling, and a student must not be penalized for
    arranging the same sources in a different slot order. Because the
    identity ordering is one of the candidates, this is pointwise <= the
    position-wise `vector_kd_loss` and equal to it wherever the
    teacher's own arrangement is already the student's best match.

    N is static (3 for the registry's multi-ACCDOA models), so the N!=6
    candidates unroll at trace time like ADPIT's do. `temperature` is
    accepted for interface symmetry and ignored (regression target).
    `background_weight` / `activity_threshold`: teacher-activity cell
    weighting, exactly as in `vector_kd_loss` (see there for why uniform
    vector KD collapses students on ~99.7%-background scenes).
    """
    del temperature
    import itertools

    f32 = jnp.float32
    s = student_vectors.astype(f32)  # (B, T, N, C, 3)
    t = teacher_vectors.astype(f32)
    if s.ndim != 5:
        raise ValueError(
            f"multi_accdoa_kd_loss expects (B, T, N, C, 3) track-major "
            f"vectors, got shape {s.shape}"
        )
    n_tracks = s.shape[2]
    # per ordering: MSE over (track, axis) -> (B, T, C)
    per_perm = jnp.stack(
        [jnp.mean(jnp.square(s - t[:, :, perm, :, :]), axis=(2, 4))
         for perm in itertools.permutations(range(n_tracks))],
        axis=0,
    )
    per_frame_class = jnp.min(per_perm, axis=0)  # (B, T, C)
    w = None if background_weight is None else _teacher_activity_weights(
        t, background_weight, activity_threshold)
    return _weighted_cell_mean(per_frame_class, w, example_mask)


@dataclass(frozen=True)
class DistillSpec:
    """Everything the jitted train step needs to add a KD term.

    `apply(variables, mel)` is the teacher's eval-mode forward (module
    structure only — the weights arrive as the step's `teacher_variables`
    argument). `kd(student_out, teacher_out, example_mask)` is the
    representation-matched loss above.
    """

    apply: Callable[[Any, Any], Any]
    kd: Callable[..., Any]
    alpha: float
    temperature: float


def _model_kind(model_type: str) -> str:
    from seld_tpu.models.registry import ACCDOA_MODELS, MULTI_ACCDOA_MODELS

    if model_type in MULTI_ACCDOA_MODELS:
        return "multi_accdoa"
    if model_type in ACCDOA_MODELS:
        return "accdoa"
    return "grid"


def load_teacher(cfg, checkpoint_dir, window_frames: int, n_feat_ch: int):
    """Load the teacher for `train.distill_ckpt`.

    Returns `(spec: DistillSpec, teacher_variables, ckpt_meta)`. The teacher's
    input contract (features + window + grid geometry) must match the
    student's — the student consumes the same corpus batches — and the
    output representations must be the same kind; both are enforced with
    named errors. The teacher architecture itself is free to differ
    (that is the point: flagship teacher, cheap student).
    """
    from seld_tpu.models import build_model
    from seld_tpu.train.checkpoint import (
        CheckpointManager,
        load_checkpoint_config,
    )
    from seld_tpu.train.optimizer import make_optimizer
    from seld_tpu.train.state import create_train_state

    checkpoint_dir = Path(checkpoint_dir)
    stored = load_checkpoint_config(checkpoint_dir)
    if stored is None:
        raise FileNotFoundError(
            f"train.distill_ckpt: no checkpoint config under {checkpoint_dir}"
        )
    for section in ("features", "window", "grid"):
        if getattr(stored, section) != getattr(cfg, section):
            raise ValueError(
                f"train.distill_ckpt: teacher {section} config differs from "
                f"the student's — teacher and student must consume the same "
                f"corpus (teacher {getattr(stored, section)!r} vs student "
                f"{getattr(cfg, section)!r})"
            )
    t_kind = _model_kind(stored.model.model_type)
    s_kind = _model_kind(cfg.model.model_type)
    if t_kind != s_kind:
        raise ValueError(
            f"train.distill_ckpt: teacher emits {t_kind!r} outputs but the "
            f"student emits {s_kind!r} — cross-representation distillation "
            f"is unsupported (teacher {stored.model.model_type}, student "
            f"{cfg.model.model_type})"
        )
    # (multi-ACCDOA track counts are fixed per model type in the
    # registry, so kind equality already implies matching track layouts)

    tcfg = cfg.replace_path("model", stored.model)
    teacher = build_model(tcfg.model, tcfg.grid)
    sample = jnp.zeros((1, window_frames, n_feat_ch, tcfg.model.n_mels),
                       jnp.float32)
    template = create_train_state(
        teacher, make_optimizer(1e-3), jax.random.PRNGKey(0), sample
    )
    ckpt = CheckpointManager(checkpoint_dir, tcfg)
    try:
        restored = ckpt.restore_best(template)
        if restored is None:
            restored = ckpt.restore_latest(template)
        if restored is None:
            raise FileNotFoundError(
                f"train.distill_ckpt: no checkpoint found under {checkpoint_dir}"
            )
    finally:
        ckpt.close()
    state, meta = restored
    # Only the forward-pass variables are kept; the restored optimizer
    # moments are dropped (and freed) — the teacher never trains.
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def apply(vars_, mel):
        return teacher.apply(vars_, mel, train=False)

    if t_kind == "grid":
        # Weight each cell's KL by the teacher's predicted class using
        # the same background down-weighting as the hard CE (see the
        # grid_kd_loss docstring for why uniform KD collapses students).
        # loss.background_class_weight=1.0 recovers uniform KD.
        from functools import partial

        from seld_tpu.losses.seld_loss import make_class_weights

        kd = partial(
            grid_kd_loss,
            class_weights=make_class_weights(
                cfg.grid.num_classes, cfg.loss.background_class_weight
            ),
        )
    elif t_kind == "multi_accdoa":
        from functools import partial

        matching = cfg.train.distill_track_matching
        if matching == "permutation":
            kd = multi_accdoa_kd_loss
        elif matching == "position":
            kd = vector_kd_loss
        else:
            raise ValueError(
                f"train.distill_track_matching must be 'permutation' or "
                f"'position', got {matching!r}"
            )
        # Teacher-activity cell weighting — the vector analogue of the
        # grid branch's class weighting, sharing its knob.
        # loss.background_class_weight=1.0 recovers uniform KD.
        kd = partial(
            kd,
            background_weight=float(cfg.loss.background_class_weight),
        )
    else:
        from functools import partial

        kd = partial(
            vector_kd_loss,
            background_weight=float(cfg.loss.background_class_weight),
        )
    spec = DistillSpec(
        apply=apply,
        kd=kd,
        alpha=float(cfg.train.distill_alpha),
        temperature=float(cfg.train.distill_temperature),
    )
    return spec, variables, meta
