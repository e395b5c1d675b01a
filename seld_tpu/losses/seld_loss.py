"""Composite SMR-SELD loss: class CE/MSE + AIUR + converging localization.

Parity contracts (ref: loss.py:6-172):

  * class_ce_loss — one-hot targets are argmax-collapsed to indices and
    scored with weighted cross entropy over (B*T*G, M); torch semantics:
    weighted *mean* = sum(w_y * nll) / sum(w_y) (ref loss.py:27-42, class
    weights events=1.0 / background=0.05 from trainer.py:99-101).
  * class_mse_loss — softmax over classes, then plain MSE against the
    one-hot targets (ref loss.py:44-54).
  * aiur_loss — 1 - mean IoU between predicted and true non-background
    argmax masks per (B, T); empty-vs-empty IoU defined as 1
    (ref loss.py:56-87). Argmax makes it piecewise-constant — zero
    gradient — exactly as in the reference (SURVEY §7 hard part (d): a
    faithful quirk, kept for parity).
  * converging_localization_loss — targets remapped to {1, -N_bac/N_non},
    8-neighbor averaged-difference attention map with circular padding on
    BOTH grid axes, dotted with predicted non-background activity on
    event frames (ref loss.py:89-146). The circular-pad stencil is
    expressed as jnp.roll sums — exact and vectorized.

Layout: all dense operands (logits, one-hot targets, probabilities)
are CLASS-MAJOR (B, T, M, G) — softmax/argmax reduce over axis -2 with
grid cells on the minor (lane) axis; the reference's class-minor
(B, T, G, M) math is reproduced value-identically (tested against
class-minor oracles restated in tests/test_losses.py).

Activation modes: the reference's modular path uses only the class term
(ref loss.py:149-166); its gaussian monolith activates all three
(ref smrl_seld_gaussian.py:1059-1070). LossConfig.use_aiur / use_cl select
the mode. All terms take logits; AIUR/CL consume softmax probabilities
internally, as the monolith's probability-output model implies.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from seld_tpu.config import GridConfig, LossConfig

EPS = 1e-10  # ref loss.py:15


def make_class_weights(num_classes: int, background_weight: float = 0.05):
    """Events 1.0, background down-weighted (ref trainer.py:99-101)."""
    w = jnp.ones((num_classes,), jnp.float32)
    return w.at[num_classes - 1].set(background_weight)


def _example_weights(example_mask, batch: int):
    """(B,) float validity weights; None -> all ones. Padded tail batches
    (static-shape batching, seld_tpu.data.sampler) carry a mask so padded
    rows contribute nothing — the loss then equals the reference's
    variable-size-batch value exactly."""
    if example_mask is None:
        return jnp.ones((batch,), jnp.float32)
    return example_mask.astype(jnp.float32)


def class_ce_loss(logits, targets, class_weights=None, example_mask=None):
    """Weighted cross entropy with argmax-collapsed targets.

    logits, targets: class-major (B, ..., M, G). Matches torch
    nn.CrossEntropyLoss(weight=w) normalization:
    sum(w_y * nll_y) / sum(w_y).
    """
    labels = jnp.argmax(targets, axis=-2)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-2)
    nll = -jnp.take_along_axis(logp, labels[..., None, :], axis=-2)[..., 0, :]
    w = jnp.ones_like(nll) if class_weights is None else class_weights[labels]
    em = _example_weights(example_mask, logits.shape[0])
    em = em.reshape((-1,) + (1,) * (nll.ndim - 1))
    return jnp.sum(w * nll * em) / jnp.maximum(jnp.sum(w * em), 1e-8)


def class_mse_loss(logits, targets, example_mask=None):
    """softmax(logits) vs one-hot targets, mean over every element
    (ref loss.py:44-54). Class-major (B, T, M, G) operands."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
    sq = jnp.square(probs - targets)
    em = _example_weights(example_mask, logits.shape[0])
    per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)
    return jnp.sum(per_example * em) / jnp.maximum(jnp.sum(em), 1e-8)


def aiur_loss(logits, targets, example_mask=None):
    """1 - mean frame IoU of non-background argmax masks (ref loss.py:56-87).
    Class-major (B, T, M, G) operands."""
    m = logits.shape[-2]
    bg = m - 1
    pred_mask = (jnp.argmax(logits, axis=-2) != bg).astype(jnp.float32)  # (B,T,G)
    true_mask = (jnp.argmax(targets, axis=-2) != bg).astype(jnp.float32)
    intersection = jnp.sum(pred_mask * true_mask, axis=-1)  # (B,T)
    union = jnp.sum(pred_mask, -1) + jnp.sum(true_mask, -1) - intersection
    iou = intersection / (union + 1e-8)
    iou = jnp.where(union > 0, iou, jnp.ones_like(iou))  # empty==empty -> 1
    em = _example_weights(example_mask, logits.shape[0])[:, None]
    return 1.0 - jnp.sum(iou * em) / jnp.maximum(jnp.sum(em) * iou.shape[1], 1e-8)


def converging_localization_loss(logits_or_probs, targets, n_el: int, n_az: int,
                                 from_logits: bool = True, example_mask=None):
    """Attention-weighted localization convergence term (ref loss.py:89-146).
    Class-major (B, T, M, G) operands."""
    b, t, m, g = targets.shape
    probs = (
        jax.nn.softmax(logits_or_probs.astype(jnp.float32), axis=-2)
        if from_logits
        else logits_or_probs.astype(jnp.float32)
    )
    pred = probs.reshape(b, t, m, n_el, n_az)
    true = targets.reshape(b, t, m, n_el, n_az).astype(jnp.float32)

    true_nonbg = jnp.sum(true[:, :, :-1], axis=2)  # (B,T,I,J)
    pred_nonbg = jnp.sum(pred[:, :, :-1], axis=2)

    is_event = true_nonbg > 0.01
    n_bac = jnp.sum(~is_event, axis=(2, 3), keepdims=True).astype(jnp.float32)
    n_non = jnp.sum(is_event, axis=(2, 3), keepdims=True).astype(jnp.float32)

    ratio = -(n_bac / (n_non + EPS))
    y_prime = jnp.where(is_event, ratio, 1.0)  # (B,T,I,J)

    # 8-neighbor averaged difference with circular wrap on both axes:
    # neighbor(di,dj)[i,j] = y[(i+di) % I, (j+dj) % J]  == roll by (-di,-dj).
    diff_sum = jnp.zeros_like(y_prime)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            neighbor = jnp.roll(y_prime, shift=(-di, -dj), axis=(2, 3))
            diff_sum = diff_sum + (neighbor - y_prime)
    y_at = y_prime + diff_sum / 8.0

    has_events = (n_non > 0).astype(jnp.float32)  # (B,T,1,1)
    em = _example_weights(example_mask, targets.shape[0]).reshape(-1, 1, 1, 1)
    has_events = has_events * em
    weighted = pred_nonbg * y_at * has_events
    denom = jnp.sum(has_events) * n_el * n_az + EPS
    return jnp.sum(weighted) / denom


class LossOutput(NamedTuple):
    total: jnp.ndarray
    breakdown: dict


# ---------------------------------------------------------------------------
# Bitmask-native terms (round 3 train-step optimization)
#
# The labels travel as (B, T, G) uint16 class bitmasks (4.6 MB at the
# flagship batch); decoding them to dense one-hot (B, T, M, G) float32
# (232 MB) before the loss made XLA materialize the decode once for its
# many consumers — ~2 ms/step of pure HBM traffic in the profiled step
# (benchmarks/results/train_step_profile.json). Each term below consumes
# the bitmask directly with ELEMENTWISE-IDENTICAL math to its dense
# counterpart (pinned by tests/test_losses.py::test_bitmask_native_*):
#   * MSE: the one-hot is regenerated on the fly inside the squared
#     difference — a single consumer, so XLA fuses it into the reduce and
#     nothing dense ever hits HBM;
#   * CE: argmax of a multi-hot one-hot is its LOWEST set bit (ties take
#     the first index), i.e. popcount((mask & -mask) - 1), or background
#     when mask == 0;
#   * AIUR: argmax(targets) != background  <=>  mask != 0;
#   * CL: sum of event-class targets == popcount(mask).
# ---------------------------------------------------------------------------


def _bit_targets(mask, num_classes: int):
    """On-the-fly CLASS-MAJOR one-hot: mask (..., G) -> (..., M, G)
    (single-consumer; fuses)."""
    m = mask.astype(jnp.int32)
    event_bits = jnp.arange(num_classes - 1, dtype=jnp.int32)[:, None]
    onehot = ((m[..., None, :] >> event_bits) & 1).astype(jnp.float32)
    background = (m == 0).astype(jnp.float32)[..., None, :]
    return jnp.concatenate([onehot, background], axis=-2)


def _bit_labels(mask, num_classes: int):
    """argmax of the decoded one-hot: lowest set bit, else background."""
    m = mask.astype(jnp.int32)
    lsb_index = _popcount16((m & -m) - 1)
    return jnp.where(m == 0, num_classes - 1, lsb_index)


def _popcount16(x):
    """Popcount for 16-bit payloads carried in int32 (branch-free)."""
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def class_mse_loss_bits(logits, mask, num_classes: int, example_mask=None,
                        probs=None):
    """Bitmask-native class_mse_loss (identical values)."""
    if probs is None:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
    sq = jnp.square(probs - _bit_targets(mask, num_classes))
    em = _example_weights(example_mask, logits.shape[0])
    per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)
    return jnp.sum(per_example * em) / jnp.maximum(jnp.sum(em), 1e-8)


def class_ce_loss_bits(logits, mask, num_classes: int, class_weights=None,
                       example_mask=None):
    """Bitmask-native class_ce_loss (identical values)."""
    labels = _bit_labels(mask, num_classes)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-2)
    nll = -jnp.take_along_axis(logp, labels[..., None, :], axis=-2)[..., 0, :]
    w = jnp.ones_like(nll) if class_weights is None else class_weights[labels]
    em = _example_weights(example_mask, logits.shape[0])
    em = em.reshape((-1,) + (1,) * (nll.ndim - 1))
    return jnp.sum(w * nll * em) / jnp.maximum(jnp.sum(w * em), 1e-8)


def aiur_loss_bits(logits, mask, example_mask=None):
    """Bitmask-native aiur_loss (identical values)."""
    m = logits.shape[-2]
    bg = m - 1
    pred_mask = (jnp.argmax(logits, axis=-2) != bg).astype(jnp.float32)
    true_mask = (mask != 0).astype(jnp.float32)  # == argmax(onehot) != bg
    intersection = jnp.sum(pred_mask * true_mask, axis=-1)
    union = jnp.sum(pred_mask, -1) + jnp.sum(true_mask, -1) - intersection
    iou = intersection / (union + 1e-8)
    iou = jnp.where(union > 0, iou, jnp.ones_like(iou))
    em = _example_weights(example_mask, logits.shape[0])[:, None]
    return 1.0 - jnp.sum(iou * em) / jnp.maximum(jnp.sum(em) * iou.shape[1], 1e-8)


def converging_localization_loss_bits(logits, mask, n_el: int, n_az: int,
                                      example_mask=None, probs=None,
                                      pred_nonbg=None):
    """Bitmask-native converging_localization_loss (identical values).

    `pred_nonbg` (B, T, G) may be supplied directly (the fused Pallas
    loss path passes 1 - p_bg, mathematically equal to the event-class
    probability sum)."""
    b, t, g = mask.shape
    if pred_nonbg is None:
        if probs is None:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        pred_nonbg = jnp.sum(probs[:, :, :-1], axis=2)
    pred_nonbg = pred_nonbg.reshape(b, t, n_el, n_az)
    true_nonbg = _popcount16(mask.astype(jnp.int32)).astype(jnp.float32)
    true_nonbg = true_nonbg.reshape(b, t, n_el, n_az)

    is_event = true_nonbg > 0.01
    n_bac = jnp.sum(~is_event, axis=(2, 3), keepdims=True).astype(jnp.float32)
    n_non = jnp.sum(is_event, axis=(2, 3), keepdims=True).astype(jnp.float32)

    ratio = -(n_bac / (n_non + EPS))
    y_prime = jnp.where(is_event, ratio, 1.0)

    diff_sum = jnp.zeros_like(y_prime)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            neighbor = jnp.roll(y_prime, shift=(-di, -dj), axis=(2, 3))
            diff_sum = diff_sum + (neighbor - y_prime)
    y_at = y_prime + diff_sum / 8.0

    has_events = (n_non > 0).astype(jnp.float32)
    em = _example_weights(example_mask, mask.shape[0]).reshape(-1, 1, 1, 1)
    has_events = has_events * em
    weighted = pred_nonbg * y_at * has_events
    denom = jnp.sum(has_events) * n_el * n_az + EPS
    return jnp.sum(weighted) / denom


class SELDLossFn:
    """Configured composite loss: __call__(logits, targets) ->
    (total, breakdown). Pure and jit-friendly (breakdown values are
    scalars inside the jitted step; host code floats them for logging,
    unlike the reference's per-step .item() syncs at trainer.py:182)."""

    def __init__(self, cfg: LossConfig, grid: GridConfig, class_weights=None):
        self.cfg = cfg
        self.grid = grid
        if class_weights is None and cfg.loss_type == "ce":
            class_weights = make_class_weights(
                grid.num_classes, cfg.background_class_weight
            )
        self.class_weights = class_weights

    def __call__(self, logits, targets, example_mask=None) -> LossOutput:
        cfg = self.cfg
        if cfg.loss_type == "mse":
            loss_class = class_mse_loss(logits, targets, example_mask)
        elif cfg.loss_type == "ce":
            loss_class = class_ce_loss(
                logits, targets, self.class_weights, example_mask
            )
        else:
            raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

        total = cfg.w_class * loss_class
        breakdown = {f"class_{cfg.loss_type}": loss_class}
        if cfg.use_aiur:
            l_aiur = aiur_loss(logits, targets, example_mask)
            total = total + cfg.w_aiur * l_aiur
            breakdown["aiur"] = l_aiur
        if cfg.use_cl:
            l_cl = converging_localization_loss(
                logits, targets, self.grid.n_el, self.grid.n_az,
                example_mask=example_mask,
            )
            total = total + cfg.w_cl * l_cl
            breakdown["cl"] = l_cl
        return LossOutput(total, breakdown)

    def from_bitmask(self, logits, label_mask, example_mask=None,
                     fused=None, mesh=None) -> LossOutput:
        """Composite loss straight from the (B, T, G) uint16 bitmask.

        Value-identical to ``__call__(logits,
        decode_class_bitmask(label_mask))`` but never materializes the
        dense (B, T, M, G) one-hot targets, and computes the probs
        softmax once across MSE/CL — the jitted train/eval steps use
        this path (see the module comment above the *_bits terms).

        `fused` selects the Pallas softmax-region kernel
        (seld_tpu.ops.loss_pallas): None = auto, True forces it,
        "interpret" runs the kernel in interpret mode (CPU tests). Auto
        now resolves to the XLA (jnp) path everywhere: with the
        class-major (B, T, M, G) layout the jnp softmax/MSE region is
        lane-efficient and XLA fuses it into the surrounding step BETTER
        than the custom-call boundary allows — measured on chip at b16
        flagship: 25.4-26.5 ms/step XLA vs ~29.8 fused (the kernel won
        only under the old class-minor layout, 27.3 vs 28.3;
        benchmarks/results/step_layout_ab.json + step_fused_confirm.json).
        The kernel stays maintained and opt-in for future layouts. The
        fused path is numerically equivalent, not bit-identical
        (different reduction order/pred_nonbg formulation); the jnp path
        remains the oracle."""
        cfg = self.cfg
        nc = self.grid.num_classes
        if fused is None:
            fused = False
        if fused and cfg.loss_type == "mse":
            return self._from_bitmask_fused(
                logits, label_mask, example_mask,
                interpret=(fused == "interpret"), mesh=mesh,
            )
        needs_probs = cfg.loss_type == "mse" or cfg.use_cl
        probs = (
            jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
            if needs_probs else None
        )
        if cfg.loss_type == "mse":
            loss_class = class_mse_loss_bits(
                logits, label_mask, nc, example_mask, probs=probs
            )
        elif cfg.loss_type == "ce":
            loss_class = class_ce_loss_bits(
                logits, label_mask, nc, self.class_weights, example_mask
            )
        else:
            raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

        total = cfg.w_class * loss_class
        breakdown = {f"class_{cfg.loss_type}": loss_class}
        if cfg.use_aiur:
            l_aiur = aiur_loss_bits(logits, label_mask, example_mask)
            total = total + cfg.w_aiur * l_aiur
            breakdown["aiur"] = l_aiur
        if cfg.use_cl:
            l_cl = converging_localization_loss_bits(
                logits, label_mask, self.grid.n_el, self.grid.n_az,
                example_mask=example_mask, probs=probs,
            )
            total = total + cfg.w_cl * l_cl
            breakdown["cl"] = l_cl
        return LossOutput(total, breakdown)

    def _from_bitmask_fused(self, logits, label_mask, example_mask=None,
                            interpret: bool = False, mesh=None) -> LossOutput:
        """MSE-family composite via the fused Pallas softmax-region kernel
        (one pass computes the squared-error row sums and the background
        plane; AIUR's zero-gradient argmax stays in XLA)."""
        from seld_tpu.ops.loss_pallas import grid_loss_terms

        cfg = self.cfg
        nc = self.grid.num_classes
        b, t, m, g = logits.shape
        # Class-major logits feed the kernel directly — no transpose
        # (the pre-layout-switch path paid two ~145 MB swapaxes here).
        x = logits.reshape(b * t, m, g).astype(jnp.float32)
        sq, pbg = grid_loss_terms(
            x, label_mask.reshape(b * t, g), nc, interpret, mesh
        )
        em = _example_weights(example_mask, b)
        per_example = sq.reshape(b, t * g).sum(axis=1) / (t * g * m)
        loss_class = jnp.sum(per_example * em) / jnp.maximum(jnp.sum(em), 1e-8)
        total = cfg.w_class * loss_class
        breakdown = {"class_mse": loss_class}
        if cfg.use_aiur:
            l_aiur = aiur_loss_bits(logits, label_mask, example_mask)
            total = total + cfg.w_aiur * l_aiur
            breakdown["aiur"] = l_aiur
        if cfg.use_cl:
            l_cl = converging_localization_loss_bits(
                logits, label_mask, self.grid.n_el, self.grid.n_az,
                example_mask=example_mask,
                pred_nonbg=(1.0 - pbg).reshape(b, t, g),
            )
            total = total + cfg.w_cl * l_cl
            breakdown["cl"] = l_cl
        return LossOutput(total, breakdown)
