"""ACS test-time augmentation (TTA): average predictions over the 16
label-exact FOA scene transforms.

The reference has no TTA (prediction exists only inside its eval loop,
ref trainer.py:394-711). This module applies the training-time ACS
transform family (seld_tpu/features/acs.py — azimuth 90-deg rotations,
azimuth reflection, elevation flip; Mazzon et al. 2019) at *test* time:
run the model on each transformed copy of the input features, map every
prediction back to original scene coordinates with the exact inverse
transform, and average. Because each transform is an exact permutation
of the label grid (and an exact signed permutation of DOA vectors), the
back-mapping is lossless — TTA changes only the model's epistemic
variance, never the coordinate bookkeeping.

Supported output families:

  * grid models — softmax probabilities are inverse-permuted on the cell
    axis and averaged (class-major (B, T, M, G) layout, probs averaged
    in f32);
  * single-ACCDOA — output vectors are inverse-rotated (the inverse
    signed permutation of (x, y, z)) and averaged; the averaged norm
    still thresholds as activity (transform disagreement shortens the
    vector, a natural confidence discount);
  * multi-ACCDOA/ADPIT — raw outputs CANNOT be averaged (track order is
    arbitrary per forward pass, so vector averaging would mix unrelated
    tracks); instead each view is DECODED to its per-class cell-activity
    grid (the track axis reduces away), inverse-permuted, and the {0,1}
    activity maps are averaged into per-cell VOTES, thresholded by
    majority (accdoa.decode_vote_grid_jnp). Identity-only TTA reproduces
    the plain decode bit-for-bit.

Feature-set validity is inherited from acs_tables: only "mel_iv" carries
the signed spatial information the transforms act on; plain "mel" / GCC
raise there.

The compute runs as a lax.scan over the transform set (one traced
forward, K sequential executions at the native batch shape) — constant
memory in K, and it stays inside the VMEM-resident batch regime instead
of multiplying the batch by K.
"""

from __future__ import annotations

import numpy as np

from seld_tpu.features.acs import N_TRANSFORMS, acs_tables, vector_tables


def validate_transforms(transforms) -> tuple:
    """Normalize a transform subset: default = all 16; must be unique
    ints in [0, 16)."""
    if transforms is None:
        return tuple(range(N_TRANSFORMS))
    sel = tuple(int(t) for t in transforms)
    if not sel:
        raise ValueError("TTA needs at least one transform")
    if len(set(sel)) != len(sel):
        raise ValueError(f"duplicate TTA transforms: {sel}")
    bad = [t for t in sel if not 0 <= t < N_TRANSFORMS]
    if bad:
        raise ValueError(
            f"TTA transforms must be in [0, {N_TRANSFORMS}); got {bad}"
        )
    return sel


def make_tta_forward(apply_fn, n_el: int, n_az: int, feature_set: str,
                     transforms=None, kind: str = "grid",
                     activity_threshold: float = 0.5,
                     bias_sweep=None,
                     threshold_sweep=None,
                     fold: int = 1):
    """Build the TTA-averaged forward.

    apply_fn(ctx, mel) -> model output for one feature batch
    (B, T, C, F); ctx is an arbitrary pytree threaded through untouched
    (train state, quant tree, ...). Returns fwd(ctx, mel) -> f32 average
    over `transforms` in ORIGINAL scene coordinates:

      kind="grid":         (B, T, M, G) mean softmax probabilities
      kind="accdoa":       (B, T, C_ev, 3) mean inverse-rotated vectors
      kind="multi_accdoa": (B, T, C_ev, G) mean per-class cell VOTES —
        each view is decoded to its {0,1} class-activity grid
        (track axis reduced away, sidestepping the track-permutation
        ambiguity that makes raw multi-ACCDOA outputs unaverageable),
        inverse-permuted, and averaged; threshold with
        seld_tpu.accdoa.decode_vote_grid_jnp (majority vote).

    `bias_sweep` (grid kind only): a length-K vector of candidate
    background decode biases. The returned fwd then yields
    (K, B, T, M, G) — for each candidate bias, the view-average of
    softmax(bias_background_logits(logits, b)). The model forward runs
    ONCE per view (the expensive part); only the bias+softmax+gather is
    replayed per candidate — this is the calibration path that tunes
    bg_bias UNDER the TTA decode (the bias enters pre-softmax per view,
    so the biased average is not recoverable from the unbiased one, and
    a bias tuned on the plain decode can sit far from the TTA-decode
    optimum — see benchmarks/flagship_synth_accuracy.py).

    `threshold_sweep` (multi_accdoa kind only): a length-K vector of
    candidate activity thresholds. The returned fwd then yields
    (K, B, T, C_ev, G) — for each candidate, the view-average of the
    per-class cell votes DECODED AT THAT THRESHOLD. The threshold enters
    per view (it gates which tracks paint activity before the vote
    average), so — exactly like bias_sweep — the thresholded average is
    not recoverable from an average at another threshold, and the
    calibration must run under the TTA decode it tunes. The model
    forward still runs once per view; only the norm-threshold/paint is
    replayed per candidate. Single-ACCDOA needs no sweep support here:
    its TTA average is vectors, thresholded AFTER averaging, so every
    candidate decodes from the same averaged output.

    `fold` folds that many views into the window-batch dimension per
    device call: the scan runs len(transforms)/fold iterations over
    (fold*B)-row forwards instead of len(transforms) iterations at B.
    This amortizes the per-iteration scan boundary and batches the
    per-view inverse gathers, and is worthwhile exactly when fold*B
    stays inside the flat b8–24 VMEM regime (e.g. the predictor's
    native B=8 with fold 2–3); past that the forward itself slows and
    eats the win (benchmarks/tta_perf.py measures both). fold must
    divide len(transforms). Numerics: folded forwards run at a
    different executable batch shape, so results match fold=1 only to
    ~1e-6 (the fixed-batch-shape invariant) — bit-equality contracts
    (identity-only == plain decode; stream == offline) hold per fixed
    fold value, not across fold values. The calibration sweeps
    (`bias_sweep`/`threshold_sweep`) require fold=1.
    """
    import jax
    import jax.numpy as jnp

    if kind not in ("grid", "accdoa", "multi_accdoa"):
        raise ValueError(f"unknown TTA kind {kind!r}")
    if bias_sweep is not None and kind != "grid":
        raise ValueError(
            "bias_sweep applies to grid TTA only — ACCDOA decodes have "
            "no background logit"
        )
    if threshold_sweep is not None and kind != "multi_accdoa":
        raise ValueError(
            "threshold_sweep applies to multi_accdoa TTA only (grid "
            "decodes sweep bg_bias; single-ACCDOA averages vectors, so "
            "candidate thresholds decode from the averaged output)"
        )
    sel = validate_transforms(transforms)
    fold = int(fold)
    if fold < 1:
        raise ValueError(f"TTA fold must be >= 1; got {fold}")
    if fold > 1 and (bias_sweep is not None or threshold_sweep is not None):
        raise ValueError(
            "TTA fold > 1 does not compose with calibration sweeps — "
            "calibrate at fold=1, serve the tuned point at any fold"
        )
    if len(sel) % fold:
        raise ValueError(
            f"TTA fold ({fold}) must divide the number of transforms "
            f"({len(sel)})"
        )
    cell_gather, ch_perm, ch_sign = acs_tables(n_el, n_az, feature_set)
    cp = jnp.asarray(ch_perm[list(sel)])
    cs = jnp.asarray(ch_sign[list(sel)])
    if kind in ("grid", "multi_accdoa"):
        # cell_gather maps labels forward (new[c] = old[cg[c]]); model
        # output on transformed features lives in "new" coordinates, so
        # original[g] = output[argsort(cg)[g]].
        inv_cg = jnp.asarray(
            np.stack([np.argsort(cell_gather[t]) for t in sel]).astype(np.int32)
        )
        xs = {"cp": cp, "cs": cs, "inv": inv_cg}
    else:
        vperm, vsign = vector_tables(feature_set)
        # forward: new[i] = old[vp[i]] * vs[i]; signs are +-1 so the
        # inverse is old[j] = new[ivp[j]] * vs[ivp[j]].
        ivp = np.stack([np.argsort(vperm[t]) for t in sel]).astype(np.int32)
        ivs = np.stack([vsign[t][ivp[i]] for i, t in enumerate(sel)])
        xs = {"cp": cp, "cs": cs, "inv": jnp.asarray(ivp),
              "inv_sign": jnp.asarray(ivs)}

    biases = None
    if bias_sweep is not None:
        biases = jnp.asarray(bias_sweep, jnp.float32).reshape(-1)
    thresholds = None
    if threshold_sweep is not None:
        thresholds = jnp.asarray(threshold_sweep, jnp.float32).reshape(-1)

    if fold > 1:
        # scan leaves carry `fold` views per iteration
        xs = {k: v.reshape((len(sel) // fold, fold) + v.shape[1:])
              for k, v in xs.items()}

        def fwd_folded(ctx, mel):
            if kind == "multi_accdoa":
                out_sd = jax.eval_shape(lambda m: apply_fn(ctx, m), mel)
                b, t, _, c_ev, _ = out_sd.shape
                acc0 = jnp.zeros((b, t, c_ev, n_el * n_az), jnp.float32)
            else:
                acc0 = jnp.zeros(
                    jax.eval_shape(lambda m: apply_fn(ctx, m), mel).shape,
                    jnp.float32,
                )

            def body(acc, row):
                # (B,T,C,F) -> per-view channel perm/sign -> (V*B,T,C,F)
                feats = jnp.take_along_axis(
                    mel[None], row["cp"][:, None, None, :, None], axis=3
                ) * row["cs"][:, None, None, :, None]
                out = apply_fn(
                    ctx, feats.reshape((-1,) + mel.shape[1:])
                ).astype(jnp.float32)
                if kind == "grid":
                    probs = jax.nn.softmax(out, axis=2)  # (V*B,T,M,G)
                    probs = probs.reshape((fold, -1) + probs.shape[1:])
                    back = jnp.take_along_axis(
                        probs, row["inv"][:, None, None, None, :], axis=4
                    )
                elif kind == "multi_accdoa":
                    from seld_tpu.accdoa import (
                        multi_accdoa_class_activity_jnp,
                    )

                    act = multi_accdoa_class_activity_jnp(
                        out, n_el, n_az, activity_threshold
                    )  # (V*B, T, C, G)
                    act = act.reshape((fold, -1) + act.shape[1:])
                    back = jnp.take_along_axis(
                        act, row["inv"][:, None, None, None, :], axis=4
                    )
                else:
                    o = out.reshape((fold, -1) + out.shape[1:])
                    back = jnp.take_along_axis(
                        o, row["inv"][:, None, None, None, :], axis=4
                    ) * row["inv_sign"][:, None, None, None, :]
                return acc + back.sum(axis=0), None

            acc, _ = jax.lax.scan(body, acc0, xs)
            return acc / float(len(sel))

        return fwd_folded

    def fwd(ctx, mel):
        out_sd = jax.eval_shape(lambda m: apply_fn(ctx, m), mel)
        if kind == "multi_accdoa":
            # (B, T, N, C, 3) model output -> (B, T, C, G) vote maps
            b, t, _, c_ev, _ = out_sd.shape
            vote_shape = (b, t, c_ev, n_el * n_az)
            if thresholds is not None:
                vote_shape = (thresholds.shape[0],) + vote_shape
            acc0 = jnp.zeros(vote_shape, jnp.float32)
        elif biases is not None:
            acc0 = jnp.zeros((biases.shape[0],) + out_sd.shape, jnp.float32)
        else:
            acc0 = jnp.zeros(out_sd.shape, jnp.float32)

        def body(acc, row):
            feats = jnp.take_along_axis(
                mel, row["cp"][None, None, :, None], axis=2
            ) * row["cs"][None, None, :, None]
            out = apply_fn(ctx, feats).astype(jnp.float32)
            if kind == "grid" and biases is not None:
                from seld_tpu.infer import bias_background_logits

                # one forward per view; each candidate bias replays only
                # bias+softmax+gather (lax.map keeps one (B,T,M,G) probs
                # copy live at a time)
                back = jax.lax.map(
                    lambda b: jnp.take_along_axis(
                        jax.nn.softmax(
                            bias_background_logits(out, b), axis=2
                        ),
                        row["inv"][None, None, None, :], axis=3,
                    ),
                    biases,
                )  # (K, B, T, M, G)
            elif kind == "grid":
                probs = jax.nn.softmax(out, axis=2)  # class axis, (B,T,M,G)
                back = jnp.take_along_axis(
                    probs, row["inv"][None, None, None, :], axis=3
                )
            elif kind == "multi_accdoa":
                from seld_tpu.accdoa import multi_accdoa_class_activity_jnp

                if thresholds is not None:
                    # one forward per view; each candidate threshold
                    # replays only the norm-gate/paint (lax.map keeps one
                    # (B,T,C,G) activity copy live at a time)
                    back = jax.lax.map(
                        lambda th: jnp.take_along_axis(
                            multi_accdoa_class_activity_jnp(
                                out, n_el, n_az, th
                            ),
                            row["inv"][None, None, None, :], axis=3,
                        ),
                        thresholds,
                    )  # (K, B, T, C, G)
                else:
                    activity = multi_accdoa_class_activity_jnp(
                        out, n_el, n_az, activity_threshold
                    )  # (B, T, C, G) in {0, 1}, transformed coordinates
                    back = jnp.take_along_axis(
                        activity, row["inv"][None, None, None, :], axis=3
                    )
            else:
                back = jnp.take_along_axis(
                    out, row["inv"][None, None, None, :], axis=3
                ) * row["inv_sign"][None, None, None, :]
            return acc + back, None

        acc, _ = jax.lax.scan(body, acc0, xs)
        return acc / float(len(sel))

    return fwd
