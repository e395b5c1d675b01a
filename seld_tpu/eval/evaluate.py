"""Model evaluation — the reference's test_model (ref trainer.py:394-711),
re-designed:

  * the architecture is rebuilt from the config STORED IN THE CHECKPOINT
    (the reference trusts the live global Config — ref trainer.py:430-432,
    a latent mismatch hazard SURVEY §5 flags);
  * per-batch device work returns only int8 class grids + scalar losses —
    the reference materializes every logit tensor on the host
    (ref trainer.py:504-531);
  * visualization re-runs just the selected windows (two-pass) instead of
    holding the full test set's logits;
  * adds DCASE-style ER/F/LE/LR alongside the reference's accuracies.
"""

from __future__ import annotations

import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config
from seld_tpu.data.corpus import WindowedCorpus
from seld_tpu.data.sampler import BatchIterator
from seld_tpu.eval.metrics import (
    accuracy_metrics,
    dcase2022_metrics,
    seld_metrics,
)
from seld_tpu.losses import SELDLossFn
from seld_tpu.models import build_model
from seld_tpu.targets.rasterize import decode_class_bitmask
from seld_tpu.train.checkpoint import CheckpointManager, load_checkpoint_config
from seld_tpu.train.optimizer import make_optimizer
from seld_tpu.train.state import create_train_state
from seld_tpu.utils.logging import get_logger


def evaluate_model(
    cfg: Config,
    test_corpus: WindowedCorpus,
    checkpoint_dir,
    num_visualizations: int = 5,
    save_visualizations: bool = True,
    seed: int = 0,
    mesh=None,
    tta_transforms=None,
    int8: bool = False,
    int8_weight_only: bool = False,
    int8_calib_batches: int = 4,
    bg_bias: float = 0.0,
    bg_bias_sweep=None,
    accdoa_threshold: float | None = None,
    accdoa_threshold_sweep=None,
    median_filter: int = 0,
    median_filter_sweep=None,
    use_checkpoint: str = "best",
) -> dict:
    """tta_transforms: optional ACS TTA subset (seld_tpu.tta) — prediction
    grids (and therefore every accuracy/DCASE metric) come from the
    transform-averaged forward; losses stay on the plain forward so they
    remain comparable across eval runs. Visualizations also show the
    plain forward.

    int8=True evaluates the int8 post-training-quantized forward
    (seld_tpu.quant, self-calibrated on the first eval batches) — the
    accuracy gate for `predict --int8` / int8 export on YOUR labeled
    data. Losses, metrics, and visualizations all come from the
    quantized forward. Composes with TTA; not with a device mesh.

    bg_bias (grid models): reduce the background class's logit by this
    amount before every decode — the detection operating point
    (SELDPredictor.bg_bias); losses stay on the unbiased logits for
    comparability, decisions/metrics/visualizations use the biased ones.
    bg_bias_sweep (iterable of floats): one forward per batch PER VIEW,
    every bias decoded on device, and the report gains a per-bias
    DCASE2022 table + the SELD_error-best bias — the calibration tool
    that tunes bg_bias on a validation corpus. The sweep calibrates the
    decode path THIS eval uses: with tta_transforms set, candidate
    biases are decoded from the TTA-averaged biased probabilities
    (the bias enters pre-softmax per view, so a bias tuned on the plain
    decode does not transfer to the TTA decode — calibrate per path);
    otherwise from the plain per-window logits.

    accdoa_threshold (ACCDOA / multi-ACCDOA models): the vector-norm
    activity threshold every decode uses (None = the DCASE2022-baseline
    0.5) — the ACCDOA counterpart of bg_bias's operating point
    (SELDPredictor.accdoa_threshold). Losses stay on the raw vectors.
    accdoa_threshold_sweep (iterable of floats): every candidate decoded
    on device from one forward per batch (per view under TTA) with a
    per-threshold DCASE2022 table + the SELD_error-best threshold — the
    calibration tool for `predict/export --accdoa-threshold`. Like the
    bias sweep, it calibrates the decode path THIS eval uses: under
    multi-ACCDOA TTA the threshold gates each view's activity before
    the vote average, so candidates are swept inside the TTA forward
    (seld_tpu.tta threshold_sweep); single-ACCDOA TTA averages vectors,
    so candidates decode from the averaged output.

    median_filter (odd frames): temporal majority smoothing of the
    decoded prediction grids (seld_tpu.postprocess) before metrics —
    the eval gate for `predict --median-filter`. Composes with
    bias/TTA/int8 (it smooths whatever those decode). Applied
    per eval window (the corpus windows are the decode unit here).
    median_filter_sweep (iterable of odd widths): the filter runs on
    the HOST on already-gathered grids, so sweeping widths costs zero
    extra forwards — the report gains a per-width DCASE2022 table and
    the SELD_error-best width. The bg_bias_sweep rows stay unfiltered
    (one sweep dimension at a time)."""
    log = get_logger()
    if int8 and mesh is not None:
        raise ValueError(
            "eval --int8 does not compose with a device mesh — the "
            "quantized forward runs single-device, like the predictor"
        )
    # Preempted/aborted training leaves a valid-looking checkpoint tree;
    # scoring one silently is how two study baselines went bad (STATUS
    # round-4 close-out). Stamp the report and warn loudly.
    from seld_tpu.train.completion import workdir_incomplete_reason

    training_incomplete = workdir_incomplete_reason(checkpoint_dir)
    if training_incomplete is not None:
        log.warning(
            "checkpoint %s comes from TRUNCATED training (%s) — metrics "
            "reflect a partially trained model", checkpoint_dir,
            training_incomplete,
        )
    stored_cfg = load_checkpoint_config(checkpoint_dir)
    if stored_cfg is not None:
        if stored_cfg.model != cfg.model:
            log.warning(
                "checkpoint architecture (%s) differs from live config (%s); "
                "using the checkpoint's",
                stored_cfg.model.model_type, cfg.model.model_type,
            )
        cfg = cfg.replace_path("model", stored_cfg.model)

    from seld_tpu.models.registry import ACCDOA_MODELS as _ACC

    if bg_bias or bg_bias_sweep is not None:
        if cfg.model.model_type in _ACC:
            raise ValueError(
                "bg_bias applies to grid models only — ACCDOA decodes "
                "have no background logit"
            )

    # ACCDOA activity threshold (decode operating point): validated up
    # front like bg_bias; None = the 0.5 default. An explicit value or a
    # sweep on a grid model is a named error (validate_accdoa_threshold).
    from seld_tpu.infer import validate_accdoa_threshold

    _is_accdoa = cfg.model.model_type in _ACC
    acc_th = validate_accdoa_threshold(accdoa_threshold, _is_accdoa)
    if accdoa_threshold_sweep is not None:
        accdoa_threshold_sweep = [
            validate_accdoa_threshold(t, _is_accdoa)
            for t in accdoa_threshold_sweep
        ]
        if not accdoa_threshold_sweep:
            raise ValueError(
                "accdoa_threshold_sweep must list at least one threshold"
            )

    # validate post-processing knobs BEFORE the forward loop: an invalid
    # (even) width must fail here, not after minutes of chip time
    from seld_tpu.postprocess import smooth_classes, validate_width

    median_filter = validate_width(median_filter)
    if median_filter_sweep is not None:
        median_filter_sweep = [validate_width(w) for w in median_filter_sweep]
        if not median_filter_sweep:
            raise ValueError("median_filter_sweep must list >=1 width")

    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    optimizer = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)

    win = test_corpus.window_frames
    sample = jnp.zeros(
        (cfg.train.batch_size, win, test_corpus.mel.shape[1], cfg.model.n_mels),
        jnp.float32,
    )
    template = create_train_state(model, optimizer, jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(checkpoint_dir, cfg)
    # use_checkpoint="latest" scores the newest ROLLING checkpoint (raw
    # final-ish weights) instead of the BEST one — useful for
    # late-training diagnostics (e.g. "did the final model learn events
    # the best-checkpoint selection discarded?", benchmarks/
    # reference_parity.py). "best" keeps the reference's test_model
    # semantics (trainer.py:394-711: always the best checkpoint).
    if use_checkpoint == "latest":
        restored = ckpt.restore_latest(template)
    elif use_checkpoint == "best":
        restored = ckpt.restore_best(template)
    else:
        ckpt.close()
        raise ValueError(
            f"use_checkpoint must be 'best' or 'latest', got "
            f"{use_checkpoint!r}"
        )
    checkpoint_kind = use_checkpoint
    if restored is None:
        fallback = "latest" if use_checkpoint == "best" else "best"
        restored = (ckpt.restore_latest(template) if fallback == "latest"
                    else ckpt.restore_best(template))
        if restored is not None:
            # never silent: 'latest' falling back to BEST can mean EMA
            # weights where the caller expected raw final ones — say so
            # and record it in the result (checkpoint_kind)
            checkpoint_kind = fallback
            log.warning(
                "No %s checkpoint under %s — falling back to the %s one",
                use_checkpoint, checkpoint_dir, fallback,
            )
    if restored is None:
        ckpt.close()
        raise FileNotFoundError(f"no checkpoint found under {checkpoint_dir}")
    state, meta = restored
    ckpt.close()
    log.info(
        "Loaded checkpoint epoch %d (test loss %.6f)",
        meta["epoch"], meta["test_loss"],
    )
    if mesh is not None:
        from seld_tpu.parallel import shard_variables

        # FSDP (mesh.shard_params) applies to eval too: params stay
        # 1/n_data per chip and GSPMD gathers them per use.
        state = shard_variables(state, mesh,
                                shard_params=cfg.mesh.shard_params)

    num_classes = cfg.grid.num_classes
    from seld_tpu.models.registry import ACCDOA_MODELS

    accdoa_mode = cfg.model.model_type in ACCDOA_MODELS
    sweep = None
    if bg_bias_sweep is not None:
        bg_bias_sweep = [float(b) for b in bg_bias_sweep]
        if not bg_bias_sweep:
            raise ValueError("bg_bias_sweep must list at least one bias")
        sweep = jnp.asarray(bg_bias_sweep, jnp.float32)
    thr_sweep = None
    if accdoa_threshold_sweep is not None:
        thr_sweep = jnp.asarray(accdoa_threshold_sweep, jnp.float32)
    # unified bookkeeping for the batch loop and the report block — the
    # two sweeps are mutually exclusive by model family (each raises on
    # the other family above)
    if sweep is not None:
        sweep_values, sweep_kind = bg_bias_sweep, "bg_bias"
    elif thr_sweep is not None:
        sweep_values, sweep_kind = accdoa_threshold_sweep, "accdoa_threshold"
    else:
        sweep_values = sweep_kind = None

    qtree = None
    if int8:
        from seld_tpu.quant import quantize_model

        bs = cfg.train.batch_size
        calib = []
        for start in range(
            0, min(int8_calib_batches * bs, len(test_corpus)), bs
        ):
            idx = np.arange(start, min(start + bs, len(test_corpus)))
            mel_b, _ = test_corpus.gather(idx)
            calib.append(np.asarray(mel_b, np.float32))
        qtree = quantize_model(
            model, state.variables(), calib, weight_only=int8_weight_only
        )
        log.info(
            "Eval int8 PTQ: %d quantized layers, %d calibration batches%s",
            len(qtree), len(calib),
            ", weight-only" if int8_weight_only else "",
        )

    def _apply_raw(qt, st, mel_in):
        """Eval-mode forward; qt rides as a jit ARGUMENT (see
        quant.apply_maybe_quantized for the closure-constant rule)."""
        from seld_tpu.quant import apply_maybe_quantized

        return apply_maybe_quantized(model, st.variables(), qt, mel_in)

    def _bias_logits(out, b=None):
        """Background decode bias (the predictor's shared op); identity
        at bias 0 (losses always consume UNBIASED logits)."""
        from seld_tpu.infer import bias_background_logits

        b = bg_bias if b is None else b
        if isinstance(b, float) and not b:
            return out
        return bias_background_logits(out, b)

    def _apply_dec(qt, st, mel_in):
        """Decode-path forward (bias applied pre-softmax so TTA views
        average biased probabilities)."""
        return _bias_logits(_apply_raw(qt, st, mel_in))

    tta_fwd = None
    if tta_transforms:
        from seld_tpu.models.registry import MULTI_ACCDOA_MODELS as _MULTI
        from seld_tpu.tta import make_tta_forward

        if cfg.model.model_type in _MULTI:
            tta_kind = "multi_accdoa"  # decoded-space vote averaging
        elif accdoa_mode:
            tta_kind = "accdoa"
        else:
            tta_kind = "grid"
        tta_fwd = make_tta_forward(
            lambda ctx, m: _apply_dec(ctx[0], ctx[1], m),
            cfg.grid.n_el, cfg.grid.n_az, cfg.features.feature_set,
            transforms=tta_transforms,
            kind=tta_kind,
            activity_threshold=acc_th,
        )
        log.info("Eval TTA enabled (%d transforms)", len(tta_transforms))
    tta_sweep_fwd = None
    if tta_fwd is not None and sweep is not None:
        # calibrate the bias UNDER the TTA decode (see the docstring) —
        # raw (unbiased) logits per view, each candidate bias applied
        # pre-softmax inside the TTA average. The MAIN decode's bias is
        # appended as the LAST sweep row so one TTA pass serves both the
        # sweep table and the main decode (each view's model forward
        # runs once; without this the views ran twice per batch).
        from seld_tpu.tta import make_tta_forward as _mk_tta

        tta_sweep_fwd = _mk_tta(
            lambda ctx, m: _apply_raw(ctx[0], ctx[1], m),
            cfg.grid.n_el, cfg.grid.n_az, cfg.features.feature_set,
            transforms=tta_transforms,
            kind="grid",
            bias_sweep=jnp.concatenate(
                [sweep, jnp.asarray([float(bg_bias)], jnp.float32)]
            ),
        )
    tta_thr_sweep_fwd = None
    if tta_fwd is not None and thr_sweep is not None \
            and tta_kind == "multi_accdoa":
        # calibrate the threshold UNDER the multi-ACCDOA TTA decode: it
        # gates each view's activity BEFORE the vote average, so the
        # candidates sweep inside the TTA forward. The MAIN decode's
        # threshold rides as the LAST row (one TTA pass serves both —
        # same pattern as the bias sweep above). Single-ACCDOA TTA needs
        # no special forward: it averages vectors and candidates decode
        # from the averaged output inside infer_step.
        from seld_tpu.tta import make_tta_forward as _mk_tta_thr

        tta_thr_sweep_fwd = _mk_tta_thr(
            lambda ctx, m: _apply_raw(ctx[0], ctx[1], m),
            cfg.grid.n_el, cfg.grid.n_az, cfg.features.feature_set,
            transforms=tta_transforms,
            kind="multi_accdoa",
            threshold_sweep=jnp.concatenate(
                [thr_sweep, jnp.asarray([acc_th], jnp.float32)]
            ),
        )
    if accdoa_mode:
        from seld_tpu.accdoa import (
            ACCDOALossFn,
            ADPITLossFn,
            decode_accdoa_to_grid_jnp,
            decode_multi_accdoa_to_grid_jnp,
        )
        from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

        assert test_corpus.accdoa is not None, (
            "ACCDOA evaluation needs a corpus built with targets.accdoa=true"
        )
        multi = cfg.model.model_type in MULTI_ACCDOA_MODELS
        acc_loss_fn = ADPITLossFn() if multi else ACCDOALossFn()
        # plain_decode consumes raw model vectors (the viz second pass
        # re-runs the PLAIN forward — same convention as grid TTA, which
        # also visualizes untransformed logits); `decode` consumes
        # whatever infer_step's dec_in is: raw vectors normally, the
        # (B, T, C, G) vote map under multi-ACCDOA TTA.
        plain_decode = (
            decode_multi_accdoa_to_grid_jnp if multi
            else decode_accdoa_to_grid_jnp
        )
        if multi and tta_fwd is not None:
            from seld_tpu.accdoa import decode_vote_grid_jnp

            def decode(dec_in, n_el, n_az, num_classes):
                # votes were thresholded at acc_th per view inside tta_fwd
                return decode_vote_grid_jnp(dec_in, num_classes)
        else:
            # raw vectors (plain) or TTA-averaged vectors (single-ACCDOA):
            # the activity threshold applies at decode time
            def decode(dec_in, n_el, n_az, num_classes):
                return plain_decode(dec_in, n_el, n_az, num_classes, acc_th)

        @jax.jit
        def infer_step(qt, state, mel, label_mask, acc_targets, example_mask):
            from seld_tpu.ops.attention import attention_mesh

            with attention_mesh(mesh):
                vectors = _apply_raw(qt, state, mel)
                if tta_thr_sweep_fwd is not None:
                    # ONE TTA pass serves the sweep table and the main
                    # decode (acc_th rides as the LAST candidate row)
                    votes_k = tta_thr_sweep_fwd((qt, state), mel)
                    dec_in = votes_k[-1]
                else:
                    dec_in = (
                        vectors if tta_fwd is None
                        else tta_fwd((qt, state), mel)
                    )
            total, breakdown = acc_loss_fn(vectors, acc_targets, example_mask)
            pred_cls = decode(
                dec_in, cfg.grid.n_el, cfg.grid.n_az, num_classes
            )
            from seld_tpu.losses.seld_loss import _bit_labels

            true_cls = _bit_labels(label_mask, num_classes).astype(jnp.int8)
            if thr_sweep is None:
                pred_sw = jnp.zeros((), jnp.int8)
            elif tta_thr_sweep_fwd is not None:
                from seld_tpu.accdoa import decode_vote_grid_jnp as _dvg

                # per-threshold TTA vote maps (K, B, T, C, G) -> grids
                # (the last row was the main decode, consumed above)
                pred_sw = _dvg(votes_k[:-1], num_classes)
            else:
                # one forward; every candidate threshold decoded on
                # device from dec_in (raw vectors, or the TTA-averaged
                # vectors for single-ACCDOA — thresholds apply
                # post-average there)
                pred_sw = jax.lax.map(
                    lambda th: plain_decode(
                        dec_in, cfg.grid.n_el, cfg.grid.n_az,
                        num_classes, th,
                    ),
                    thr_sweep,
                )  # (K, B, T, G)
            return ({"loss": total, **breakdown}, pred_cls, true_cls,
                    pred_sw)

    else:

        from seld_tpu.losses.seld_loss import _bit_labels

        @jax.jit
        def infer_step(qt, state, mel, label_mask, acc_targets, example_mask):
            from seld_tpu.ops.attention import attention_mesh

            with attention_mesh(mesh):
                logits = _apply_raw(qt, state, mel)
                if tta_sweep_fwd is not None:
                    # ONE TTA pass serves both the sweep table and the
                    # main decode: the sweep vector carries the main
                    # bg_bias as its LAST row (see the setup above), so
                    # dec_in is that row and the candidates are the rest
                    probs_k = tta_sweep_fwd((qt, state), mel)
                    dec_in = probs_k[-1]
                else:
                    # TTA: decisions from transform-averaged
                    # probabilities (same argmax as plain when tta_fwd is
                    # None — softmax is monotone per (frame, cell))
                    dec_in = (
                        _bias_logits(logits) if tta_fwd is None
                        else tta_fwd((qt, state), mel)
                    )
            # bitmask-native loss + argmax labels: value-identical to the
            # dense one-hot route without materializing (B, T, M, G).
            # Under a mesh the fused kernel runs in shard_map over the
            # data axis (same rule as steps.py). Losses use UNBIASED
            # logits (bg_bias shapes decisions, not the loss).
            total, breakdown = loss_fn.from_bitmask(
                logits, label_mask, example_mask, mesh=mesh,
            )
            # class-major logits (B, T, M, G): per-cell class = argmax
            # over the class axis
            pred_cls = jnp.argmax(dec_in, axis=2).astype(jnp.int8)
            true_cls = _bit_labels(label_mask, num_classes).astype(jnp.int8)
            if sweep is None:
                pred_sw = jnp.zeros((), jnp.int8)
            elif tta_sweep_fwd is not None:
                # per-bias TTA-averaged probs (K, B, T, M, G) -> argmax
                # over the class axis: the sweep scores the decode path
                # in use (last row = main decode, already consumed above)
                pred_sw = jnp.argmax(probs_k[:-1], axis=3).astype(jnp.int8)
            else:
                # one forward, every candidate bias decoded on device
                # (sequential map keeps peak memory at ~one logits copy)
                pred_sw = jax.lax.map(
                    lambda b: jnp.argmax(
                        _bias_logits(logits, b), axis=2
                    ).astype(jnp.int8),
                    sweep,
                )  # (K, B, T, G)
            return {"loss": total, **breakdown}, pred_cls, true_cls, pred_sw

    it = BatchIterator(test_corpus, cfg.train.batch_size, shuffle=False, prefetch=2)
    losses, preds, trues, sweep_rows = [], [], [], []
    for batch in it:
        mel = jnp.asarray(batch.mel)
        mask = jnp.asarray(batch.label_mask)
        acc = jnp.asarray(batch.accdoa) if accdoa_mode else jnp.zeros((), jnp.float32)
        em = (jnp.arange(batch.mel.shape[0]) < batch.n_valid).astype(jnp.float32)
        if mesh is not None:
            from seld_tpu.parallel import batch_sharding

            mel = jax.device_put(mel, batch_sharding(mesh, mel.ndim))
            mask = jax.device_put(mask, batch_sharding(mesh, mask.ndim))
            if accdoa_mode:
                acc = jax.device_put(acc, batch_sharding(mesh, acc.ndim))
            em = jax.device_put(em, batch_sharding(mesh, 1))
        metrics, p, t, psw = infer_step(qtree, state, mel, mask, acc, em)
        losses.append(metrics)
        preds.append(np.asarray(p)[: batch.n_valid])
        trues.append(np.asarray(t)[: batch.n_valid])
        if sweep_values is not None:
            sweep_rows.append(np.asarray(psw)[:, : batch.n_valid])

    keys = losses[0].keys()
    avg = {k: float(np.mean([float(m[k]) for m in losses])) for k in keys}
    pred_classes = np.concatenate(preds, axis=0)  # (N, T, G) int8
    true_classes = np.concatenate(trues, axis=0)

    # median_filter / median_filter_sweep were validated before the
    # forward loop (top of this function)
    raw_pred_classes = pred_classes
    if median_filter > 1:
        pred_classes = smooth_classes(
            pred_classes, median_filter, num_classes
        )
        log.info("Median filter (majority, %d frames) applied to "
                 "prediction grids", median_filter)

    acc = accuracy_metrics(pred_classes, true_classes, cfg.grid.background_class)
    dcase = seld_metrics(
        pred_classes, true_classes, cfg.grid.n_el, cfg.grid.n_az, num_classes
    )
    dcase22 = dcase2022_metrics(
        pred_classes, true_classes, cfg.grid.n_el, cfg.grid.n_az, num_classes
    )
    log.info("Test loss %.6f", avg["loss"])
    log.info(
        "Overall acc %.2f%% | non-bg acc %.2f%% | active %d/%d",
        acc["overall_accuracy"], acc["non_bg_accuracy"],
        acc["active_events"], acc["total_cells"],
    )
    log.info(
        "SELD (frame variant): ER %.3f F %.3f LE %.1f deg LR %.3f",
        dcase["ER"], dcase["F"], dcase["LE"], dcase["LR"],
    )
    log.info(
        "DCASE2022 (official, 1 s segments): ER %.3f F %.3f LE_CD %.1f deg "
        "LR_CD %.3f | SELD_error %.3f",
        dcase22["ER"], dcase22["F_macro"], dcase22["LE_macro"],
        dcase22["LR_macro"], dcase22["SELD_error"],
    )
    log.info(
        "  macro over GT classes only: F %.3f LE_CD %.1f deg LR_CD %.3f | "
        "SELD_error %.3f",
        dcase22["macro_gt"]["F"], dcase22["macro_gt"]["LE"],
        dcase22["macro_gt"]["LR"], dcase22["macro_gt"]["SELD_error"],
    )

    sweep_report = None
    if sweep_values is not None:
        # keys are repr(float) — full precision, so near-identical
        # candidates can never collide into one row. The same report
        # structure serves both sweep kinds (bg_bias for grid models,
        # accdoa_threshold for ACCDOA families).
        flag = ("--bg-bias" if sweep_kind == "bg_bias"
                else "--accdoa-threshold")
        sweep_report = {"metrics": {}}
        for k, b in enumerate(sweep_values):
            pk = np.concatenate([rows[k] for rows in sweep_rows], axis=0)
            mk = dcase2022_metrics(
                pk, true_classes, cfg.grid.n_el, cfg.grid.n_az, num_classes
            )
            row = {key: float(mk[key]) for key in
                   ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error")}
            sweep_report["metrics"][repr(b)] = row
            log.info(
                "  %s %+.2f: ER %.3f F %.3f LE %.1f deg LR %.3f | "
                "SELD_error %.3f", sweep_kind, b, row["ER"], row["F_macro"],
                row["LE_macro"], row["LR_macro"], row["SELD_error"],
            )
        best_b = min(
            sweep_values,
            key=lambda b: sweep_report["metrics"][repr(b)]["SELD_error"],
        )
        sweep_report["best"] = {
            sweep_kind: best_b,
            **sweep_report["metrics"][repr(best_b)],
        }
        log.info(
            "  -> best %s %+.2f (SELD_error %.3f); serve with "
            "`predict %s %g`", sweep_kind, best_b,
            sweep_report["best"]["SELD_error"], flag, best_b,
        )
    mf_report = None
    if median_filter_sweep is not None:
        widths = median_filter_sweep  # validated at entry
        mf_report = {"metrics": {}}
        for w in widths:
            pw = (raw_pred_classes if w <= 1 else
                  smooth_classes(raw_pred_classes, w, num_classes))
            mw = dcase2022_metrics(
                pw, true_classes, cfg.grid.n_el, cfg.grid.n_az, num_classes
            )
            row = {key: float(mw[key]) for key in
                   ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error")}
            mf_report["metrics"][str(w)] = row
            log.info(
                "  median_filter %d: ER %.3f F %.3f LE %.1f deg LR %.3f | "
                "SELD_error %.3f", w, row["ER"], row["F_macro"],
                row["LE_macro"], row["LR_macro"], row["SELD_error"],
            )
        best_w = min(
            widths, key=lambda w: mf_report["metrics"][str(w)]["SELD_error"]
        )
        mf_report["best"] = {
            "median_filter": best_w, **mf_report["metrics"][str(best_w)]
        }
        log.info(
            "  -> best median_filter %d (SELD_error %.3f); serve with "
            "`predict --median-filter %d`", best_w,
            mf_report["best"]["SELD_error"], best_w,
        )

    # Per-class breakdown (classes present in the ground truth).
    from seld_tpu.config import STARSS22_CLASSES

    cw = dcase22["classwise"]
    for c, nref in enumerate(cw["Nref"]):
        if nref > 0:
            log.info(
                "  class %2d %-28s F %.3f LE %6.1f deg LR %.3f (Nref %d)",
                c, STARSS22_CLASSES.get(c, f"class{c}")[:28],
                cw["F"][c], cw["LE"][c], cw["LR"][c], nref,
            )

    # Frames with events (ref trainer.py:615-637, vectorized)
    active_per_frame = (true_classes != cfg.grid.background_class).sum(-1)  # (N, T)
    win_idx, time_idx = np.nonzero(active_per_frame)
    frames_with_events = [
        {"window_idx": int(w), "time_idx": int(t),
         "num_active": int(active_per_frame[w, t])}
        for w, t in zip(win_idx, time_idx)
    ]
    log.info("Found %d frames with active events", len(frames_with_events))

    viz_records = []
    if save_visualizations and frames_with_events and num_visualizations > 0:
        from seld_tpu.viz import visualize_grid_predictions

        rng = random.Random(seed)
        chosen = rng.sample(
            frames_with_events, min(num_visualizations, len(frames_with_events))
        )
        chosen.sort(key=lambda d: d["num_active"], reverse=True)
        viz_dir = Path(cfg.data.output_path) / "test_visualizations"
        viz_dir.mkdir(parents=True, exist_ok=True)

        # second pass: recompute outputs for just the selected windows;
        # ACCDOA outputs decode to class grids first and render as one-hot
        sel_windows = sorted({d["window_idx"] for d in chosen})
        mel_sel, mask_sel = test_corpus.gather(np.asarray(sel_windows))
        from seld_tpu.ops.attention import attention_mesh

        with attention_mesh(mesh):
            # _apply_dec: visualizations reflect the decode rule (incl.
            # bg_bias); still the PLAIN untransformed forward under TTA
            out_sel = np.asarray(
                jax.jit(_apply_dec)(qtree, state, jnp.asarray(mel_sel))
            )
        if accdoa_mode:
            cls_sel = np.asarray(
                plain_decode(jnp.asarray(out_sel), cfg.grid.n_el,
                             cfg.grid.n_az, num_classes, acc_th)
            )  # (N, T, G) int8
            # render as class-major one-hot (N, T, M, G) for the viz
            logits_sel = np.moveaxis(
                np.eye(num_classes, dtype=np.float32)[cls_sel], -1, 2
            )
        else:
            logits_sel = out_sel  # class-major (N, T, M, G)
        dense_sel = np.asarray(
            decode_class_bitmask(jnp.asarray(mask_sel), num_classes,
                                 class_major=True)
        )
        row_of = {w: i for i, w in enumerate(sel_windows)}
        for k, d in enumerate(chosen):
            r, t = row_of[d["window_idx"]], d["time_idx"]
            save_path = viz_dir / (
                f"test_viz_{k + 1}_window{d['window_idx']}_frame{t}.png"
            )
            visualize_grid_predictions(
                dense_sel[r, t], logits_sel[r, t],
                time_frame=t, grid_size=(cfg.grid.n_el, cfg.grid.n_az),
                num_classes=num_classes,
                title_prefix=f"Window {d['window_idx']}, ",
                save_path=save_path,
            )
            viz_records.append({**d, "save_path": str(save_path)})
        log.info("Saved %d prediction visualizations to %s", len(viz_records), viz_dir)

    return {
        "test_loss": avg["loss"],
        **{k: v for k, v in avg.items() if k != "loss"},
        **acc,
        "dcase": dcase,
        "dcase2022": dcase22,
        "num_frames_with_events": len(frames_with_events),
        "visualizations": viz_records,
        "checkpoint_epoch": meta["epoch"],
        "checkpoint_kind": checkpoint_kind,
        "quantized_int8": bool(int8),
        "bg_bias": float(bg_bias),
        **({"accdoa_threshold": acc_th} if accdoa_mode else {}),
        **({"bg_bias_sweep": sweep_report}
           if sweep_report and sweep_kind == "bg_bias" else {}),
        **({"accdoa_threshold_sweep": sweep_report}
           if sweep_report and sweep_kind == "accdoa_threshold" else {}),
        "median_filter": int(median_filter),
        **({"median_filter_sweep": mf_report} if mf_report else {}),
        **({"training_incomplete": training_incomplete}
           if training_incomplete else {}),
    }
