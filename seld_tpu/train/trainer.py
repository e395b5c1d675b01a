"""Training loop: the host-side orchestration around the jitted step.

Behavioral parity with ref trainer.py:23-392:
  * model dispatch from config, CE class weights (background 0.05),
    Adam(lr=1e-3, L2 wd=1e-4), ReduceLROnPlateau(0.5/5) on test loss,
    early stopping on train loss (patience 20, min_delta 1e-4),
    best checkpoint on test loss, rolling checkpoint every 5 epochs
    keeping 3, loss-curve artifact, best-weights reload, history dump.

TPU re-design:
  * one jitted train step (forward+loss+backward+update fused); metrics
    stay on device until the epoch summary — no per-step .item() syncs
    (ref trainer.py:182 syncs every step);
  * optional (data, model) mesh: batches shard over "data", wide layers
    over "model" (seld_tpu.parallel); XLA inserts the collectives;
  * resume from the latest rolling checkpoint (the reference never
    resumes); no CUDA cache hygiene needed (XLA arena allocator).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config
from seld_tpu.data.corpus import WindowedCorpus
from seld_tpu.data.sampler import BatchIterator
from seld_tpu.losses import SELDLossFn
from seld_tpu.models import build_model
from seld_tpu.parallel.sharding import (
    batch_sharding,
    shard_variables,
    state_shardings,
)
from seld_tpu.train.checkpoint import CheckpointManager
from seld_tpu.train.optimizer import (
    current_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from seld_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau
from seld_tpu.train.state import create_train_state, param_count
from seld_tpu.train.steps import make_eval_step, make_train_step
from seld_tpu.utils.logging import get_logger


class PreemptionGuard:
    """SIGTERM-aware graceful shutdown (TPU-VM/GCE preemption sends
    SIGTERM with a ~30 s grace window; the reference's only recovery is a
    manual restart from epoch 1, ref trainer.py:151). While installed,
    SIGTERM sets a flag that the epoch loop polls; training checkpoints
    and exits cleanly instead of dying mid-step, and a later run with
    resume=True continues from that checkpoint."""

    def __init__(self):
        self.requested = False
        self._prev = None

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        import signal

        try:
            self._prev = signal.signal(signal.SIGTERM, self._handler)
        except ValueError:  # not the main thread — poll-only, never fires
            self._prev = None
        return self

    def __exit__(self, *exc):
        import signal

        if self._prev is not None:
            signal.signal(signal.SIGTERM, self._prev)
        return False


def _device_batch(batch, mesh, use_accdoa: bool = False,
                  time_sharded: bool = False):
    mel = np.asarray(batch.mel)
    targets = np.asarray(batch.accdoa if use_accdoa else batch.label_mask)
    em = (np.arange(mel.shape[0]) < batch.n_valid).astype(np.float32)
    if mesh is not None:
        from seld_tpu.parallel.multihost import device_batch, process_local_indices

        if jax.process_count() > 1:
            # Every process builds the SAME global batch (BatchIterator's
            # shuffle is seed-deterministic), then contributes only its
            # slice of the rows — without this, each host would feed the
            # full batch and make_array_from_process_local_data would
            # duplicate every example n_proc times.
            assert mel.shape[0] % jax.process_count() == 0, (
                f"batch {mel.shape[0]} not divisible by "
                f"{jax.process_count()} processes"
            )
            idx = process_local_indices(mel.shape[0])
            mel, targets, em = mel[idx], targets[idx], em[idx]
        mel, targets, em = device_batch(mesh, mel, targets, em,
                                        time_sharded=time_sharded)
        return mel, targets, em
    return jnp.asarray(mel), jnp.asarray(targets), jnp.asarray(em)


def _epoch_mean(metric_list):
    """Average per-batch scalars — one device sync per epoch."""
    keys = metric_list[0].keys()
    stacked = {k: jnp.stack([m[k] for m in metric_list]) for k in keys}
    return {k: float(jnp.mean(v)) for k, v in stacked.items()}


def _replay_schedules(workdir, start_epoch: int, plateau, stopper, log):
    """Rebuild the host-side schedule state (plateau LR decay + early-stop
    patience) for a resumed run by replaying the completed epochs'
    metrics.jsonl loss records through the same step functions. Without
    this a resume restarts both schedules — most visibly, the first
    epoch-end plateau step would rewrite a previously REDUCED learning
    rate back up to the initial value. Duplicate epoch numbers keep the
    LAST record (a run resumed after mid-epoch preemption re-trains and
    re-appends the epochs past its rolling checkpoint). Returns the
    minimum replayed test loss, or None if nothing replayed."""
    path = Path(workdir) / "metrics.jsonl"
    if not path.exists():
        return None
    by_epoch: dict[int, tuple[float, float]] = {}
    for line in path.read_text().splitlines():
        try:
            rec = json.loads(line)
            by_epoch[int(rec["epoch"])] = (
                float(rec["train"]["loss"]), float(rec["test"]["loss"]),
            )
        except (ValueError, KeyError, TypeError):
            continue  # tolerate hand-edited/truncated lines
    replayed = [e for e in sorted(by_epoch) if e < start_epoch]
    for e in replayed:
        train_loss, test_loss = by_epoch[e]
        plateau.step(test_loss)
        stopper.step(train_loss, e)
    if not replayed:
        return None
    log.info(
        "Resume: replayed %d epoch records through the schedules "
        "(plateau lr %.6f, early-stop best %.6f @ epoch %d, "
        "%d epochs without improvement)",
        len(replayed), plateau.lr, stopper.best, stopper.best_epoch,
        stopper.epochs_without_improvement,
    )
    return min(by_epoch[e][1] for e in replayed)


def train_model(
    cfg: Config,
    train_corpus: WindowedCorpus,
    test_corpus: WindowedCorpus,
    mesh=None,
    workdir: str | Path | None = None,
    resume: bool = False,
):
    """Train per config; returns (state, history)."""
    log = get_logger()
    workdir = Path(workdir if workdir is not None else cfg.data.checkpoint_path)
    workdir.mkdir(parents=True, exist_ok=True)

    from seld_tpu.models.registry import ACCDOA_MODELS

    accdoa_mode = cfg.model.model_type in ACCDOA_MODELS
    model = build_model(cfg.model, cfg.grid)
    if accdoa_mode:
        from seld_tpu.accdoa import ACCDOALossFn, ADPITLossFn
        from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

        assert train_corpus.accdoa is not None and test_corpus.accdoa is not None, (
            "ACCDOA models need corpora built with targets.accdoa=true"
        )
        loss_fn = (
            ADPITLossFn()
            if cfg.model.model_type in MULTI_ACCDOA_MODELS else ACCDOALossFn()
        )
        target_decoder = lambda t: t  # vectors pass straight to the loss
    else:
        loss_fn = SELDLossFn(cfg.loss, cfg.grid)
        target_decoder = None
    optimizer = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)

    win = train_corpus.window_frames
    # feature channels come from the corpus (4 for "mel", 7/10 for the
    # spatial feature sets)
    n_feat_ch = train_corpus.mel.shape[1]
    sample = jnp.zeros(
        (cfg.train.batch_size, win, n_feat_ch, cfg.model.n_mels), jnp.float32
    )
    # rbg dropout stream: 22% faster train step than threefry on v5e
    # (see TrainConfig.prng_impl)
    rng = jax.random.key(cfg.train.seed, impl=cfg.train.prng_impl)
    state = create_train_state(model, optimizer, rng, sample)
    out_state_shardings = None
    if mesh is not None:
        zero = cfg.mesh.shard_opt_state
        fsdp = cfg.mesh.shard_params
        if cfg.mesh.shard_time and cfg.model.model_type == "crnn":
            raise ValueError(
                "mesh.shard_time is unsupported for the recurrent crnn "
                "(the GRU scans time sequentially); use conformer / "
                "resnet_conformer / cnn, or disable time sharding"
            )
        if cfg.mesh.shard_time and win % mesh.shape["model"] != 0:
            raise ValueError(
                f"mesh.shard_time: window_frames={win} must divide by "
                f"the model mesh axis ({mesh.shape['model']}) — pick a "
                "window length or mesh shape that divides evenly"
            )
        use_tp = not cfg.mesh.shard_time
        state = shard_variables(state, mesh, zero_opt_state=zero,
                                shard_params=fsdp, use_tp_rules=use_tp)
        out_state_shardings = state_shardings(state, mesh, zero_opt_state=zero,
                                              shard_params=fsdp,
                                              use_tp_rules=use_tp)
        if cfg.mesh.shard_time:
            log.info(
                "Sequence parallelism: time axis sharded over the "
                "model mesh axis (%d-way); TP weight rules disabled",
                mesh.shape["model"],
            )

    log.info("Model %s: %s parameters", cfg.model.model_type, f"{param_count(state):,}")
    log.info(
        "Optimizer: Adam(lr=%g, L2 wd=%g); plateau factor=%g patience=%d; "
        "early stop patience=%d min_delta=%g",
        cfg.train.learning_rate, cfg.train.weight_decay,
        cfg.train.lr_decay_factor, cfg.train.lr_decay_patience,
        cfg.train.patience, cfg.train.min_delta,
    )

    n_proc = jax.process_count()

    def global_flag(local: bool) -> bool:
        """Collective any() of a per-host bool. Every process MUST call
        this at the same program point (it is an allgather); identity in
        single-process runs."""
        if n_proc == 1:
            return bool(local)
        from jax.experimental import multihost_utils

        return bool(np.any(multihost_utils.process_allgather(
            np.asarray([local], np.int32), tiled=True)))

    if not resume:
        # Fresh training must start from a clean checkpoint tree: orbax
        # silently SKIPS saving a step number that already exists, so a
        # rerun into the same workdir would keep stale (possibly
        # different-architecture) checkpoints and reload them as "best".
        # The reference overwrites its .pth files (ref trainer.py:277-308);
        # match that semantic. Under multi-host only process 0 touches the
        # shared tree (a per-host rmtree would race), and everyone
        # barriers before the CheckpointManager opens it.
        import shutil

        if jax.process_index() == 0:
            for sub in ("best", "rolling"):
                d = workdir / sub
                if d.exists():
                    shutil.rmtree(d)
                    log.info("Cleared previous %s checkpoints (fresh run)", sub)
            # metrics.jsonl is opened in append mode by the epoch loop; a
            # fresh run must not inherit a previous run's records (they
            # would poison both resume's schedule replay and any consumer
            # reading the file whole).
            stale = workdir / "metrics.jsonl"
            if stale.exists():
                stale.unlink()
                log.info("Cleared previous metrics.jsonl (fresh run)")
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("seld_tpu:ckpt_clear")

    ckpt = CheckpointManager(workdir, cfg)
    start_epoch = 1
    resume_best_meta = None
    resumed_lr = None
    if resume:
        # The best-so-far baseline comes from the best checkpoint's meta
        # whenever one exists — even with no rolling checkpoint to resume
        # the weights from (otherwise the restarted run's first epoch
        # would overwrite the stored best).
        resume_best_meta = ckpt.best_meta()
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, meta = restored
            start_epoch = meta["epoch"] + 1
            # ground truth for the plateau scheduler's current LR: the
            # restored optimizer state (exact even if metrics.jsonl is
            # missing or was replayed under different cfg semantics)
            resumed_lr = float(current_learning_rate(state.opt_state))
            log.info("Resumed from rolling checkpoint at epoch %d", meta["epoch"])
        elif resume_best_meta is not None:
            log.warning(
                "Resume: no rolling checkpoint under %s — restarting "
                "training from scratch, but keeping the stored best "
                "checkpoint (epoch %d) as the improvement baseline",
                workdir, resume_best_meta.get("epoch", -1),
            )

    # Parameter EMA (train.ema_decay > 0): shadow weights updated after
    # every step; the EMA weights are what eval sees and what the BEST
    # checkpoint stores (the serving artifact). Rolling checkpoints keep
    # raw weights so resume is exact; EMA restarts from the restored
    # params (documented in TrainConfig).
    ema_decay = cfg.train.ema_decay
    # jnp.copy: the live state's buffers get DONATED into the first train
    # step; the EMA shadow must own its storage.
    ema_params = (
        jax.tree_util.tree_map(jnp.copy, state.params) if ema_decay > 0 else None
    )
    if ema_decay > 0:
        log.info("Parameter EMA on (decay %.4f); eval/best use EMA weights",
                 ema_decay)
        # donate the old shadow: no second full-parameter copy per step
        ema_update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: a * ema_decay + b.astype(a.dtype) * (1 - ema_decay),
                e, p,
            ),
            donate_argnums=(0,),
        )

    def eval_state():
        return state if ema_params is None else state.replace(params=ema_params)

    from seld_tpu.features.specaugment import make_spec_augment

    input_augment = make_spec_augment(cfg.train)
    if input_augment is not None:
        log.info(
            "SpecAugment on: %d time masks (w<=%d frames), %d freq masks "
            "(w<=%d bins)",
            cfg.train.specaugment_time_masks, cfg.train.specaugment_time_width,
            cfg.train.specaugment_freq_masks, cfg.train.specaugment_freq_width,
        )
    spatial_augment = None
    if cfg.train.acs_augment:
        # both constructors raise a named error unless feature_set
        # carries signed direction information (mel_iv)
        if accdoa_mode:
            from seld_tpu.features.acs import make_acs_augment_accdoa
            from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

            spatial_augment = make_acs_augment_accdoa(
                cfg.features.feature_set,
                multi=cfg.model.model_type in MULTI_ACCDOA_MODELS,
            )
        else:
            from seld_tpu.features.acs import make_acs_augment

            spatial_augment = make_acs_augment(
                cfg.grid.n_el, cfg.grid.n_az, cfg.features.feature_set
            )
        log.info(
            "ACS spatial augmentation on: per-sample draw from the 16 "
            "FOA scene transforms (features + %s)",
            "ACCDOA vectors" if accdoa_mode else "grid labels",
        )
    if cfg.train.accum_steps > 1:
        if cfg.train.batch_size % cfg.train.accum_steps != 0:
            raise ValueError(
                f"train.batch_size={cfg.train.batch_size} must divide by "
                f"train.accum_steps={cfg.train.accum_steps}"
            )
        log.info(
            "Gradient accumulation: %d microbatches of %d",
            cfg.train.accum_steps,
            cfg.train.batch_size // cfg.train.accum_steps,
        )
    if cfg.train.qat:
        log.info(
            "Quantization-aware training: int8 fake-quant with "
            "straight-through gradients on the PTQ layer set"
        )
    distill_spec = None
    teacher_vars = None
    if cfg.train.distill_ckpt:
        from seld_tpu.distill import load_teacher

        if not 0.0 <= cfg.train.distill_alpha <= 1.0:
            raise ValueError(
                f"train.distill_alpha must be in [0, 1], got "
                f"{cfg.train.distill_alpha}"
            )
        if cfg.train.distill_temperature <= 0.0:
            raise ValueError(
                f"train.distill_temperature must be > 0 (it divides the "
                f"logits inside the KD loss), got "
                f"{cfg.train.distill_temperature}"
            )
        distill_spec, teacher_vars, t_meta = load_teacher(
            cfg, cfg.train.distill_ckpt, win, n_feat_ch
        )
        log.info(
            "Distillation: teacher %s (epoch %d, %s params) -> student %s; "
            "alpha=%g temperature=%g",
            t_meta.get("config", {}).get("model", {}).get(
                "model_type", "?"),
            t_meta.get("epoch", -1),
            f"{sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(teacher_vars)):,}",
            cfg.model.model_type,
            cfg.train.distill_alpha, cfg.train.distill_temperature,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # the teacher is replicated across the mesh; GSPMD treats
            # its forward like any other replicated-weight compute
            teacher_vars = jax.device_put(
                teacher_vars, NamedSharding(mesh, PartitionSpec())
            )
    train_step = make_train_step(
        model, loss_fn, optimizer, cfg.grid.num_classes,
        out_state_shardings=out_state_shardings, target_decoder=target_decoder,
        input_augment=input_augment, spatial_augment=spatial_augment,
        accum_steps=cfg.train.accum_steps, qat=cfg.train.qat,
        time_sharded=(mesh is not None and cfg.mesh.shard_time),
        distill=distill_spec,
    )
    if distill_spec is not None:
        # teacher weights ride along as jit ARGUMENTS on every call
        # (constant-folding a 60M-param tree into the HLO blows up
        # remote compiles — the seld_tpu.quant rule)
        _raw_train_step = train_step
        train_step = lambda s, b_mel, b_mask, b_em, r: _raw_train_step(
            s, b_mel, b_mask, b_em, r, teacher_vars
        )
    eval_step = make_eval_step(
        model, loss_fn, cfg.grid.num_classes, target_decoder=target_decoder,
        mesh=mesh, time_sharded=(mesh is not None and cfg.mesh.shard_time),
    )

    # Validation-metric checkpoint selection (train.select_metric): the
    # per-epoch eval pass additionally decodes prediction + ground-truth
    # class grids on device, and the BEST checkpoint is chosen on an
    # official DCASE2022 metric instead of the test loss (the criterion
    # SELD practitioners actually tune for). Early stopping and LR
    # plateau keep their reference semantics (train/test loss).
    _SELECT_METRICS = {  # name -> (dcase2022_metrics key, sign: +1 lower-better)
        "seld_error": ("SELD_error", 1.0),
        "er": ("ER", 1.0),
        "f_macro": ("F_macro", -1.0),
    }
    select = cfg.train.select_metric
    metric_step = None
    if select != "loss":
        if select not in _SELECT_METRICS:
            raise ValueError(
                f"train.select_metric must be one of "
                f"{['loss', *_SELECT_METRICS]}, got {select!r}"
            )
        if n_proc > 1:
            raise ValueError(
                "train.select_metric != 'loss' is single-process only "
                "(per-epoch metric grids are gathered on the host)"
            )
        from seld_tpu.train.steps import make_metric_eval_step

        grid_decoder = None
        if accdoa_mode:
            from seld_tpu.accdoa import (
                decode_accdoa_to_grid_jnp,
                decode_multi_accdoa_to_grid_jnp,
            )
            from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

            _dec = (
                decode_multi_accdoa_to_grid_jnp
                if cfg.model.model_type in MULTI_ACCDOA_MODELS
                else decode_accdoa_to_grid_jnp
            )
            grid_decoder = lambda out: _dec(
                out, cfg.grid.n_el, cfg.grid.n_az, cfg.grid.num_classes
            )
        metric_step = make_metric_eval_step(
            model, loss_fn, cfg.grid.num_classes, grid_decoder=grid_decoder,
            target_decoder=target_decoder, mesh=mesh,
            time_sharded=(mesh is not None and cfg.mesh.shard_time),
        )
        log.info(
            "Best-checkpoint selection on DCASE2022 %s (computed every "
            "epoch from decoded grids)", select,
        )

    plateau = ReduceLROnPlateau(
        lr=cfg.train.learning_rate,
        factor=cfg.train.lr_decay_factor,
        patience=cfg.train.lr_decay_patience,
    )
    cosine = None
    if cfg.train.lr_schedule == "cosine":
        from seld_tpu.train.schedule import WarmupCosine

        steps_per_epoch = max(
            -(-len(train_corpus) // cfg.train.batch_size), 1
        )
        cosine = WarmupCosine(
            peak=cfg.train.learning_rate,
            total_steps=steps_per_epoch * cfg.train.num_epochs,
            warmup_steps=cfg.train.warmup_steps,
            final_scale=cfg.train.cosine_final_scale,
        )
        log.info(
            "LR schedule: warmup %d steps -> cosine over %d steps "
            "(plateau rewrites disabled)",
            cfg.train.warmup_steps, cosine.total_steps,
        )
    elif cfg.train.lr_schedule != "plateau":
        raise ValueError(
            f"train.lr_schedule must be 'plateau' or 'cosine', "
            f"got {cfg.train.lr_schedule!r}"
        )
    stopper = EarlyStopping(patience=cfg.train.patience, min_delta=cfg.train.min_delta)
    replayed_min_test = None
    if start_epoch > 1:
        replayed_min_test = _replay_schedules(
            workdir, start_epoch, plateau, stopper, log
        )
        if resumed_lr is not None:
            # the restored optimizer state is the ground truth for the
            # current LR (covers a missing/partial metrics.jsonl; within
            # f32 tolerance of the replayed value otherwise)
            plateau.lr = resumed_lr

    train_iter = BatchIterator(
        train_corpus, cfg.train.batch_size, shuffle=True,
        seed=cfg.data.shuffle_seed, prefetch=cfg.data.prefetch_depth,
    )
    test_iter = BatchIterator(
        test_corpus, cfg.train.batch_size, shuffle=False,
        prefetch=cfg.data.prefetch_depth,
    )

    # Device-side double buffering: batches are placed (async H2D)
    # `place_depth` ahead of consumption so the next batch's transfer
    # overlaps the current step's compute (the host-side half is
    # BatchIterator's staging thread). Shared by the train + eval loops.
    from seld_tpu.data.sampler import device_prefetch

    place_batch = lambda b: _device_batch(
        b, mesh, accdoa_mode, time_sharded=cfg.mesh.shard_time
    )
    place_depth = cfg.data.prefetch_depth

    def place_eval_batch(b):
        """place_batch plus the uint16 label bitmask (metric selection
        decodes ground-truth grids on device). For grid losses the loss
        targets already ARE the bitmask — reuse the placed array."""
        mel, targets, em = place_batch(b)
        if not accdoa_mode:
            return mel, targets, em, targets
        lm = jnp.asarray(np.asarray(b.label_mask))
        if mesh is not None:
            lm = jax.device_put(lm, batch_sharding(mesh, lm.ndim))
        return mel, targets, em, lm

    history = {"train_losses": [], "test_losses": [], "lr": []}
    if metric_step is not None:
        history["val_metric"] = []
    # A resumed run continues the best-so-far bookkeeping from the stored
    # best checkpoint — otherwise the first post-resume epoch would
    # always overwrite the best checkpoint, even when it is worse.
    best_select = float("inf")
    best_test = float("inf")
    if resume_best_meta is not None:
        best_test = float(resume_best_meta.get("test_loss", float("inf")))
        if replayed_min_test is not None:
            # under select_metric the best checkpoint's test_loss is the
            # metric-best epoch's, not the historical minimum — take the
            # replayed minimum so best_test_loss reporting stays exact
            best_test = min(best_test, replayed_min_test)
        log.info("Resume: best test loss so far %.6f (best epoch %d)",
                 best_test, resume_best_meta.get("epoch", -1))
        sel = resume_best_meta.get("select")
        if metric_step is not None:
            if sel and sel.get("metric") == select:
                best_select = _SELECT_METRICS[select][1] * float(sel["value"])
                history["best_val_metric"] = float(sel["value"])
                history["best_val_epoch"] = int(resume_best_meta["epoch"])
                log.info("Resume: best %s so far %.4f", select, sel["value"])
            else:
                log.warning(
                    "Resume: stored best checkpoint has no %s record "
                    "(saved %s) — the first post-resume improvement "
                    "re-baselines the best checkpoint",
                    select, (sel or {}).get("metric", "by test loss"),
                )
    epoch = start_epoch - 1

    profiling = cfg.train.profile_steps > 0
    trace_started = False

    preempt = PreemptionGuard()
    with preempt:
        for epoch in range(start_epoch, cfg.train.num_epochs + 1):
            t0 = time.time()
            step_rng = jax.random.fold_in(rng, epoch)

            train_metrics = []
            for i, (mel, mask, em) in enumerate(
                device_prefetch(train_iter, place_batch, depth=place_depth)
            ):
                if profiling and epoch == start_epoch and i == 1:
                    profile_dir = str(Path(cfg.data.output_path) / "profile")
                    jax.profiler.start_trace(profile_dir)
                    trace_started = True
                    log.info("profiler trace started -> %s", profile_dir)
                if cosine is not None:
                    state = state.replace(opt_state=set_learning_rate(
                        state.opt_state,
                        cosine((epoch - 1) * steps_per_epoch + i),
                    ))
                state, metrics = train_step(state, mel, mask, em, step_rng)
                if ema_params is not None:
                    ema_params = ema_update(ema_params, state.params)
                train_metrics.append(metrics)
                # Preemption poll. Under multi-host the SIGTERM may land on
                # only some hosts; breaking on a local flag would leave the
                # others blocked in the next step's collectives (and the
                # checkpoint save is itself collective). The decision is
                # made collective via global_flag — called at the same
                # program point on every host (every 8th step to keep the
                # host sync off the async-dispatch fast path).
                if (n_proc == 1 or i % 8 == 7) and global_flag(preempt.requested):
                    preempt.requested = True
                    if trace_started:  # finalize an in-flight trace
                        jax.profiler.stop_trace()
                        profiling = False
                        trace_started = False
                    break  # finish-up handled after the loop
                if profiling and trace_started and i == cfg.train.profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    trace_started = False
                    log.info("profiler trace captured (%d steps)", cfg.train.profile_steps)
            train_avg = _epoch_mean(train_metrics)

            # Graceful preemption (SIGTERM): checkpoint and exit inside the
            # grace window; `--resume` continues from here. The partially
            # trained epoch is checkpointed as-is (its remaining batches are
            # re-seen next run via the per-epoch shuffle). Re-synced here so
            # a SIGTERM landing after the last in-loop poll still yields one
            # collective decision.
            preempt.requested = global_flag(preempt.requested)
            if preempt.requested:
                log.warning(
                    "SIGTERM received — saving preemption checkpoint at "
                    "epoch %d and exiting cleanly", epoch,
                )
                ckpt.save_rolling(epoch, state, train_avg["loss"], float("inf"))
                ckpt.wait()
                history["preempted_epoch"] = epoch
                break

            # Failure detection (SURVEY §5: the reference has none — its only
            # recovery is manual restart from epoch 1): a non-finite training
            # loss aborts with an emergency checkpoint for post-mortem/resume.
            if not np.isfinite(train_avg["loss"]):
                log.error(
                    "Non-finite train loss %.6f at epoch %d — saving emergency "
                    "checkpoint and aborting", train_avg["loss"], epoch,
                )
                ckpt.save_rolling(epoch, state, train_avg["loss"], float("inf"))
                ckpt.wait()
                history["aborted_epoch"] = epoch
                break

            eval_metrics = []
            val22 = None
            if metric_step is None:
                for mel, mask, em in device_prefetch(
                    test_iter, place_batch, depth=place_depth
                ):
                    eval_metrics.append(eval_step(eval_state(), mel, mask, em))
            else:
                preds, trues = [], []
                for mel, mask, em, lm in device_prefetch(
                    test_iter, place_eval_batch, depth=place_depth
                ):
                    m, p, t = metric_step(eval_state(), mel, mask, em, lm)
                    eval_metrics.append(m)
                    nv = int(np.asarray(em).sum())  # valid rows (tail pad)
                    preds.append(np.asarray(p)[:nv])
                    trues.append(np.asarray(t)[:nv])
                from seld_tpu.eval.metrics import dcase2022_metrics

                val22 = dcase2022_metrics(
                    np.concatenate(preds, axis=0),
                    np.concatenate(trues, axis=0),
                    cfg.grid.n_el, cfg.grid.n_az, cfg.grid.num_classes,
                )
            test_avg = _epoch_mean(eval_metrics)

            if cosine is not None:
                # the cosine schedule owns the LR (injected per step);
                # plateau tracking is bypassed
                new_lr = current_learning_rate(state.opt_state)
            else:
                new_lr = plateau.step(test_avg["loss"])
                old_lr = current_learning_rate(state.opt_state)
                # tolerance: the stored LR is float32 (relative error
                # ~6e-8); exact != fires every epoch (f32(1e-3) != 1e-3)
                # and rewrites the opt state with a misleading "reduced"
                # log. Real plateau reductions are x0.5.
                if abs(new_lr - old_lr) > 1e-6 * max(abs(new_lr), abs(old_lr), 1e-30):
                    state = state.replace(
                        opt_state=set_learning_rate(state.opt_state, new_lr)
                    )
                    log.info("  Learning rate reduced: %.6f -> %.6f",
                             old_lr, new_lr)

            history["train_losses"].append(train_avg["loss"])
            history["test_losses"].append(test_avg["loss"])
            history["lr"].append(new_lr)

            # Machine-readable epoch record (observability beyond the
            # reference's text logs, SURVEY §5).
            record = {
                "epoch": epoch,
                "seconds": round(time.time() - t0, 2),
                "lr": new_lr,
                "train": train_avg,
                "test": test_avg,
            }
            if val22 is not None:
                record["val_dcase2022"] = {
                    k: float(val22[k])
                    for k in ("ER", "F_macro", "LE_macro", "LR_macro",
                              "SELD_error")
                }
            with (workdir / "metrics.jsonl").open("a") as fh:
                fh.write(json.dumps(record) + "\n")

            log.info(
                "Epoch %d/%d - %.1fs | train %.6f | test %.6f | lr %.6f",
                epoch, cfg.train.num_epochs, time.time() - t0,
                train_avg["loss"], test_avg["loss"], new_lr,
            )
            for k in train_avg:
                if k == "loss":
                    continue
                if k in test_avg:
                    log.info("    %s: train %.6f test %.6f", k, train_avg[k], test_avg[k])
                else:
                    # train-only terms (e.g. the distillation kd/hard split)
                    log.info("    %s: train %.6f", k, train_avg[k])

            if metric_step is None:
                if test_avg["loss"] < best_test - cfg.train.min_delta:
                    best_test = test_avg["loss"]
                    ckpt.save_best(
                        epoch, eval_state(), train_avg["loss"], test_avg["loss"]
                    )
                    log.info("  New best model saved (test loss %.6f)", best_test)
            else:
                key, sign = _SELECT_METRICS[select]
                val = float(val22[key])
                log.info(
                    "  DCASE2022 val: ER %.3f F %.3f LE %.1f deg LR %.3f | "
                    "SELD_error %.3f",
                    val22["ER"], val22["F_macro"], val22["LE_macro"],
                    val22["LR_macro"], val22["SELD_error"],
                )
                history["val_metric"].append(val)
                best_test = min(best_test, test_avg["loss"])
                if sign * val < best_select:
                    best_select = sign * val
                    history["best_val_metric"] = val
                    history["best_val_epoch"] = epoch
                    ckpt.save_best(
                        epoch, eval_state(), train_avg["loss"],
                        test_avg["loss"], select={"metric": select, "value": val},
                    )
                    log.info("  New best model saved (%s %.4f)", select, val)

            if epoch % cfg.train.save_every_n_epochs == 0:
                ckpt.save_rolling(epoch, state, train_avg["loss"], test_avg["loss"])
                log.info("  Rolling checkpoint saved (epoch %d)", epoch)

            viz_every = cfg.train.viz_loss_components_every
            if viz_every > 0 and epoch % viz_every == 0:
                try:
                    from seld_tpu.targets.rasterize import decode_class_bitmask
                    from seld_tpu.viz import visualize_loss_components

                    batch = next(iter(
                        BatchIterator(test_corpus, cfg.train.batch_size,
                                      shuffle=False, prefetch=0)
                    ))
                    mel = jnp.asarray(batch.mel)
                    logits = jax.jit(
                        lambda s, x: model.apply(s.variables(), x, train=False)
                    )(eval_state(), mel)
                    targets = decode_class_bitmask(
                        jnp.asarray(batch.label_mask), cfg.grid.num_classes,
                        class_major=True,
                    )
                    visualize_loss_components(
                        logits, targets,
                        n_el=cfg.grid.n_el, n_az=cfg.grid.n_az,
                        frame_idx=None,  # auto-pick busiest frame (ref :44-62)
                        epoch=epoch,
                        save_dir=Path(cfg.data.output_path) / "train_visualizations",
                    )
                    log.info("  Loss-component dashboard rendered (epoch %d)", epoch)
                except Exception as e:
                    log.warning("  loss-component viz failed: %s", e)

            if stopper.step(train_avg["loss"], epoch):
                log.info(
                    "EARLY STOPPING at epoch %d (no train improvement for %d epochs; "
                    "best train %.6f @ epoch %d)",
                    epoch, stopper.patience, stopper.best, stopper.best_epoch,
                )
                break

    ckpt.wait()

    history.update(
        best_train_loss=stopper.best,
        best_test_loss=best_test,
        best_epoch=stopper.best_epoch,
        total_epochs=epoch,
    )

    # Loss-curve artifact (ref trainer.py:359-361).
    try:
        from seld_tpu.viz import plot_loss_curves

        out_dir = Path(cfg.data.output_path)
        out_dir.mkdir(parents=True, exist_ok=True)
        plot_loss_curves(
            history["train_losses"], history["test_losses"],
            save_path=out_dir / "loss_curves.png",
        )
    except Exception as e:  # viz is best-effort, never kills training
        log.warning("loss-curve plot failed: %s", e)

    # Reload best weights (ref trainer.py:363-366).
    restored = ckpt.restore_best(state)
    if restored is not None:
        state, meta = restored
        log.info("Best model loaded from epoch %d", meta["epoch"])

    hist_path = workdir / "training_history.json"
    hist_path.write_text(json.dumps(history, indent=2))
    log.info("Training history saved to %s", hist_path)
    ckpt.close()
    return state, history
