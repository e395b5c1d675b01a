"""Training runtime tests: schedules, one jitted step, an end-to-end smoke
train with checkpoints + resume (the pytest upgrade of the reference's
notebook 2-epoch quick test, ref SMR_SELD_2.ipynb cell 37)."""

import numpy as np
import pytest

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau


def tiny_config(tmp_path, **extra):
    over = [
        "model.model_type=crnn",
        "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16",
        "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=2",
        "train.num_epochs=2",
        "train.save_every_n_epochs=1",
        f"data.base_path={tmp_path}",
    ] + [f"{k}={v}" for k, v in extra.items()]
    return parse_overrides(Config(), over)


def test_plateau_scheduler_torch_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    assert s.step(1.0) == 1.0  # first metric becomes best
    assert s.step(0.5) == 1.0  # improvement
    # 3 bad epochs (patience 2) -> reduce on the 3rd
    assert s.step(0.5) == 1.0
    assert s.step(0.5) == 1.0
    assert s.step(0.5) == 0.5
    # relative threshold: 1e-4 improvement required
    s2 = ReduceLROnPlateau(lr=1.0, factor=0.1, patience=0)
    s2.step(100.0)
    assert s2.step(99.999) == pytest.approx(0.1)  # not enough improvement


def test_early_stopping_semantics():
    e = EarlyStopping(patience=2, min_delta=0.1)
    assert not e.step(1.0, 1)
    assert not e.step(0.85, 2)  # improved by 0.15 > 0.1
    assert not e.step(0.80, 3)  # only 0.05 -> bad epoch 1
    assert e.step(0.79, 4)  # bad epoch 2 -> stop
    assert e.best == pytest.approx(0.85)
    assert e.best_epoch == 2


def test_injected_learning_rate_rewrite():
    import jax.numpy as jnp
    import numpy as np

    from seld_tpu.train import (
        current_learning_rate,
        make_optimizer,
        set_learning_rate,
    )

    params = {"w": jnp.ones((4, 4))}
    opt = make_optimizer(1e-3, weight_decay=0.0)
    opt_state = opt.init(params)
    assert current_learning_rate(opt_state) == pytest.approx(1e-3)

    grads = {"w": jnp.ones((4, 4))}
    opt_state0 = set_learning_rate(opt_state, 0.0)
    updates, _ = opt.update(grads, opt_state0, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)

    opt_state2 = set_learning_rate(opt_state, 0.5)
    updates2, _ = opt.update(grads, opt_state2, params)
    assert float(jnp.abs(updates2["w"]).max()) > 0.0
    assert current_learning_rate(opt_state2) == pytest.approx(0.5)


def test_single_train_step_reduces_loss(tmp_path):
    import jax
    import jax.numpy as jnp

    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    cfg = tiny_config(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel, mask = corpus.gather(np.arange(2))
    mel, mask = jnp.asarray(mel), jnp.asarray(mask)
    em = jnp.ones((2,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)

    train_step = make_train_step(model, loss_fn, opt, cfg.grid.num_classes, donate=False)
    eval_step = make_eval_step(model, loss_fn, cfg.grid.num_classes)
    before = float(eval_step(state, mel, mask, em)["loss"])
    for _ in range(5):
        state, metrics = train_step(state, mel, mask, em, jax.random.PRNGKey(1))
    after = float(eval_step(state, mel, mask, em)["loss"])
    assert np.isfinite(before) and np.isfinite(after)
    assert after < before
    assert int(state.step) == 5


def test_loss_component_viz_hook(tmp_path):
    # gaussian-monolith behavior: dashboard every N epochs
    # (ref smrl_seld_gaussian.py:1629-1650)
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)
    cfg = cfg.replace_path("train.viz_loss_components_every", 1)
    cfg = cfg.replace_path("train.num_epochs", 1)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    viz_dir = tmp_path / "outputs" / "train_visualizations"
    assert any(viz_dir.glob("loss_components_*.png"))


def test_ce_mode_trainer_smoke(tmp_path):
    # the legacy-monolith CE configuration end to end (ref smrl_seld.py
    # mode: plain CE with background down-weighting)
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)
    cfg = cfg.replace_path("loss.loss_type", "ce")
    cfg = cfg.replace_path("train.num_epochs", 1)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    _, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(history["train_losses"][0])


def test_training_is_deterministic(tmp_path):
    # same seed -> bitwise-identical epoch losses; different seed differs
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path).replace_path("train.num_epochs", 1)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    _, h1 = train_model(cfg, train_c, test_c, workdir=tmp_path / "a")
    _, h2 = train_model(cfg, train_c, test_c, workdir=tmp_path / "b")
    assert h1["train_losses"] == h2["train_losses"]
    cfg3 = cfg.replace_path("train.seed", 99)
    _, h3 = train_model(cfg3, train_c, test_c, workdir=tmp_path / "c")
    assert h3["train_losses"] != h1["train_losses"]


def test_profiler_trace_hook(tmp_path):
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)
    cfg = cfg.replace_path("train.profile_steps", 1)
    cfg = cfg.replace_path("train.num_epochs", 1)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    prof = tmp_path / "outputs" / "profile"
    assert prof.exists() and any(prof.rglob("*"))


def test_nan_loss_failure_detection(tmp_path):
    # exploding LR -> non-finite loss -> emergency checkpoint + abort
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path)
    cfg = cfg.replace_path("train.learning_rate", 1e30)
    cfg = cfg.replace_path("train.num_epochs", 5)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert "aborted_epoch" in history
    assert (tmp_path / "ckpt" / "rolling").exists()


def test_end_to_end_smoke_train_with_resume(tmp_path):
    from seld_tpu.train import train_model
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0, train=True)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1, train=False)

    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert len(history["train_losses"]) == 2
    assert all(np.isfinite(v) for v in history["train_losses"])
    assert (tmp_path / "ckpt" / "best").exists()
    assert (tmp_path / "ckpt" / "rolling").exists()
    assert (tmp_path / "ckpt" / "training_history.json").exists()
    # machine-readable per-epoch metrics
    import json as _json

    lines = (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = _json.loads(lines[0])
    assert rec["epoch"] == 1 and "train" in rec and "test" in rec
    # loss-curve artifact (ref trainer.py:359-361)
    assert (tmp_path / "outputs" / "loss_curves.png").exists()

    # checkpoint stores the full config for exact arch rebuild
    stored = load_checkpoint_config(tmp_path / "ckpt")
    assert stored is not None
    assert stored.model.model_type == "crnn"
    assert stored.model.crnn_cnn_channels == (8, 16)

    # resume continues from the last rolling checkpoint
    cfg3 = parse_overrides(cfg, ["train.num_epochs=3"])
    state2, history2 = train_model(
        cfg3, train_c, test_c, workdir=tmp_path / "ckpt", resume=True
    )
    assert len(history2["train_losses"]) == 1  # only epoch 3 ran


def test_preemption_guard_catches_sigterm():
    import os
    import signal

    from seld_tpu.train.trainer import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered at next bytecode
        assert g.requested
    assert signal.getsignal(signal.SIGTERM) == prev  # handler restored


def test_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """SIGTERM mid-training -> rolling checkpoint + clean exit; a resume
    run continues from the preempted epoch (TPU-VM preemption story —
    the reference restarts from epoch 1, ref trainer.py:151)."""
    from seld_tpu.train import trainer as trainer_mod

    class AlwaysPreempted(trainer_mod.PreemptionGuard):
        def __enter__(self):
            self.requested = True  # as if SIGTERM landed immediately
            return self

        def __exit__(self, *exc):
            return False

    monkeypatch.setattr(trainer_mod, "PreemptionGuard", AlwaysPreempted)
    cfg = tiny_config(tmp_path, **{"train.num_epochs": 3})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    state, history = trainer_mod.train_model(
        cfg, train_c, test_c, workdir=tmp_path / "ckpt"
    )
    assert history["preempted_epoch"] == 1
    assert (tmp_path / "ckpt" / "rolling").exists()

    monkeypatch.undo()  # real guard again: resume must complete epochs 2-3
    state2, history2 = trainer_mod.train_model(
        cfg, train_c, test_c, workdir=tmp_path / "ckpt", resume=True
    )
    assert "preempted_epoch" not in history2
    assert len(history2["train_losses"]) == 2  # epochs 2 and 3


def test_ema_weights_are_evaluated_and_checkpointed(tmp_path):
    """With train.ema_decay close to 1, EMA weights stay near init — the
    best checkpoint must hold those (the serving artifact), not the raw
    trained weights, and they must differ from a no-EMA run's."""
    import jax
    import jax.numpy as jnp

    from seld_tpu.train import trainer as trainer_mod

    cfg = tiny_config(tmp_path, **{"train.ema_decay": 0.999})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    state_ema, _ = trainer_mod.train_model(
        cfg, train_c, test_c, workdir=tmp_path / "ema"
    )
    cfg0 = tiny_config(tmp_path)
    state_raw, _ = trainer_mod.train_model(
        cfg0, train_c, test_c, workdir=tmp_path / "raw"
    )
    # same tree structure, different weights (EMA ~ init, raw = trained)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state_ema.params, state_raw.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-4


def test_ema_update_math():
    import jax
    import jax.numpy as jnp
    import numpy as np

    decay = 0.9
    ema_update = jax.jit(
        lambda e, p: jax.tree_util.tree_map(
            lambda a, b: a * decay + b.astype(a.dtype) * (1 - decay), e, p
        )
    )
    e = {"w": jnp.zeros((3,))}
    p = {"w": jnp.ones((3,))}
    for _ in range(3):
        e = ema_update(e, p)
    expected = 1 - decay**3  # EMA of a constant target from 0
    np.testing.assert_allclose(np.asarray(e["w"]), expected, rtol=1e-6)


def test_fresh_training_replaces_stale_checkpoints(tmp_path):
    """orbax skips saving an existing step number, so a rerun into the
    same workdir used to keep stale checkpoints (and crash at best-reload
    when the architecture changed). Fresh runs must clear the tree."""
    from seld_tpu.train import train_model
    from seld_tpu.train.checkpoint import load_checkpoint_config

    cfg = tiny_config(tmp_path, **{"train.num_epochs": 1})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    # retrain with a DIFFERENT architecture into the same workdir
    cfg2 = tiny_config(tmp_path, **{
        "train.num_epochs": 1, "model.crnn_rnn_hidden": 24,
    })
    train_c2 = synthetic_corpus(cfg2, n_files=1, seconds=3.0, seed=0)
    test_c2 = synthetic_corpus(cfg2, n_files=1, seconds=3.0, seed=1)
    state2, _ = train_model(cfg2, train_c2, test_c2, workdir=tmp_path / "ckpt")

    stored = load_checkpoint_config(tmp_path / "ckpt")
    assert stored.model.crnn_rnn_hidden == 24  # new arch, not stale


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 must produce the SAME post-step parameters as the
    full-batch step for a per-example-decomposable loss (MSE) on a
    BN-free model — gradient averaging over microbatches is exact there
    (BN models deviate by construction: train-mode statistics are drawn
    per microbatch)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seld_tpu.losses import SELDLossFn
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.steps import make_train_step

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, t, c, f = x.shape
            y = nn.Dense(32)(x.reshape(b, t, c * f))
            y = nn.relu(y)
            y = nn.DenseGeneral(features=(14, 648))(y)
            return y.astype(jnp.float32)

    cfg = Config()
    model = NoBN()
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 6, 4, 64)), jnp.float32)
    mask = jnp.asarray(
        rng.integers(0, 2**13, (4, 6, 648)).astype(np.uint16)
    )
    em = jnp.ones((4,), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(accum):
        state = create_train_state(model, opt, jax.random.PRNGKey(1), mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=False,
                               accum_steps=accum)
        state, metrics = step(state, mel, mask, em, key)
        return state, metrics

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_grad_accumulation_trainer_wiring(tmp_path):
    """train.accum_steps flows through the trainer (runs, finite loss)
    and indivisible batch/accum combinations fail with a named error."""
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn", "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16", "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32", "window.window_seconds=1.0",
        "window.hop_seconds=0.5", "train.batch_size=4",
        "train.num_epochs=1", "train.accum_steps=2",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    _, hist = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert np.isfinite(hist["train_losses"][0])

    bad = parse_overrides(cfg, ["train.accum_steps=3"])
    with pytest.raises(ValueError, match="accum_steps"):
        train_model(bad, train_c, test_c, workdir=tmp_path / "ckpt2")


def test_grad_accumulation_padded_tail_batch():
    """A padded tail batch whose padding fills an entire microbatch must
    stay finite and (for the em-normalized MSE loss on a BN-free model)
    match the full-batch step exactly — the share weighting contributes
    0 for the all-padding microbatch."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seld_tpu.losses import SELDLossFn
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.steps import make_train_step

    class NoBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, t, c, f = x.shape
            y = nn.Dense(16)(x.reshape(b, t, c * f))
            return nn.DenseGeneral(features=(14, 648))(y).astype(jnp.float32)

    cfg = Config()
    model = NoBN()
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((4, 5, 4, 64)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2**13, (4, 5, 648)).astype(np.uint16))
    em = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)  # microbatch 2 is padding
    key = jax.random.PRNGKey(0)

    def run(accum):
        import jax as _jax

        state = create_train_state(model, opt, _jax.random.PRNGKey(2), mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=False,
                               accum_steps=accum)
        return step(state, mel, mask, em, key)

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_warmup_cosine_schedule_math():
    from seld_tpu.train.schedule import WarmupCosine

    s = WarmupCosine(peak=1e-3, total_steps=100, warmup_steps=10,
                     final_scale=0.01)
    # warmup ramps linearly to the peak
    assert s(0) == pytest.approx(1e-4)
    assert s(9) == pytest.approx(1e-3)
    # midpoint of the cosine sits halfway between peak and floor
    mid = s(10 + 45)
    assert mid == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-6)
    # floor at and past the horizon
    assert s(100) == pytest.approx(1e-5, rel=1e-6)
    assert s(10_000) == pytest.approx(1e-5, rel=1e-6)
    # monotone decay after warmup
    vals = [s(i) for i in range(10, 101)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosine_schedule_in_trainer(tmp_path):
    """train.lr_schedule=cosine injects the per-step LR (final LR lands
    on the cosine floor, not the plateau value) and rejects unknown
    schedule names."""
    from seld_tpu.train import train_model
    from seld_tpu.train.optimizer import current_learning_rate

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn", "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16", "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32", "window.window_seconds=1.0",
        "window.hop_seconds=0.5", "train.batch_size=4",
        "train.num_epochs=2", "train.lr_schedule=cosine",
        "train.warmup_steps=2", "train.cosine_final_scale=0.1",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    state, hist = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    final_lr = current_learning_rate(state.opt_state)
    from seld_tpu.train.schedule import WarmupCosine

    steps_per_epoch = -(-len(train_c) // cfg.train.batch_size)
    sched = WarmupCosine(
        peak=cfg.train.learning_rate,
        total_steps=steps_per_epoch * cfg.train.num_epochs,
        warmup_steps=cfg.train.warmup_steps,
        final_scale=cfg.train.cosine_final_scale,
    )
    # history records the injected LR at every epoch end — stable
    # regardless of WHICH epoch the best-checkpoint restore lands on
    # (train_model returns the best state, whose opt_state carries that
    # epoch's LR; asserting on it directly would be seed-fragile)
    expected = sched(steps_per_epoch * cfg.train.num_epochs - 1)
    assert hist["lr"][-1] == pytest.approx(expected, rel=1e-5)
    assert hist["lr"][-1] < cfg.train.learning_rate  # decayed below peak
    # the restored state's LR is the cosine value of SOME epoch end
    per_epoch = [sched(steps_per_epoch * e - 1)
                 for e in range(1, cfg.train.num_epochs + 1)]
    assert any(final_lr == pytest.approx(v, rel=1e-5) for v in per_epoch)

    bad = parse_overrides(cfg, ["train.lr_schedule=linear"])
    with pytest.raises(ValueError, match="lr_schedule"):
        train_model(bad, train_c, test_c, workdir=tmp_path / "ckpt2")


def test_select_metric_checkpoint_selection(tmp_path):
    """train.select_metric=seld_error: best checkpoint chosen on the
    per-epoch DCASE2022 validation metric, recorded in history and
    metrics.jsonl."""
    import json

    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path, **{"train.select_metric": "seld_error"})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0, train=True)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1, train=False)
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")

    assert len(history["val_metric"]) == 2
    assert all(np.isfinite(v) for v in history["val_metric"])
    assert history["best_val_metric"] == min(history["val_metric"])
    best_epoch = history["best_val_epoch"]
    assert history["val_metric"][best_epoch - 1] == history["best_val_metric"]
    assert (tmp_path / "ckpt" / "best").exists()

    recs = [json.loads(l) for l in
            (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()]
    for rec in recs:
        v = rec["val_dcase2022"]
        assert {"ER", "F_macro", "LE_macro", "LR_macro", "SELD_error"} <= set(v)
    # the recorded metric series matches history
    assert [r["val_dcase2022"]["SELD_error"] for r in recs] == history["val_metric"]

    # the saved best checkpoint is the one from best_val_epoch
    from seld_tpu.train.checkpoint import CheckpointManager
    from seld_tpu.train.state import create_train_state
    ckpt = CheckpointManager(tmp_path / "ckpt", cfg)
    import jax, jax.numpy as jnp
    from seld_tpu.models import build_model
    from seld_tpu.train.optimizer import make_optimizer
    model = build_model(cfg.model, cfg.grid)
    sample = jnp.zeros((2, train_c.window_frames, 4, cfg.model.n_mels), jnp.float32)
    template = create_train_state(
        model, make_optimizer(1e-3, 1e-4), jax.random.PRNGKey(0), sample)
    _, meta = ckpt.restore_best(template)
    ckpt.close()
    assert meta["epoch"] == best_epoch


def test_select_metric_rejects_unknown(tmp_path):
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path, **{"train.select_metric": "bogus"})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    with pytest.raises(ValueError, match="select_metric"):
        train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")


def test_select_metric_accdoa(tmp_path):
    """Metric selection works for ACCDOA models (decoded-grid metrics)."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=accdoa_conformer",
        "model.crnn_cnn_channels=8,16",
        "model.conf_d_model=32",
        "model.conf_n_layers=1",
        "model.compute_dtype=float32",
        "targets.accdoa=true",
        "window.window_seconds=1.0",
        "window.hop_seconds=0.5",
        "train.batch_size=2",
        "train.num_epochs=2",
        "train.save_every_n_epochs=1",
        "train.select_metric=f_macro",
        f"data.base_path={tmp_path}",
    ])
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    state, history = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert len(history["val_metric"]) == 2
    # f_macro is higher-better: best is the max
    assert history["best_val_metric"] == max(history["val_metric"])
    assert (tmp_path / "ckpt" / "best").exists()


def test_replay_schedules_unit(tmp_path):
    """_replay_schedules rebuilds plateau/early-stop state from
    metrics.jsonl: dedups epochs (last record wins), ignores records at
    or past start_epoch, and reproduces the reduction arithmetic."""
    import json

    from seld_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau
    from seld_tpu.train.trainer import _replay_schedules
    from seld_tpu.utils.logging import get_logger

    recs = [
        {"epoch": 1, "train": {"loss": 1.0}, "test": {"loss": 1.0}},
        {"epoch": 2, "train": {"loss": 0.9}, "test": {"loss": 1.2}},
        {"epoch": 3, "train": {"loss": 0.9}, "test": {"loss": 1.2}},
        # rerun after a mid-epoch preemption: supersedes the row above
        {"epoch": 3, "train": {"loss": 0.8}, "test": {"loss": 1.3}},
        # at/past start_epoch: not replayed
        {"epoch": 9, "train": {"loss": 0.1}, "test": {"loss": 0.1}},
    ]
    (tmp_path / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "garbage line\n"
    )
    plateau = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=1)
    stopper = EarlyStopping(patience=5, min_delta=1e-4)
    _replay_schedules(tmp_path, 4, plateau, stopper, get_logger())
    # test-loss replay: 1.0 best, then 1.2 (bad 1), 1.3 (bad 2 -> halve)
    assert plateau.lr == 0.5
    assert plateau.best == 1.0
    # train-loss replay: monotone improvement through the deduped epoch 3
    assert stopper.best == 0.8 and stopper.best_epoch == 3
    assert stopper.epochs_without_improvement == 0


def test_resume_preserves_reduced_learning_rate(tmp_path):
    """An LR reduced by the plateau scheduler before a restart must not
    bounce back to the initial value after --resume (the scheduler state
    is replayed from metrics.jsonl)."""
    from seld_tpu.train import train_model

    # near-zero LR: losses barely move, so the 1e-4-relative plateau
    # threshold fails every epoch and patience-0 reduces deterministically
    cfg = tiny_config(
        tmp_path, **{"train.lr_decay_patience": 0, "train.num_epochs": 3,
                     "train.learning_rate": 1e-7}
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    _, h1 = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    assert h1["lr"][-1] < cfg.train.learning_rate  # a reduction happened

    cfg2 = parse_overrides(cfg, ["train.num_epochs=4"])
    _, h2 = train_model(
        cfg2, train_c, test_c, workdir=tmp_path / "ckpt", resume=True
    )
    assert h2["lr"][0] <= h1["lr"][-1]  # never back up to the initial LR


def test_fresh_run_clears_stale_metrics(tmp_path):
    """metrics.jsonl is append-mode: a FRESH run into the same workdir
    must clear the previous run's records (they would poison resume's
    schedule replay and whole-file consumers)."""
    from seld_tpu.train import train_model

    cfg = tiny_config(tmp_path, **{"train.num_epochs": 1})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    lines = (tmp_path / "ckpt" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 1


def test_resume_does_not_regress_best_checkpoint(tmp_path):
    """A resumed run re-initializes best-so-far from the stored best
    checkpoint's metadata — a worse first post-resume epoch must NOT
    overwrite the best checkpoint (it used to: best_test reset to inf)."""
    from seld_tpu.train import train_model
    from seld_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    mgr = CheckpointManager(tmp_path / "ckpt", cfg)
    first = mgr.best_meta()
    mgr.close()
    assert first is not None

    # resume epoch 3 with the loss scaled 10x: its eval loss is
    # deterministically worse than the stored best, whatever training
    # does (a destructive LR is NOT reliable here — collapsing to
    # all-background LOWERS the CE loss on sparse scenes)
    cfg2 = parse_overrides(
        cfg, ["train.num_epochs=3", "loss.w_class=10.0"]
    )
    _, h2 = train_model(
        cfg2, train_c, test_c, workdir=tmp_path / "ckpt", resume=True
    )
    assert "aborted_epoch" not in h2  # finite losses: the eval really ran
    assert h2["test_losses"][-1] > first["test_loss"]  # and really is worse
    mgr = CheckpointManager(tmp_path / "ckpt", cfg)
    after = mgr.best_meta()
    mgr.close()
    assert after["epoch"] == first["epoch"]
    assert after["test_loss"] == first["test_loss"]


def test_resume_does_not_regress_best_metric_checkpoint(tmp_path):
    """Same invariant under train.select_metric: the stored best carries
    its selection value in metadata and a resumed run continues from it
    (an equal post-resume metric must not re-save the best)."""
    from seld_tpu.train import train_model
    from seld_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config(tmp_path, **{"train.select_metric": "seld_error"})
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    _, h1 = train_model(cfg, train_c, test_c, workdir=tmp_path / "ckpt")
    mgr = CheckpointManager(tmp_path / "ckpt", cfg)
    first = mgr.best_meta()
    mgr.close()
    assert first["select"] == {
        "metric": "seld_error", "value": h1["best_val_metric"]
    }

    cfg2 = parse_overrides(cfg, ["train.num_epochs=3"])
    _, h2 = train_model(
        cfg2, train_c, test_c, workdir=tmp_path / "ckpt", resume=True
    )
    mgr = CheckpointManager(tmp_path / "ckpt", cfg)
    after = mgr.best_meta()
    mgr.close()
    # strictly-better-only selection: epoch 3 overwrote iff it improved
    if h2["val_metric"][-1] < first["select"]["value"]:
        assert after["epoch"] == 3
    else:
        assert after["epoch"] == first["epoch"]
        assert after["select"] == first["select"]
    # resumed history carries the baseline forward
    assert h2["best_val_metric"] == min(
        [first["select"]["value"]] + h2["val_metric"]
    )
