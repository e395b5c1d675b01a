"""Knowledge distillation (seld_tpu/distill.py): KD-loss oracles, the
distilling train step, and the trainer integration.

The reference has no distillation (repo-wide search; SURVEY §2) — this is
a production-serving extra in the quant/QAT family, so the tests follow
the repo's golden-oracle convention: the KD math is restated as literal
numpy loops in test code, never by importing the implementation's path.
"""

import json

import numpy as np
import pytest

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus


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
        "train.num_epochs=1",
        "train.save_every_n_epochs=1",
        f"data.base_path={tmp_path}",
    ] + [f"{k}={v}" for k, v in extra.items()]
    return parse_overrides(Config(), over)


# ---------------------------------------------------------------- KD math


def _kd_oracle(student, teacher, em, temperature):
    """Literal restatement: per-cell KL(teacher||student) over the class
    axis of class-major (B, T, M, G) logits, averaged over (T, G) per
    example, example-mask-weighted, times T^2."""
    b, t, m, g = student.shape
    per_example = np.zeros(b)
    for i in range(b):
        acc = 0.0
        for f in range(t):
            for c in range(g):
                s = student[i, f, :, c] / temperature
                q = teacher[i, f, :, c] / temperature
                ps = np.exp(s - s.max())
                ps /= ps.sum()
                pt = np.exp(q - q.max())
                pt /= pt.sum()
                acc += float(np.sum(pt * (np.log(pt) - np.log(ps))))
        per_example[i] = acc / (t * g)
    if em is None:
        return per_example.mean() * temperature**2
    w = np.asarray(em, np.float64)
    return float((per_example * w).sum() / max(w.sum(), 1e-8)) * temperature**2


@pytest.mark.parametrize("temperature", [1.0, 2.0, 4.0])
def test_grid_kd_loss_matches_literal_oracle(temperature):
    from seld_tpu.distill import grid_kd_loss

    rng = np.random.default_rng(0)
    s = rng.normal(size=(3, 2, 5, 4)).astype(np.float32) * 3
    t = rng.normal(size=(3, 2, 5, 4)).astype(np.float32) * 3
    em = np.array([1.0, 0.0, 1.0], np.float32)
    got = float(grid_kd_loss(s, t, em, temperature=temperature))
    want = _kd_oracle(s, t, em, temperature)
    assert got == pytest.approx(want, rel=1e-5)
    # no mask
    got_nm = float(grid_kd_loss(s, t, None, temperature=temperature))
    assert got_nm == pytest.approx(_kd_oracle(s, t, None, temperature), rel=1e-5)


def test_grid_kd_loss_zero_iff_equal():
    from seld_tpu.distill import grid_kd_loss

    rng = np.random.default_rng(1)
    s = rng.normal(size=(2, 3, 4, 6)).astype(np.float32)
    assert float(grid_kd_loss(s, s, None, temperature=2.0)) == pytest.approx(
        0.0, abs=1e-6
    )
    t = s + rng.normal(size=s.shape).astype(np.float32)
    assert float(grid_kd_loss(s, t, None, temperature=2.0)) > 1e-4


def _weighted_kd_oracle(student, teacher, em, temperature, cw):
    """Literal restatement of the class-weighted KD: each cell's KL is
    weighted by cw[teacher argmax class], normalized torch-CE-style
    (sum(w*kl*em) / sum(w*em)), times T^2."""
    b, t, m, g = student.shape
    num = den = 0.0
    emv = np.ones(b) if em is None else np.asarray(em, np.float64)
    for i in range(b):
        for f in range(t):
            for c in range(g):
                s = student[i, f, :, c] / temperature
                q = teacher[i, f, :, c] / temperature
                ps = np.exp(s - s.max())
                ps /= ps.sum()
                pt = np.exp(q - q.max())
                pt /= pt.sum()
                kl = float(np.sum(pt * (np.log(pt) - np.log(ps))))
                w = float(cw[int(np.argmax(teacher[i, f, :, c]))])
                num += w * kl * emv[i]
                den += w * emv[i]
    return num / max(den, 1e-8) * temperature**2


@pytest.mark.parametrize("temperature", [1.0, 3.0])
def test_grid_kd_loss_class_weighted_matches_literal_oracle(temperature):
    from seld_tpu.distill import grid_kd_loss

    rng = np.random.default_rng(7)
    s = rng.normal(size=(3, 2, 5, 4)).astype(np.float32) * 3
    t = rng.normal(size=(3, 2, 5, 4)).astype(np.float32) * 3
    em = np.array([1.0, 0.0, 1.0], np.float32)
    cw = np.array([1.0, 1.0, 1.0, 1.0, 0.05], np.float32)  # bg = last class
    got = float(grid_kd_loss(s, t, em, temperature=temperature,
                             class_weights=cw))
    want = _weighted_kd_oracle(s, t, em, temperature, cw)
    assert got == pytest.approx(want, rel=1e-5)
    # uniform weights reduce exactly to the unweighted form
    ones = np.ones(5, np.float32)
    got_u = float(grid_kd_loss(s, t, em, temperature=temperature,
                               class_weights=ones))
    assert got_u == pytest.approx(
        float(grid_kd_loss(s, t, em, temperature=temperature)), rel=1e-6
    )


def test_grid_kd_loss_bg_weighting_damps_background_pressure():
    """On a grid where the teacher predicts background almost everywhere,
    down-weighting background must make the KD term track the event
    cells: perturbing the student ONLY on teacher-background cells moves
    the weighted loss far less than perturbing event cells does."""
    from seld_tpu.distill import grid_kd_loss

    rng = np.random.default_rng(8)
    b, t, m, g = 2, 4, 6, 32
    bg = m - 1
    teacher = np.zeros((b, t, m, g), np.float32)
    teacher[..., bg, :] = 6.0  # confident background everywhere...
    teacher[0, :, 2, 0] = 12.0  # ...except one event cell
    student = rng.normal(size=(b, t, m, g)).astype(np.float32)
    cw = np.ones(m, np.float32)
    cw[bg] = 0.05

    pert_bg = student.copy()
    pert_bg[..., :, 1:] += rng.normal(size=(b, t, m, g - 1)).astype(np.float32)
    pert_ev = student.copy()
    pert_ev[0, :, :, 0] += rng.normal(size=(t, m)).astype(np.float32)

    def sensitivity_ratio(weights):
        base = float(grid_kd_loss(student, teacher, class_weights=weights))
        d_bg = abs(
            float(grid_kd_loss(pert_bg, teacher, class_weights=weights))
            - base)
        d_ev = abs(
            float(grid_kd_loss(pert_ev, teacher, class_weights=weights))
            - base)
        return d_ev / d_bg

    # 31/32 of cells changed in pert_bg vs 1/32 in pert_ev; the 0.05 bg
    # weight must shift the loss's sensitivity toward the event cell by
    # an order of magnitude relative to uniform KD (31*0.05 vs 31 of
    # aggregate background weight against the event cell's 1.0)
    assert sensitivity_ratio(cw) > 10 * sensitivity_ratio(None)


def test_load_teacher_bakes_class_weighted_kd(tmp_path):
    """The spec returned for a grid teacher must carry the background
    down-weighting: its kd differs from uniform grid_kd_loss on a
    background-dominated pair, and matches grid_kd_loss with the CE's
    class weights exactly."""
    from seld_tpu.distill import grid_kd_loss, load_teacher
    from seld_tpu.losses.seld_loss import make_class_weights

    cfg = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1,
                              train=False)
    ckpt = _teacher_ckpt(cfg, tmp_path, train_c, test_c)
    spec, _, _ = load_teacher(cfg, ckpt, train_c.window_frames,
                              train_c.mel.shape[1])

    rng = np.random.default_rng(9)
    m = cfg.grid.num_classes
    s = rng.normal(size=(2, 3, m, 8)).astype(np.float32)
    t = np.zeros_like(s)
    t[..., m - 1, :] = 5.0  # background-dominated teacher
    t[0, 0, 1, 0] = 9.0
    cw = make_class_weights(m, cfg.loss.background_class_weight)
    want = float(grid_kd_loss(s, t, None, temperature=spec.temperature,
                              class_weights=cw))
    got = float(spec.kd(s, t, None, temperature=spec.temperature))
    assert got == pytest.approx(want, rel=1e-6)
    uniform = float(grid_kd_loss(s, t, None, temperature=spec.temperature))
    assert got != pytest.approx(uniform, rel=1e-3)


def test_vector_kd_loss_is_masked_mse():
    from seld_tpu.distill import vector_kd_loss

    rng = np.random.default_rng(2)
    s = rng.normal(size=(3, 4, 5, 3)).astype(np.float32)
    t = rng.normal(size=(3, 4, 5, 3)).astype(np.float32)
    em = np.array([1.0, 1.0, 0.0], np.float32)
    got = float(vector_kd_loss(s, t, em))
    per_ex = ((s - t) ** 2).reshape(3, -1).mean(axis=1)
    want = float((per_ex * em).sum() / em.sum())
    assert got == pytest.approx(want, rel=1e-6)


def _perm_kd_oracle(student, teacher, em):
    """Literal restatement: per (frame, class), min over all track
    orderings of the teacher of the MSE over (track, axis); mean over
    (T, C) per example; example-mask-weighted mean."""
    import itertools

    b, t, n, c, _ = student.shape
    per_example = np.zeros(b)
    for i in range(b):
        acc = 0.0
        for f in range(t):
            for k in range(c):
                best = np.inf
                for perm in itertools.permutations(range(n)):
                    mse = np.mean(
                        (student[i, f, :, k, :]
                         - teacher[i, f, list(perm), k, :]) ** 2
                    )
                    best = min(best, float(mse))
                acc += best
        per_example[i] = acc / (t * c)
    if em is None:
        return per_example.mean()
    w = np.asarray(em, np.float64)
    return float((per_example * w).sum() / max(w.sum(), 1e-8))


def test_multi_accdoa_kd_loss_matches_literal_oracle():
    from seld_tpu.distill import multi_accdoa_kd_loss

    rng = np.random.default_rng(7)
    s = rng.normal(size=(3, 4, 3, 5, 3)).astype(np.float32)
    t = rng.normal(size=(3, 4, 3, 5, 3)).astype(np.float32)
    em = np.array([1.0, 0.0, 1.0], np.float32)
    got = float(multi_accdoa_kd_loss(s, t, em))
    assert got == pytest.approx(_perm_kd_oracle(s, t, em), rel=1e-5)
    got_unmasked = float(multi_accdoa_kd_loss(s, t, None))
    assert got_unmasked == pytest.approx(_perm_kd_oracle(s, t, None),
                                         rel=1e-5)


def test_multi_accdoa_kd_is_track_permutation_invariant():
    """Permuting the teacher's track axis must not change the loss (the
    candidate set is the same up to ordering, and min is order-exact),
    and a student matching the teacher under ANY track ordering scores
    exactly zero — both properties position-wise MSE lacks."""
    from seld_tpu.distill import multi_accdoa_kd_loss, vector_kd_loss

    rng = np.random.default_rng(11)
    s = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32)
    t = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32)
    base = float(multi_accdoa_kd_loss(s, t))
    for perm in [(1, 0, 2), (2, 1, 0), (1, 2, 0)]:
        assert float(multi_accdoa_kd_loss(s, t[:, :, perm])) == base

    # student = teacher with swapped tracks: perm-KD 0, position-KD > 0
    swapped = t[:, :, (2, 0, 1)]
    assert float(multi_accdoa_kd_loss(swapped, t)) == 0.0
    assert float(vector_kd_loss(swapped, t)) > 0.0

    # identity candidate bounds it: perm-KD <= position-KD always
    assert base <= float(vector_kd_loss(s, t)) + 1e-7


def test_load_teacher_track_matching_knob(tmp_path):
    """Multi-ACCDOA teachers get the permutation-invariant KD by
    default, position-wise on request, and a named error otherwise."""
    from seld_tpu.distill import load_teacher

    cfg_t = tiny_config(tmp_path, **{
        "model.model_type": "multi_accdoa_conformer",
        "model.conf_d_model": "32",
        "model.conf_n_heads": "4",
        "model.conf_n_layers": "1",
        "targets.accdoa": "true",
        "targets.accdoa_tracks": "3",
    })
    train_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=1)
    teacher_dir = _teacher_ckpt(cfg_t, tmp_path, train_c, test_c)
    win = train_c.window_frames
    ch = train_c.mel.shape[1]

    rng = np.random.default_rng(3)
    s = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32)
    t = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32)
    swapped = t[:, :, (1, 2, 0)]

    spec, _, _ = load_teacher(cfg_t, teacher_dir, win, ch)
    assert float(spec.kd(swapped, t)) == 0.0  # permutation-invariant

    cfg_pos = cfg_t.replace_path(
        "train.distill_track_matching", "position")
    spec_pos, _, _ = load_teacher(cfg_pos, teacher_dir, win, ch)
    assert float(spec_pos.kd(swapped, t)) > 0.0  # slot-wise

    cfg_bad = cfg_t.replace_path("train.distill_track_matching", "nope")
    with pytest.raises(ValueError, match="distill_track_matching"):
        load_teacher(cfg_bad, teacher_dir, win, ch)


def _activity_weighted_oracle(per_cell, teacher, em, bg_w, thr=0.5):
    """Literal restatement of the teacher-activity cell weighting:
    w = 1 on cells where any teacher track norm > thr, bg_w elsewhere;
    loss = sum(w * per_cell * em) / sum(w * em)."""
    norms = np.linalg.norm(teacher.astype(np.float64), axis=-1)
    active = norms > thr
    if active.ndim == 4:  # (B, T, N, C) -> any track
        active = active.any(axis=2)
    w = np.where(active, 1.0, bg_w)
    if em is None:
        em = np.ones(per_cell.shape[0])
    em = np.asarray(em, np.float64).reshape(-1, 1, 1)
    return float((w * per_cell * em).sum() / max((w * em).sum(), 1e-8))


def _make_sparse_teacher(rng, shape, n_active=6):
    """Mostly zero-vector teacher (the real SELD regime) with a few
    unit-norm active cells. Returns (teacher, active_mask (B,T,C))."""
    t = np.zeros(shape, np.float32)
    b, T, *mid = shape[:-1]
    act = np.zeros((shape[0], shape[1], shape[-2]), bool)
    for _ in range(n_active):
        i, f, c = (rng.integers(shape[0]), rng.integers(shape[1]),
                   rng.integers(shape[-2]))
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v)
        if len(shape) == 5:
            t[i, f, rng.integers(shape[2]), c] = v
        else:
            t[i, f, c] = v
        act[i, f, c] = True
    return t, act


def test_vector_kd_activity_weighting_matches_oracle():
    from seld_tpu.distill import vector_kd_loss

    rng = np.random.default_rng(5)
    t, _ = _make_sparse_teacher(rng, (3, 4, 5, 3))
    s = rng.normal(size=(3, 4, 5, 3)).astype(np.float32) * 0.1
    em = np.array([1.0, 0.0, 1.0], np.float32)
    per_cell = ((s.astype(np.float64) - t) ** 2).mean(axis=-1)
    for bg_w in (0.05, 0.5):
        got = float(vector_kd_loss(s, t, em, background_weight=bg_w))
        want = _activity_weighted_oracle(per_cell, t, em, bg_w)
        assert got == pytest.approx(want, rel=1e-5)
    # bg_w=1.0 recovers the uniform loss exactly
    assert float(vector_kd_loss(s, t, em, background_weight=1.0)) == \
        pytest.approx(float(vector_kd_loss(s, t, em)), rel=1e-6)


def test_multi_accdoa_kd_activity_weighting_matches_oracle():
    import itertools

    from seld_tpu.distill import multi_accdoa_kd_loss

    rng = np.random.default_rng(9)
    t, _ = _make_sparse_teacher(rng, (2, 3, 3, 4, 3))
    s = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32) * 0.1
    per_cell = np.stack([
        ((s.astype(np.float64) - t[:, :, p]) ** 2).mean(axis=(2, 4))
        for p in itertools.permutations(range(3))
    ]).min(axis=0)
    got = float(multi_accdoa_kd_loss(s, t, None, background_weight=0.05))
    want = _activity_weighted_oracle(per_cell, t, None, 0.05)
    assert got == pytest.approx(want, rel=1e-5)


def test_activity_weighting_rebalances_background_pressure():
    """The round-4 collapse mechanism, as a property: on a 99%-background
    teacher, an error on ONE active cell must dominate the same-size
    error spread over the many background cells — uniform KD has it the
    other way around (background pressure >> event pressure)."""
    from seld_tpu.distill import multi_accdoa_kd_loss

    rng = np.random.default_rng(13)
    shape = (2, 20, 3, 10, 3)  # 400 (frame, class) cells
    t, act = _make_sparse_teacher(rng, shape, n_active=4)

    # student A: matches teacher except ONE active cell zeroed (silence
    # on an event); student B: matches except 0.1-norm noise on every
    # background cell (hum everywhere)
    s_silent = t.copy()
    i, f, c = map(int, np.argwhere(act)[0])
    s_silent[i, f, :, c, :] = 0.0
    s_hum = t.copy()
    bg = ~act
    noise = rng.normal(size=shape).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=-1, keepdims=True) * 10.0
    s_hum[bg[:, :, None, :].repeat(3, axis=2)] = \
        noise[bg[:, :, None, :].repeat(3, axis=2)]

    uni_silent = float(multi_accdoa_kd_loss(s_silent, t))
    uni_hum = float(multi_accdoa_kd_loss(s_hum, t))
    w_silent = float(multi_accdoa_kd_loss(s_silent, t,
                                          background_weight=0.05))
    w_hum = float(multi_accdoa_kd_loss(s_hum, t, background_weight=0.05))
    # uniform KD: background hum dominates the one silenced event
    assert uni_hum > uni_silent
    # activity-weighted KD: the silenced event dominates the hum
    assert w_silent > w_hum


def test_load_teacher_wires_activity_weighting(tmp_path):
    """Both multi-ACCDOA matchings arrive background-down-weighted from
    load_teacher (sharing loss.background_class_weight), and =1.0
    recovers uniform."""
    from seld_tpu.distill import load_teacher, multi_accdoa_kd_loss

    cfg_t = tiny_config(tmp_path, **{
        "model.model_type": "multi_accdoa_conformer",
        "model.conf_d_model": "32",
        "model.conf_n_heads": "4",
        "model.conf_n_layers": "1",
        "targets.accdoa": "true",
        "targets.accdoa_tracks": "3",
    })
    train_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=1)
    teacher_dir = _teacher_ckpt(cfg_t, tmp_path, train_c, test_c)
    win, ch = train_c.window_frames, train_c.mel.shape[1]

    rng = np.random.default_rng(3)
    t, _ = _make_sparse_teacher(rng, (2, 3, 3, 4, 3))
    s = rng.normal(size=(2, 3, 3, 4, 3)).astype(np.float32) * 0.1

    spec, _, _ = load_teacher(cfg_t, teacher_dir, win, ch)
    want = float(multi_accdoa_kd_loss(
        s, t, None, background_weight=cfg_t.loss.background_class_weight))
    assert float(spec.kd(s, t, None)) == pytest.approx(want, rel=1e-6)
    assert want != pytest.approx(float(multi_accdoa_kd_loss(s, t)),
                                 rel=1e-3)

    cfg_uni = cfg_t.replace_path("loss.background_class_weight", 1.0)
    spec_u, _, _ = load_teacher(cfg_uni, teacher_dir, win, ch)
    assert float(spec_u.kd(s, t, None)) == pytest.approx(
        float(multi_accdoa_kd_loss(s, t)), rel=1e-6)


# ------------------------------------------------------------- step wiring


def _teacher_ckpt(cfg, tmp_path, corpus_train, corpus_test):
    from seld_tpu.train import train_model

    workdir = tmp_path / "teacher"
    train_model(cfg, corpus_train, corpus_test, workdir=workdir)
    return workdir


def test_distilling_step_alpha0_matches_plain(tmp_path):
    import jax
    import jax.numpy as jnp

    from seld_tpu.distill import DistillSpec, grid_kd_loss
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = tiny_config(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel, mask = corpus.gather(np.arange(2))
    mel, mask = jnp.asarray(mel), jnp.asarray(mask)
    em = jnp.ones((2,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    # "teacher" = an independently initialized copy of the same tiny model
    t_state = create_train_state(model, opt, jax.random.PRNGKey(7), mel)
    t_vars = {"params": t_state.params}
    if t_state.batch_stats:
        t_vars["batch_stats"] = t_state.batch_stats
    spec = lambda alpha: DistillSpec(
        apply=lambda v, x: model.apply(v, x, train=False),
        kd=grid_kd_loss, alpha=alpha, temperature=2.0,
    )

    plain = make_train_step(model, loss_fn, opt, cfg.grid.num_classes,
                            donate=False)
    dist0 = make_train_step(model, loss_fn, opt, cfg.grid.num_classes,
                            donate=False, distill=spec(0.0))
    rng = jax.random.PRNGKey(1)
    _, m_plain = plain(state, mel, mask, em, rng)
    _, m_dist0 = dist0(state, mel, mask, em, rng, t_vars)
    # alpha=0: the hard objective is untouched; kd is still reported
    assert float(m_dist0["loss"]) == pytest.approx(float(m_plain["loss"]),
                                                   rel=1e-6)
    assert float(m_dist0["hard"]) == pytest.approx(float(m_plain["loss"]),
                                                   rel=1e-6)
    assert np.isfinite(float(m_dist0["kd"])) and float(m_dist0["kd"]) > 0

    # alpha=0.7 blends the reported total
    dist = make_train_step(model, loss_fn, opt, cfg.grid.num_classes,
                           donate=False, distill=spec(0.7))
    _, m1 = dist(state, mel, mask, em, rng, t_vars)
    assert float(m1["loss"]) == pytest.approx(
        0.3 * float(m1["hard"]) + 0.7 * float(m1["kd"]), rel=1e-5
    )


def test_distill_accum_decomposes_exactly():
    """Gradient accumulation decomposes the KD term exactly (it is an
    em-normalized per-example mean, like MSE) — pinned on a BN-free,
    dropout-free model, the regime where accumulation is exact (BN
    models deviate by construction: per-microbatch statistics)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from seld_tpu.distill import DistillSpec, grid_kd_loss
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
    mask = jnp.asarray(rng.integers(0, 2**13, (4, 6, 648)).astype(np.uint16))
    em = jnp.ones((4,), jnp.float32)
    key = jax.random.PRNGKey(0)
    t_state = create_train_state(model, opt, jax.random.PRNGKey(9), mel)
    t_vars = {"params": t_state.params}
    spec = DistillSpec(
        apply=lambda v, x: model.apply(v, x, train=False),
        kd=grid_kd_loss, alpha=0.7, temperature=2.0,
    )

    def run(accum):
        state = create_train_state(model, opt, jax.random.PRNGKey(1), mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=False,
                               accum_steps=accum, distill=spec)
        return step(state, mel, mask, em, key, t_vars)

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert float(m2["kd"]) == pytest.approx(float(m1["kd"]), rel=1e-5)
    assert float(m2["hard"]) == pytest.approx(float(m1["hard"]), rel=1e-5)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


# ------------------------------------------------------------- trainer e2e


def test_trainer_distills_from_teacher_checkpoint(tmp_path):
    from seld_tpu.train import train_model

    cfg_t = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=1)
    teacher_dir = _teacher_ckpt(cfg_t, tmp_path, train_c, test_c)

    # student: a DIFFERENT (smaller) architecture, same corpus contract
    cfg_s = tiny_config(
        tmp_path,
        **{
            "model.crnn_cnn_channels": "4,8",
            "model.crnn_rnn_hidden": "8",
            "train.distill_ckpt": str(teacher_dir),
            "train.distill_alpha": "0.5",
            "train.distill_temperature": "3.0",
        },
    )
    workdir = tmp_path / "student"
    _, history = train_model(cfg_s, train_c, test_c, workdir=workdir)
    recs = [json.loads(l) for l in
            (workdir / "metrics.jsonl").read_text().splitlines()]
    assert recs, "no metrics records written"
    for r in recs:
        assert "kd" in r["train"] and "hard" in r["train"]
        assert np.isfinite(r["train"]["kd"])
        assert r["train"]["loss"] == pytest.approx(
            0.5 * r["train"]["hard"] + 0.5 * r["train"]["kd"], rel=1e-4
        )


def test_distill_rejects_cross_representation_and_mismatched_inputs(tmp_path):
    from seld_tpu.distill import load_teacher
    from seld_tpu.train import train_model

    cfg_t = tiny_config(tmp_path)
    train_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg_t, n_files=1, seconds=3.0, seed=1)
    teacher_dir = _teacher_ckpt(cfg_t, tmp_path, train_c, test_c)
    win = train_c.window_frames
    ch = train_c.mel.shape[1]

    # grid teacher -> ACCDOA student: named error
    cfg_acc = tiny_config(tmp_path, **{
        "model.model_type": "accdoa_conformer",
        "train.distill_ckpt": str(teacher_dir),
    })
    with pytest.raises(ValueError, match="cross-representation"):
        load_teacher(cfg_acc, teacher_dir, win, ch)

    # mismatched window config: named error
    cfg_win = tiny_config(tmp_path, **{
        "window.window_seconds": "2.0",
        "train.distill_ckpt": str(teacher_dir),
    })
    with pytest.raises(ValueError, match="window"):
        load_teacher(cfg_win, teacher_dir, win, ch)

    # alpha out of range: named error from the trainer
    cfg_bad = tiny_config(tmp_path, **{
        "train.distill_ckpt": str(teacher_dir),
        "train.distill_alpha": "1.5",
    })
    with pytest.raises(ValueError, match="distill_alpha"):
        train_model(cfg_bad, train_c, test_c, workdir=tmp_path / "bad")

    # missing checkpoint: named error
    cfg_missing = tiny_config(tmp_path, **{
        "train.distill_ckpt": str(tmp_path / "nowhere"),
    })
    with pytest.raises(FileNotFoundError):
        load_teacher(cfg_missing, tmp_path / "nowhere", win, ch)

    # temperature <= 0 would divide by zero inside the KD loss: named
    # error from the trainer (ADVICE r3)
    cfg_temp = tiny_config(tmp_path, **{
        "train.distill_ckpt": str(teacher_dir),
        "train.distill_temperature": "0.0",
    })
    with pytest.raises(ValueError, match="distill_temperature"):
        train_model(cfg_temp, train_c, test_c, workdir=tmp_path / "bad_t")


def test_distilling_step_requires_teacher_vars(tmp_path):
    """A step built with distill set fails with a NAMED error at trace
    time when the trailing teacher_vars argument is omitted (ADVICE r3:
    the raw failure was a cryptic flax error deep in model.apply)."""
    import jax
    import jax.numpy as jnp

    from seld_tpu.distill import DistillSpec, grid_kd_loss
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.steps import make_train_step

    cfg = tiny_config(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    mel, mask = corpus.gather(np.arange(2) % len(corpus))
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0),
        jnp.asarray(mel),
    )
    spec = DistillSpec(
        apply=lambda v, m: model.apply(v, m, train=False),
        kd=grid_kd_loss, alpha=0.5, temperature=2.0,
    )
    step = make_train_step(model, SELDLossFn(cfg.loss, cfg.grid),
                           make_optimizer(1e-3), cfg.grid.num_classes,
                           donate=False, distill=spec)
    with pytest.raises(ValueError, match="teacher_vars"):
        step(state, jnp.asarray(mel), jnp.asarray(mask),
             jnp.ones((2,), jnp.float32), jax.random.PRNGKey(1))
