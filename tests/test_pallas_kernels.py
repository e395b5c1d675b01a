"""Pallas kernel correctness vs the jnp oracles (interpret mode on CPU;
the same kernels compile natively on TPU — exercised by bench_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.features import frame_signal, hann_window, log_mel_spectrogram
from seld_tpu.ops.mel_pallas import log_mel_frames_pallas

SR, NFFT, HOP, NMELS = 24_000, 960, 480, 64


def test_fused_mel_matches_oracle(rng):
    wave = rng.standard_normal(SR // 2).astype(np.float32)
    frames = frame_signal(jnp.asarray(wave), NFFT, HOP)  # (T, 960)

    got = np.asarray(log_mel_frames_pallas(frames, interpret=True))

    win = jnp.asarray(hann_window(NFFT))
    oracle = np.asarray(log_mel_spectrogram(jnp.asarray(wave))).T  # (T, n_mels)
    assert got.shape == oracle.shape
    # windowed-DFT matmul vs rFFT, both f32: tight agreement expected
    np.testing.assert_allclose(got, oracle, atol=5e-3)


def test_fused_mel_non_tile_multiple(rng):
    # 37 frames (not a multiple of the 256 tile) must round-trip the pad.
    frames = jnp.asarray(rng.standard_normal((37, NFFT)).astype(np.float32))
    got = log_mel_frames_pallas(frames, interpret=True)
    assert got.shape == (37, NMELS)
    assert bool(jnp.isfinite(got).all())


def test_fused_mel_silence_hits_amin():
    frames = jnp.zeros((8, NFFT), jnp.float32)
    got = np.asarray(log_mel_frames_pallas(frames, interpret=True))
    np.testing.assert_allclose(got, -100.0, atol=1e-4)  # 10*log10(1e-10)


# ---------------------------------------------------------------------------
# Fused spatial front-end


@pytest.mark.parametrize("feature_set", ["mel", "mel_iv", "mel_gcc"])
def test_fused_spatial_matches_jnp_oracle(rng, feature_set):
    from seld_tpu.features.spatial import extract_feature_frames
    from seld_tpu.ops.spatial_pallas import spatial_features_pallas

    frames = jnp.asarray(
        rng.standard_normal((4, 37, NFFT)).astype(np.float32)
    )
    got = np.asarray(
        spatial_features_pallas(frames, feature_set, interpret=True)
    )
    want = np.asarray(extract_feature_frames(frames, feature_set, NFFT, 64, SR))
    assert got.shape == want.shape
    # mel channels are in dB (tolerance as mel kernel); iv in [-1,1];
    # gcc correlations are small — use scale-aware tolerances
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=5e-3)
    if got.shape[1] > 4:
        np.testing.assert_allclose(got[:, 4:], want[:, 4:], atol=1e-4)


def test_fused_spatial_gcc_lag_peak(rng):
    # same delayed-channel construction as the jnp test: peak at +7
    from seld_tpu.data.corpus import _frame_view
    from seld_tpu.ops.spatial_pallas import spatial_features_pallas

    n = SR // 2
    base = rng.standard_normal(n + 64).astype(np.float32)
    delay = 7
    wave = np.stack(
        [base[64 : 64 + n], base[64 - delay : 64 - delay + n],
         rng.standard_normal(n).astype(np.float32),
         rng.standard_normal(n).astype(np.float32)]
    )
    frames = jnp.asarray(np.ascontiguousarray(_frame_view(wave, NFFT, HOP)))
    out = np.asarray(spatial_features_pallas(frames, "mel_gcc", interpret=True))
    pair01 = out[:, 4]  # first gcc channel = pair (0, 1)
    assert pair01.mean(axis=0).argmax() == 32 + delay


# ---------------------------------------------------------------------------
# Flash attention


@pytest.mark.parametrize("t", [250, 128, 300])
def test_flash_attention_matches_einsum(rng, t):
    from seld_tpu.ops.attention import multi_head_attention
    from seld_tpu.ops.flash_attention import flash_attention

    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    want = np.asarray(multi_head_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_attention_gradients_match_einsum(rng):
    import jax

    from seld_tpu.ops.attention import multi_head_attention
    from seld_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 1, 2, 130, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (multi_head_attention(q, k, v, use_flash=False) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_attention_padded_keys_have_no_weight(rng):
    # T=130 pads to 256: padded key positions must not leak probability.
    from seld_tpu.ops.attention import multi_head_attention
    from seld_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 1, 2, 130, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(10.0 * rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    want = np.asarray(multi_head_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5)


@pytest.mark.parametrize("t", [250, 640, 1024])
def test_flash_attention_pallas_bwd_matches_xla_bwd(rng, t):
    """FlashAttention-2 Pallas backward (O(T) memory) vs the einsum VJP
    oracle: dq/dk/dv must agree, including ragged T with padded blocks."""
    import jax

    from seld_tpu.ops.flash_attention import flash_attention

    b, h, d = 2, 3, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    g = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def run(bwd_impl):
        def loss(q, k, v):
            out = flash_attention(q, k, v, interpret=True, bwd_impl=bwd_impl)
            return jnp.sum(out * g)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    got = run("pallas")
    want = run("xla")
    for name, a, b_ in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_flash_attention_lse_is_correct(rng):
    """The saved logsumexp must equal log(sum(exp(scores*scale))) per row —
    the quantity the backward recompute hinges on."""
    from seld_tpu.ops.flash_attention import _flash_attention_fwd_impl

    b, h, t, d = 1, 2, 250, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    scale = d ** -0.5
    _, lse = _flash_attention_fwd_impl(scale, True, q, k, v)
    scores = np.einsum("bhtd,bhsd->bhts", q, k) * scale
    want = np.log(np.sum(np.exp(scores), axis=-1)).reshape(b * h, t)
    np.testing.assert_allclose(
        np.asarray(lse)[:, :t, 0], want, rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Fused grid-loss kernel (seld_tpu/ops/loss_pallas.py), interpret mode
# ---------------------------------------------------------------------------


def _loss_case(seed, b=2, t=5, g=648, m=14):
    # class-major logits (b, t, m, g) — the models' native layout
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((b, t, m, g)), jnp.float32)
    mask_np = np.where(
        rng.random((b, t, g)) < 0.9, 0,
        rng.integers(1, 2 ** (m - 1), (b, t, g)),
    ).astype(np.uint16)
    return logits, jnp.asarray(mask_np)


def test_grid_loss_terms_forward_matches_jnp():
    from seld_tpu.ops.loss_pallas import grid_loss_terms
    from seld_tpu.targets.rasterize import decode_class_bitmask

    logits, mask = _loss_case(0)
    b, t, m, g = logits.shape
    x = logits.reshape(b * t, m, g)
    sq, pbg = grid_loss_terms(x, mask.reshape(b * t, g), m, True)

    probs = jax.nn.softmax(logits, axis=2)
    targets = decode_class_bitmask(mask, m, class_major=True)
    want_sq = jnp.sum((probs - targets) ** 2, axis=2).reshape(b * t, g)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(want_sq),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pbg).reshape(b, t, g), np.asarray(probs[:, :, -1]),
        rtol=1e-5, atol=1e-7,
    )


def test_grid_loss_terms_gradient_matches_jnp():
    """d/dlogits of a combined functional of BOTH kernel outputs must
    match the jnp softmax/square formulation."""
    from seld_tpu.ops.loss_pallas import grid_loss_terms
    from seld_tpu.targets.rasterize import decode_class_bitmask

    logits, mask = _loss_case(1, b=2, t=3)
    b, t, m, g = logits.shape
    w = jnp.asarray(np.random.default_rng(2).standard_normal((b * t, g)),
                    jnp.float32)

    def fused(lg):
        x = lg.reshape(b * t, m, g)
        sq, pbg = grid_loss_terms(x, mask.reshape(b * t, g), m, True)
        return jnp.sum(sq) * 0.3 + jnp.sum(pbg * w)

    def oracle(lg):
        probs = jax.nn.softmax(lg.astype(jnp.float32), axis=2)
        targets = decode_class_bitmask(mask, m, class_major=True)
        sq = jnp.sum((probs - targets) ** 2)
        return sq * 0.3 + jnp.sum(probs[:, :, -1].reshape(b * t, g) * w)

    gf = jax.grad(fused)(logits)
    go = jax.grad(oracle)(logits)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                               rtol=2e-4, atol=1e-6)


def test_fused_loss_matches_xla_path():
    """SELDLossFn.from_bitmask(fused='interpret') ~= the jnp path for the
    MSE and 3-term configs (values + gradients)."""
    from seld_tpu.config import GridConfig, LossConfig
    from seld_tpu.losses import SELDLossFn

    logits, mask = _loss_case(3, b=3, t=4)
    em = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    for use_aiur, use_cl in ((False, False), (True, True)):
        fn = SELDLossFn(
            LossConfig(loss_type="mse", use_aiur=use_aiur, use_cl=use_cl),
            GridConfig(),
        )
        ref = fn.from_bitmask(logits, mask, em, fused=False)
        got = fn.from_bitmask(logits, mask, em, fused="interpret")
        np.testing.assert_allclose(np.asarray(got.total),
                                   np.asarray(ref.total), rtol=1e-5)
        for k in ref.breakdown:
            np.testing.assert_allclose(
                np.asarray(got.breakdown[k]), np.asarray(ref.breakdown[k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )
        gf = jax.grad(lambda lg: fn.from_bitmask(lg, mask, em,
                                                 fused="interpret").total)(logits)
        go = jax.grad(lambda lg: fn.from_bitmask(lg, mask, em,
                                                 fused=False).total)(logits)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                                   rtol=2e-4, atol=1e-7)


def test_fused_loss_under_mesh_matches_unsharded():
    """The fused loss kernel runs under shard_map over the data axis of a
    mesh (row-sharded, collective-free) — values and gradients must match
    the unsharded interpret run on the 8-virtual-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seld_tpu.config import GridConfig, LossConfig
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    logits, mask = _loss_case(5, b=4, t=4)
    em = jnp.ones((4,), jnp.float32)
    fn = SELDLossFn(LossConfig(loss_type="mse", use_cl=True), GridConfig())

    ref = fn.from_bitmask(logits, mask, em, fused="interpret")
    lg = jax.device_put(logits, NamedSharding(mesh, P("data")))
    mk = jax.device_put(mask, NamedSharding(mesh, P("data")))
    got = jax.jit(
        lambda l, m: fn.from_bitmask(l, m, em, fused="interpret", mesh=mesh)
    )(lg, mk)
    np.testing.assert_allclose(np.asarray(got.total), np.asarray(ref.total),
                               rtol=1e-6)

    g_ref = jax.grad(lambda l: fn.from_bitmask(l, mask, em,
                                               fused="interpret").total)(logits)
    g_mesh = jax.jit(jax.grad(
        lambda l: fn.from_bitmask(l, mk, em, fused="interpret",
                                  mesh=mesh).total
    ))(lg)
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-8)


def test_train_step_mesh_uses_fused_loss_consistently():
    """A sharded make_train_step with the fused-interpret loss matches the
    unsharded XLA-loss step's loss value (the shard_map wiring end to
    end through out_state_shardings -> _mesh_of)."""
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.parallel import (
        batch_sharding, make_mesh, shard_variables, state_shardings,
    )
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn", "model.crnn_cnn_channels=8,16",
        "model.crnn_rnn_hidden=16", "model.crnn_rnn_layers=1",
        "model.compute_dtype=float32",
        "window.window_seconds=1.0", "window.hop_seconds=0.5",
        "train.batch_size=8",
    ])
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    mesh = make_mesh(n_data=4, n_model=2)
    model = build_model(cfg.model, cfg.grid)

    class FusedInterpretLoss(SELDLossFn):
        def from_bitmask(self, logits, label_mask, example_mask=None,
                         fused=None, mesh=None):
            return super().from_bitmask(
                logits, label_mask, example_mask,
                fused="interpret" if mesh is not None else False, mesh=mesh,
            )

    loss_fn = FusedInterpretLoss(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(8) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((8,), jnp.float32)

    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    ref_step = make_train_step(model, SELDLossFn(cfg.loss, cfg.grid), opt,
                               14, donate=False)
    _, ref_metrics = ref_step(state, mel, mask, em, jax.random.PRNGKey(7))

    state_m = shard_variables(state, mesh)
    shardings = state_shardings(state_m, mesh)
    step = make_train_step(model, loss_fn, opt, 14, donate=False,
                           out_state_shardings=shardings)
    melz = jax.device_put(mel, batch_sharding(mesh, mel.ndim))
    maskz = jax.device_put(mask, batch_sharding(mesh, mask.ndim))
    emz = jax.device_put(em, batch_sharding(mesh, 1))
    _, metrics = step(state_m, melz, maskz, emz, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)


def test_flash_attention_under_mesh_matches_einsum():
    """multi_head_attention with a scoped mesh runs the flash kernel
    inside shard_map over (b*h) rows; values must match the einsum path
    (and the (b*h)-indivisible case must fall back cleanly)."""
    from seld_tpu.ops.attention import attention_mesh, multi_head_attention
    from seld_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.default_rng(11)
    b, h, t, d = 2, 4, 512, 64  # b*h = 8, divisible by 4
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
               for _ in range(3))
    want = multi_head_attention(q, k, v, use_flash=False)

    # inputs need no pre-sharding: the shard_map inside the op
    # repartitions its (b*h, 1, t, d) view over the data axis
    with attention_mesh(mesh):
        got = jax.jit(lambda a, bb, c: multi_head_attention(
            a, bb, c, use_flash=True, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    # gradients flow through the shard_mapped custom-vjp kernel
    def loss_mesh(a):
        with attention_mesh(mesh):
            return jnp.sum(multi_head_attention(
                a, k, v, use_flash=True, interpret=True) ** 2)

    def loss_ref(a):
        return jnp.sum(multi_head_attention(a, k, v, use_flash=False) ** 2)

    g_mesh = jax.jit(jax.grad(loss_mesh))(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_ref),
                               rtol=3e-4, atol=3e-5)

    # indivisible (b*h=3) -> exact einsum fallback, still correct
    q2, k2, v2 = (jnp.asarray(rng.standard_normal((1, 3, 512, 64)),
                              jnp.float32) for _ in range(3))
    with attention_mesh(mesh):
        got2 = multi_head_attention(q2, k2, v2, use_flash=True,
                                    interpret=True)
    want2 = multi_head_attention(q2, k2, v2, use_flash=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-5)


def test_ring_attention_matches_einsum():
    """Sequence-parallel ring attention (flash kernels per time chunk,
    K/V rotating over the model axis via ppermute) must match the einsum
    oracle in values AND all three input gradients; indivisible T falls
    back to the GSPMD-partitionable einsum path."""
    from seld_tpu.ops.attention import attention_mesh, multi_head_attention
    from seld_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(3)
    b, h, t, d = 2, 4, 512, 64  # chunks of 128 over the 4-way model axis
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
               for _ in range(3))

    want = multi_head_attention(q, k, v, use_flash=False)
    with attention_mesh(mesh, time_sharded=True):
        got = jax.jit(lambda a, bb, c: multi_head_attention(
            a, bb, c, use_flash=True, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss_ring(a, bb, c):
        with attention_mesh(mesh, time_sharded=True):
            return jnp.sum(multi_head_attention(
                a, bb, c, use_flash=True, interpret=True) ** 2)

    def loss_ref(a, bb, c):
        return jnp.sum(multi_head_attention(a, bb, c, use_flash=False) ** 2)

    got_g = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    want_g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g_got, g_want in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=3e-4, atol=3e-4)

    # T=500 doesn't divide the 4-way model axis -> einsum fallback
    q2, k2, v2 = (jnp.asarray(rng.standard_normal((2, 4, 500, d)),
                              jnp.float32) for _ in range(3))
    with attention_mesh(mesh, time_sharded=True):
        got2 = multi_head_attention(q2, k2, v2, use_flash=True,
                                    interpret=True)
    want2 = multi_head_attention(q2, k2, v2, use_flash=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-5)


def test_ring_attention_in_sp_train_step(tmp_path, monkeypatch):
    """The production SP train step (out_state_shardings -> mesh handle,
    time_sharded=True) dispatches attention to the RING path and its
    loss matches the single-device step. force_flash(interpret) stands
    in for the TPU-only auto policy on the CPU test backend."""
    import seld_tpu.ops.ring_attention as ra
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data import synthetic_corpus
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.ops.attention import force_flash
    from seld_tpu.parallel import batch_sharding, make_mesh, shard_variables
    from seld_tpu.parallel.sharding import state_shardings, time_batch_sharding
    from seld_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = parse_overrides(
        Config(),
        ["model.model_type=conformer", "model.conf_d_model=32",
         "model.conf_n_heads=4", "model.conf_n_layers=1",
         "model.compute_dtype=float32", "window.window_seconds=1.0",
         "window.hop_seconds=0.5", "train.batch_size=4",
         f"data.base_path={tmp_path}"],
    )
    corpus = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(4) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((4,), jnp.float32)

    calls = []
    real = ra.ring_flash_attention

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(ra, "ring_flash_attention", spy)

    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    base_step = make_train_step(model, loss_fn, opt, 14, donate=False)
    _, base_met = base_step(state, mel, mask, em, jax.random.PRNGKey(7))
    assert not calls  # unsharded step never rings

    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    state_m = shard_variables(state, mesh, use_tp_rules=False)
    shardings = state_shardings(state_m, mesh, use_tp_rules=False)
    step = make_train_step(model, loss_fn, opt, 14, donate=False,
                           out_state_shardings=shardings, time_sharded=True)
    m = jax.device_put(mel, time_batch_sharding(mesh, mel.ndim))
    k = jax.device_put(mask, time_batch_sharding(mesh, mask.ndim))
    e = jax.device_put(em, batch_sharding(mesh, 1))
    with force_flash(True, interpret=True):
        _, met = step(state_m, m, k, e, jax.random.PRNGKey(7))
    assert calls, "ring attention did not engage in the SP step"
    np.testing.assert_allclose(float(met["loss"]), float(base_met["loss"]),
                               rtol=2e-4)


def test_ring_attention_bf16_within_documented_tolerance():
    """bfloat16 under the ring: each chunk's partial output is emitted in
    bf16 before the f32 merge, adding up to n chunk-roundings vs the
    einsum path — must stay within the documented bf16 noise bound."""
    from seld_tpu.ops.attention import attention_mesh, multi_head_attention
    from seld_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(11)
    b, h, t, d = 2, 4, 512, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
               for _ in range(3))
    want = multi_head_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        use_flash=False)
    with attention_mesh(mesh, time_sharded=True):
        got = jax.jit(lambda a, bb, c: multi_head_attention(
            a, bb, c, use_flash=True, interpret=True))(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want),
        rtol=0.05, atol=0.05)
