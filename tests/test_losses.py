"""Golden tests for the composite loss against torch oracles that restate
the reference math (ref loss.py:6-172)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from seld_tpu.config import GridConfig, LossConfig
from seld_tpu.losses import (
    SELDLossFn,
    aiur_loss,
    class_ce_loss,
    class_mse_loss,
    converging_localization_loss,
    make_class_weights,
)

B, T, I, J, M = 2, 3, 18, 36, 14
G = I * J


def cm(a):
    """Class-minor (..., G, M) oracle layout -> the library's class-major
    (..., M, G)."""
    return np.ascontiguousarray(np.swapaxes(a, -1, -2))


def random_batch(rng, peaked=True):
    logits = rng.standard_normal((B, T, G, M)).astype(np.float32)
    labels = np.zeros((B, T, G, M), np.float32)
    cls = rng.integers(0, M, (B, T, G))
    # mostly background with sparse events, like real targets
    cls = np.where(rng.random((B, T, G)) < 0.9, M - 1, cls)
    for b in range(B):
        for t in range(T):
            labels[b, t, np.arange(G), cls[b, t]] = 1.0
    return logits, labels


# ---- torch oracles (restating ref loss.py formulas) ----

def torch_ce(logits, labels, weights=None):
    yp = torch.from_numpy(logits).view(-1, M)
    yt = torch.from_numpy(labels).argmax(-1).view(-1)
    w = torch.from_numpy(np.asarray(weights)) if weights is not None else None
    return torch.nn.CrossEntropyLoss(weight=w)(yp, yt).item()


def torch_mse(logits, labels):
    yp = tF.softmax(torch.from_numpy(logits), dim=-1)
    return tF.mse_loss(yp, torch.from_numpy(labels)).item()


def torch_aiur(logits, labels):
    yp = torch.from_numpy(logits)
    yt = torch.from_numpy(labels)
    bg = M - 1
    pm = (yp.argmax(-1) != bg).float()
    tm = (yt.argmax(-1) != bg).float()
    inter = (pm * tm).sum(-1)
    union = pm.sum(-1) + tm.sum(-1) - inter
    iou = inter / (union + 1e-8)
    iou = torch.where(union > 0, iou, torch.ones_like(iou))
    return (1.0 - iou.mean()).item()


def torch_cl(logits, labels):
    eps = 1e-10
    yp = tF.softmax(torch.from_numpy(logits), dim=-1).view(B, T, I, J, M)
    yt = torch.from_numpy(labels).view(B, T, I, J, M)
    true_nonbg = yt[..., :-1].sum(-1)
    pred_nonbg = yp[..., :-1].sum(-1)
    n_bac = (true_nonbg < 0.01).sum(dim=(2, 3), keepdim=True).float()
    n_non = (true_nonbg > 0.01).sum(dim=(2, 3), keepdim=True).float()
    y_prime = torch.ones_like(true_nonbg)
    ratio = -(n_bac / (n_non + eps))
    y_prime = torch.where(true_nonbg > 0.01, ratio.expand_as(true_nonbg), y_prime)
    ypad = tF.pad(y_prime, (1, 1, 1, 1), mode="circular")
    diff = torch.zeros_like(y_prime)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            diff += ypad[:, :, 1 + di : I + 1 + di, 1 + dj : J + 1 + dj] - y_prime
    y_at = y_prime + diff / 8.0
    has = (n_non > 0).float()
    weighted = pred_nonbg * y_at * has
    denom = has.sum() * I * J + eps
    return (weighted.sum() / denom).item()


def test_ce_matches_torch(rng):
    logits, labels = random_batch(rng)
    got = float(class_ce_loss(cm(logits), cm(labels)))
    assert got == pytest.approx(torch_ce(logits, labels), rel=1e-5)


def test_weighted_ce_matches_torch(rng):
    logits, labels = random_batch(rng)
    w = np.asarray(make_class_weights(M, 0.05))
    got = float(class_ce_loss(cm(logits), cm(labels), class_weights=np.asarray(w)))
    assert got == pytest.approx(torch_ce(logits, labels, w), rel=1e-5)


def test_mse_matches_torch(rng):
    logits, labels = random_batch(rng)
    got = float(class_mse_loss(cm(logits), cm(labels)))
    assert got == pytest.approx(torch_mse(logits, labels), rel=1e-5)


def test_aiur_matches_torch(rng):
    logits, labels = random_batch(rng)
    got = float(aiur_loss(cm(logits), cm(labels)))
    assert got == pytest.approx(torch_aiur(logits, labels), rel=1e-5)


def test_aiur_empty_vs_empty_is_perfect():
    # All-background preds and labels: IoU := 1 -> loss 0 (ref loss.py:80-82)
    logits = np.zeros((1, 1, G, M), np.float32)
    logits[..., M - 1] = 10.0
    labels = np.zeros((1, 1, G, M), np.float32)
    labels[..., M - 1] = 1.0
    assert float(aiur_loss(cm(logits), cm(labels))) == pytest.approx(0.0, abs=1e-6)


def test_cl_matches_torch(rng):
    logits, labels = random_batch(rng)
    got = float(converging_localization_loss(cm(logits), cm(labels), I, J))
    assert got == pytest.approx(torch_cl(logits, labels), rel=1e-4, abs=1e-7)


def test_cl_no_event_frames_is_zero():
    logits = np.random.default_rng(1).standard_normal((1, 2, G, M)).astype(np.float32)
    labels = np.zeros((1, 2, G, M), np.float32)
    labels[..., M - 1] = 1.0
    got = float(converging_localization_loss(cm(logits), cm(labels), I, J))
    assert got == pytest.approx(0.0, abs=1e-6)


def test_composite_modes(rng):
    logits, labels = random_batch(rng)
    grid = GridConfig()
    # modular mode: class term only (ref loss.py:166)
    fn = SELDLossFn(LossConfig(loss_type="mse"), grid)
    total, bd = fn(cm(logits), cm(labels))
    assert set(bd) == {"class_mse"}
    assert float(total) == pytest.approx(float(bd["class_mse"]))
    # monolith mode: all three (ref smrl_seld_gaussian.py:1059-1070)
    fn3 = SELDLossFn(
        LossConfig(loss_type="mse", use_aiur=True, use_cl=True, w_aiur=1.0, w_cl=1.0),
        grid,
    )
    total3, bd3 = fn3(cm(logits), cm(labels))
    assert set(bd3) == {"class_mse", "aiur", "cl"}
    expected = float(bd3["class_mse"]) + float(bd3["aiur"]) + float(bd3["cl"])
    assert float(total3) == pytest.approx(expected, rel=1e-6)


def test_loss_weights_scale_terms(rng):
    # w_class/w_aiur/w_cl weight the composite sum (ref loss.py:163-166)
    logits, labels = random_batch(rng)
    base = SELDLossFn(
        LossConfig(loss_type="mse", use_aiur=True, use_cl=True), GridConfig()
    )
    _, bd = base(cm(logits), cm(labels))
    weighted = SELDLossFn(
        LossConfig(loss_type="mse", use_aiur=True, use_cl=True,
                   w_class=2.0, w_aiur=0.5, w_cl=0.25),
        GridConfig(),
    )
    total, _ = weighted(cm(logits), cm(labels))
    expect = 2.0 * float(bd["class_mse"]) + 0.5 * float(bd["aiur"]) \
        + 0.25 * float(bd["cl"])
    assert float(total) == pytest.approx(expect, rel=1e-6)


def test_loss_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    logits, labels = random_batch(rng)
    fn = SELDLossFn(
        LossConfig(loss_type="mse", use_aiur=True, use_cl=True), GridConfig()
    )
    g = jax.grad(lambda lo: fn(lo, jnp.asarray(cm(labels))).total)(
        jnp.asarray(cm(logits))
    )
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0.0


def test_example_masking_equals_unpadded(rng):
    # A padded batch with a validity mask must produce the exact loss of
    # the unpadded batch (static-shape tail batches, data.sampler).
    logits, labels = random_batch(rng)
    fn = SELDLossFn(
        LossConfig(loss_type="ce", use_aiur=True, use_cl=True), GridConfig()
    )
    want, _ = fn(cm(logits[:1]), cm(labels[:1]))
    padded_logits = np.concatenate([logits[:1], logits[1:]], axis=0)
    padded_labels = np.concatenate([labels[:1], labels[1:]], axis=0)
    mask = np.array([1.0, 0.0], np.float32)
    got, _ = fn(cm(padded_logits), cm(padded_labels), example_mask=mask)
    assert float(got) == pytest.approx(float(want), rel=1e-6)


def test_ce_mode_uses_background_downweight(rng):
    logits, labels = random_batch(rng)
    fn = SELDLossFn(LossConfig(loss_type="ce"), GridConfig())
    total, bd = fn(cm(logits), cm(labels))
    w = np.asarray(make_class_weights(M, 0.05))
    assert float(total) == pytest.approx(torch_ce(logits, labels, w), rel=1e-5)


def test_bitmask_native_terms_match_dense(rng):
    """from_bitmask (the jitted steps' path) must be VALUE-IDENTICAL to
    __call__ on decode_class_bitmask targets — same elementwise ops, so
    exact equality, for every loss mode (round-3 train-step optimization)."""
    import jax.numpy as jnp

    from seld_tpu.losses import SELDLossFn
    from seld_tpu.targets.rasterize import decode_class_bitmask

    b, t, g, m = 3, 7, 648, 14
    logits = jnp.asarray(rng.standard_normal((b, t, m, g)), jnp.float32)
    # random multi-hot bitmasks incl. empty cells and multi-class cells
    mask_np = np.where(
        rng.random((b, t, g)) < 0.9, 0,
        rng.integers(1, 2 ** (m - 1), (b, t, g)),
    ).astype(np.uint16)
    mask = jnp.asarray(mask_np)
    em = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)  # padded example

    for loss_type in ("mse", "ce"):
        for use_aiur, use_cl in ((False, False), (True, True)):
            cfg = LossConfig(loss_type=loss_type, use_aiur=use_aiur,
                             use_cl=use_cl)
            fn = SELDLossFn(cfg, GridConfig())
            dense = fn(
                logits, decode_class_bitmask(mask, m, class_major=True), em
            )
            bits = fn.from_bitmask(logits, mask, em)
            np.testing.assert_array_equal(
                np.asarray(dense.total), np.asarray(bits.total),
                err_msg=f"{loss_type} aiur={use_aiur} cl={use_cl}",
            )
            for k in dense.breakdown:
                np.testing.assert_array_equal(
                    np.asarray(dense.breakdown[k]),
                    np.asarray(bits.breakdown[k]), err_msg=k,
                )


def test_bit_labels_match_dense_argmax(rng):
    """_bit_labels == argmax(decode_class_bitmask) for arbitrary masks
    (multi-hot ties resolve to the lowest set bit, empty -> background)."""
    import jax.numpy as jnp

    from seld_tpu.losses.seld_loss import _bit_labels
    from seld_tpu.targets.rasterize import decode_class_bitmask

    mask_np = rng.integers(0, 2 ** 13, (5, 11, 648)).astype(np.uint16)
    mask = jnp.asarray(mask_np)
    dense = np.argmax(np.asarray(decode_class_bitmask(mask, 14)), axis=-1)
    np.testing.assert_array_equal(np.asarray(_bit_labels(mask, 14)), dense)
