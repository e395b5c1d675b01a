"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
mesh construction, partition rules, and a real dp x tp train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from seld_tpu.config import Config, parse_overrides
from seld_tpu.data import synthetic_corpus
from seld_tpu.losses import SELDLossFn
from seld_tpu.models import build_model
from seld_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_variables,
)
from seld_tpu.train import create_train_state, make_optimizer, make_train_step


def small_cfg(tmp_path, model="conformer"):
    return parse_overrides(
        Config(),
        [
            f"model.model_type={model}",
            "model.crnn_cnn_channels=8,16",
            "model.conf_d_model=32",
            "model.conf_n_heads=4",
            "model.conf_n_layers=1",
            "model.compute_dtype=float32",
            "window.window_seconds=1.0",
            "window.hop_seconds=0.5",
            "train.batch_size=8",
            f"data.base_path={tmp_path}",
        ],
    )


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(n_data=4, n_model=2)
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == ("data", "model")


def test_partition_rules():
    assert param_partition_spec("block_0/MultiHeadSelfAttention_0/w_q/kernel", 2) == P(None, "model")
    assert param_partition_spec("block_0/MultiHeadSelfAttention_0/w_o/kernel", 2) == P("model", None)
    assert param_partition_spec("block_1/FeedForward_0/Dense_0/kernel", 2) == P(None, "model")
    assert param_partition_spec("block_1/FeedForward_0/Dense_1/kernel", 2) == P("model", None)
    # DenseGeneral kernel (hidden, M, G): shard the grid-cell axis
    assert param_partition_spec("GridHead_0/logits/kernel", 3) == P(
        None, None, "model"
    )
    assert param_partition_spec("stem/kernel", 4) == P()
    assert param_partition_spec("BatchNorm_0/scale", 1) == P()


def run_steps(cfg, mesh, corpus, n_steps=2, shard_params=False):
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(8) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((8,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    if mesh is not None:
        state = shard_variables(state, mesh, shard_params=shard_params)
        mel = jax.device_put(mel, batch_sharding(mesh, mel.ndim))
        mask = jax.device_put(mask, batch_sharding(mesh, mask.ndim))
        em = jax.device_put(em, batch_sharding(mesh, 1))
    step = make_train_step(model, loss_fn, opt, cfg.grid.num_classes, donate=False)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, mel, mask, em, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    return state, losses


def test_dp_tp_step_matches_single_device(tmp_path):
    """The same batch must produce the same losses on 1 device, a pure-DP
    8-way mesh, and a 4x2 dp x tp mesh (XLA collectives are exact for
    these shapes in f32)."""
    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)

    _, base = run_steps(cfg, None, corpus)
    _, dp = run_steps(cfg, make_mesh(n_data=8, n_model=1), corpus)
    _, dptp = run_steps(cfg, make_mesh(n_data=4, n_model=2), corpus)

    np.testing.assert_allclose(dp, base, rtol=2e-4)
    np.testing.assert_allclose(dptp, base, rtol=2e-4)


def test_tp4_step_matches_single_device(tmp_path):
    """Tensor parallelism past n_model=2 (VERDICT r2 #8): a 2x4 dp x tp
    mesh (4 heads / d_ff / 9072-wide grid head all divide by 4) matches
    the single-device losses."""
    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)

    _, base = run_steps(cfg, None, corpus)
    _, dptp4 = run_steps(cfg, make_mesh(n_data=2, n_model=4), corpus)
    np.testing.assert_allclose(dptp4, base, rtol=2e-4)


def test_fsdp_step_matches_single_device(tmp_path, monkeypatch):
    """ZeRO-3/FSDP (mesh.shard_params): large replicated leaves shard
    over the data axis — params, gradients, and moments live 1/n_data
    per chip while GSPMD all-gathers each param at its use — and the
    losses stay identical to the single-device run. The size floor is
    lowered so the tiny test model has FSDP-eligible leaves."""
    from seld_tpu.parallel import sharding as sh

    monkeypatch.setattr(sh, "FSDP_MIN_LEAF_ELEMENTS", 512)
    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)

    _, base = run_steps(cfg, None, corpus)
    s_fsdp, fsdp = run_steps(
        cfg, make_mesh(n_data=8, n_model=1), corpus, shard_params=True
    )
    np.testing.assert_allclose(fsdp, base, rtol=2e-4)

    # dp x tp composition: TP rules take precedence, the rest shards FSDP
    _, both = run_steps(
        cfg, make_mesh(n_data=4, n_model=2), corpus, shard_params=True
    )
    np.testing.assert_allclose(both, base, rtol=2e-4)


def test_fsdp_placement(tmp_path, monkeypatch):
    """shard_variables(shard_params=True) must actually shard large
    replicated leaves (params AND their Adam moments) over the data
    axis, and leave small leaves (BN scale/stats) replicated."""
    from seld_tpu.parallel import sharding as sh
    from seld_tpu.parallel.sharding import path_of

    monkeypatch.setattr(sh, "FSDP_MIN_LEAF_ELEMENTS", 512)
    cfg = small_cfg(tmp_path)
    mesh = make_mesh(n_data=8, n_model=1)
    model = build_model(cfg.model, cfg.grid)
    mel = jnp.zeros((8, 50, 4, 64), jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    placed = shard_variables(state, mesh, shard_params=True)

    def spec_by_suffix(tree, suffix):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if path_of(kp).endswith(suffix):
                return leaf.sharding.spec, leaf.shape
        raise AssertionError(f"no leaf matching {suffix}")

    # a conv kernel >= the floor: sharded over 'data' on some dim
    spec, shape = spec_by_suffix(placed.params, "ConvBlock_1/Conv_0/kernel")
    assert "data" in str(spec), (spec, shape)
    # its Adam first moment mirrors the param sharding
    mspec, _ = spec_by_suffix(placed.opt_state, "ConvBlock_1/Conv_0/kernel")
    assert mspec == spec
    # small norm leaves stay replicated
    bspec, bshape = spec_by_suffix(placed.params, "BatchNorm_0/scale")
    assert "data" not in str(bspec), (bspec, bshape)


def test_indivisible_tp_raises_named_error(tmp_path):
    """A model-axis size that does not divide the layer widths must fail
    fast with a named error, not a silent GSPMD pad/reshard."""
    cfg = small_cfg(tmp_path)  # conf_d_model=32: not divisible by 3
    mesh = make_mesh(n_data=2, n_model=3)
    model = build_model(cfg.model, cfg.grid)
    from seld_tpu.models import init_variables

    variables = init_variables(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 50, 4, 64), jnp.float32)
    )
    with pytest.raises(ValueError, match=r"not divisible by mesh axis 'model'=3"):
        shard_variables(variables["params"], mesh)
    from seld_tpu.parallel import state_shardings

    with pytest.raises(ValueError, match="w_q/kernel"):
        state_shardings(variables["params"], mesh)


def test_tp_params_actually_sharded(tmp_path):
    cfg = small_cfg(tmp_path)
    mesh = make_mesh(n_data=4, n_model=2)
    model = build_model(cfg.model, cfg.grid)
    mel = jnp.zeros((8, 50, 4, 64), jnp.float32)
    from seld_tpu.models import init_variables

    variables = init_variables(model, jax.random.PRNGKey(0), mel)
    sharded = shard_variables(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    tp_shards = 0
    for key_path, leaf in flat:
        path = "/".join(getattr(k, "key", str(k)) for k in key_path)
        spec = leaf.sharding.spec
        if "w_q/kernel" in path:
            assert spec == P(None, "model"), path
            tp_shards += 1
        if "logits/kernel" in path:
            assert spec == P(None, None, "model"), path
            tp_shards += 1
        if "w_o/kernel" in path:
            assert spec == P("model", None), path
            tp_shards += 1
    assert tp_shards >= 3


def test_zero_opt_state_sharding(tmp_path):
    """ZeRO-1: Adam moments shard over the data axis; one step matches
    the unsharded step's loss and keeps the moment shardings."""
    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    mesh = make_mesh(n_data=4, n_model=2)

    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(8) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((8,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)

    from seld_tpu.parallel import state_shardings
    from seld_tpu.parallel.sharding import path_of

    state_z = shard_variables(state, mesh, zero_opt_state=True)
    shardings = state_shardings(state_z, mesh, zero_opt_state=True)

    # moments must actually be sharded over data
    flat = jax.tree_util.tree_flatten_with_path(state_z.opt_state)[0]
    n_sharded = 0
    for kp, leaf in flat:
        path = path_of(kp)
        if ("/mu/" in path or "/nu/" in path) and hasattr(leaf, "sharding"):
            if "data" in str(leaf.sharding.spec):
                n_sharded += 1
    assert n_sharded > 0

    step = make_train_step(
        model, loss_fn, opt, cfg.grid.num_classes, donate=False,
        out_state_shardings=shardings,
    )
    melz = jax.device_put(mel, batch_sharding(mesh, mel.ndim))
    maskz = jax.device_put(mask, batch_sharding(mesh, mask.ndim))
    emz = jax.device_put(em, batch_sharding(mesh, 1))
    new_state, metrics = step(state_z, melz, maskz, emz, jax.random.PRNGKey(7))

    # loss parity vs unsharded
    step_ref = make_train_step(model, loss_fn, opt, cfg.grid.num_classes, donate=False)
    _, metrics_ref = step_ref(state, mel, mask, em, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=2e-4
    )
    # output moments keep the ZeRO sharding
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.opt_state)[0]
    for kp, leaf in flat_new:
        path = path_of(kp)
        if "/mu/" in path and leaf.ndim >= 1 and leaf.shape[0] % 4 == 0:
            assert "data" in str(leaf.sharding.spec), path
            break


def test_trainer_runs_under_mesh(tmp_path):
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        small_cfg(tmp_path), ["train.num_epochs=1", "train.batch_size=8"]
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=1)
    mesh = make_mesh(n_data=4, n_model=2)
    state, history = train_model(
        cfg, train_c, test_c, mesh=mesh, workdir=tmp_path / "ckpt"
    )
    assert np.isfinite(history["train_losses"][0])

    # distributed eval over the same mesh matches single-device eval
    r_mesh = evaluate_model(
        cfg, test_c, tmp_path / "ckpt", num_visualizations=0, mesh=mesh
    )
    r_single = evaluate_model(
        cfg, test_c, tmp_path / "ckpt", num_visualizations=0
    )
    assert r_mesh["test_loss"] == pytest.approx(r_single["test_loss"], rel=2e-4)
    assert r_mesh["overall_accuracy"] == pytest.approx(
        r_single["overall_accuracy"], abs=1e-6
    )


def test_batchnorm_is_sync_bn_under_dp(tmp_path):
    """BatchNorm-under-DP decision (SURVEY §7(f)), pinned: under GSPMD the
    batch-stat reductions span the full global batch — i.e. synchronous
    BatchNorm. The updated running statistics of a mesh-sharded train step
    must therefore equal the single-device run exactly (up to f32
    reduction reassociation), unlike per-replica BN which would average
    different sub-batches. Documented in PARITY.md C16."""
    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)

    s_base, _ = run_steps(cfg, None, corpus)
    s_dp, _ = run_steps(cfg, make_mesh(n_data=8, n_model=1), corpus)

    base_leaves = jax.tree_util.tree_leaves_with_path(s_base.batch_stats)
    dp_stats = s_dp.batch_stats
    assert base_leaves, "model under test must carry batch_stats"
    for key_path, leaf in base_leaves:
        dp_leaf = dp_stats
        for k in key_path:
            dp_leaf = dp_leaf[getattr(k, "key", k)]
        # Tolerance: f32 reduction reassociation feeds back through the
        # weight updates over the multi-step run (~2e-6 absolute drift
        # observed); per-replica BN would diverge at percent level.
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(leaf), rtol=1e-4, atol=1e-5,
            err_msg="/".join(getattr(k, "key", str(k)) for k in key_path),
        )


def test_grad_accumulation_under_mesh(tmp_path):
    """accum_steps composes with a dp x tp mesh: the scanned microbatch
    step runs sharded and lands within dropout/BN-microbatch tolerance
    of the single-device full-batch loss."""
    from seld_tpu.train.steps import make_train_step as mts

    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(8) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((8,), jnp.float32)

    def run(mesh, accum):
        m, k, e = mel, mask, em
        state = create_train_state(model, opt, jax.random.PRNGKey(0), m)
        if mesh is not None:
            state = shard_variables(state, mesh)
            m = jax.device_put(m, batch_sharding(mesh, m.ndim))
            k = jax.device_put(k, batch_sharding(mesh, k.ndim))
            e = jax.device_put(e, batch_sharding(mesh, 1))
        step = mts(model, loss_fn, opt, 14, donate=False, accum_steps=accum)
        _, met = step(state, m, k, e, jax.random.PRNGKey(7))
        return float(met["loss"])

    base = run(None, 1)
    mesh_acc = run(make_mesh(n_data=4, n_model=2), 2)
    assert mesh_acc == pytest.approx(base, rel=5e-3)


def test_trainer_fsdp_wiring(tmp_path, monkeypatch):
    """cfg.mesh.shard_params flows through train_model (the CLI/config
    surface for FSDP), on a 2-device mesh the 1-core host can schedule."""
    from seld_tpu.parallel import sharding as sh
    from seld_tpu.train import train_model

    monkeypatch.setattr(sh, "FSDP_MIN_LEAF_ELEMENTS", 512)
    cfg = parse_overrides(
        small_cfg(tmp_path),
        ["train.num_epochs=1", "train.batch_size=4",
         "mesh.shard_params=true"],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    _, hist = train_model(cfg, train_c, test_c, mesh=mesh,
                          workdir=tmp_path / "ckpt")
    assert np.isfinite(hist["train_losses"][0])


def test_time_sharding_step_matches_single_device(tmp_path):
    """Sequence parallelism: batch over 'data' AND time over 'model'
    (TP weight rules off, einsum attention) — GSPMD partitions convs/
    attention/losses over time, and the losses match the single-device
    run."""
    from seld_tpu.parallel.sharding import time_batch_sharding
    from seld_tpu.train.steps import make_train_step as mts

    cfg = small_cfg(tmp_path)
    corpus = synthetic_corpus(cfg, n_files=1, seconds=4.0, seed=0)
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    mel_np, mask_np = corpus.gather(np.arange(8) % len(corpus))
    mel, mask = jnp.asarray(mel_np), jnp.asarray(mask_np)
    em = jnp.ones((8,), jnp.float32)

    def run(mesh):
        m, k, e = mel, mask, em
        state = create_train_state(model, opt, jax.random.PRNGKey(0), m)
        ts = mesh is not None
        if mesh is not None:
            state = shard_variables(state, mesh, use_tp_rules=False)
            m = jax.device_put(m, time_batch_sharding(mesh, m.ndim))
            k = jax.device_put(k, time_batch_sharding(mesh, k.ndim))
            e = jax.device_put(e, batch_sharding(mesh, 1))
        step = mts(model, loss_fn, opt, 14, donate=False, time_sharded=ts)
        losses = []
        state0 = state
        for _ in range(2):
            state0, met = step(state0, m, k, e, jax.random.PRNGKey(7))
            losses.append(float(met["loss"]))
        return losses

    base = run(None)
    sp = run(make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4]))
    np.testing.assert_allclose(sp, base, rtol=2e-4)


def test_time_sharding_trainer(tmp_path):
    """mesh.shard_time flows through train_model (conformer OK, crnn is
    a named error)."""
    from seld_tpu.train import train_model

    cfg = parse_overrides(
        small_cfg(tmp_path),
        ["train.num_epochs=1", "train.batch_size=4", "mesh.shard_time=true"],
    )
    train_c = synthetic_corpus(cfg, n_files=1, seconds=3.0, seed=0)
    test_c = synthetic_corpus(cfg, n_files=1, seconds=2.0, seed=1)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    _, hist = train_model(cfg, train_c, test_c, mesh=mesh,
                          workdir=tmp_path / "ckpt")
    assert np.isfinite(hist["train_losses"][0])

    bad = parse_overrides(cfg, ["model.model_type=crnn"])
    with pytest.raises(ValueError, match="shard_time is unsupported"):
        train_model(bad, train_c, test_c, mesh=mesh,
                    workdir=tmp_path / "ckpt2")
