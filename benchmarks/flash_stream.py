"""Streamed-block flash attention: chip validation + perf (round 3).

VERDICT r2 #7: the round-2 kernels kept whole padded K/V (and Q/dO)
operands VMEM-resident, capping validated T at 8192. The round-3 kernels
stream every reduction operand via index-mapped BlockSpecs on a third
grid dimension. This script, on the real v5e chip:

1. Numerics: Pallas backward vs einsum VJP oracle at T=1024.
2. Perf: fwd+bwd wall time at T=2048/4096/8192/16384 (bf16).
3. Capability: conformer TRAINING step at T=16384 (5.5 min of audio per
   attention window; the einsum VJP would need a ~32 GB probability
   tensor at these shapes).

Writes benchmarks/results/flash_stream_tpu.json.
Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(fn, n_delta=10, reps=2):
    def run(n):
        out = None
        t0 = time.time()
        for i in range(n):
            out = fn(i)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))  # sync via scalar read-back (block_until_ready lies)
        return time.time() - t0

    run(1)
    best = float("inf")
    for _ in range(reps):
        t1 = run(1)
        t11 = run(1 + n_delta)
        best = min(best, (t11 - t1) / n_delta)
    return best * 1e3


def main():
    from seld_tpu.ops.flash_attention import flash_attention

    results = {}

    # --- 1. numerics at T=1024 ---
    b, h, t, d = 2, 4, 1024, 64
    rng = np.random.default_rng(0)
    q, k, v, g = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(4)
    )

    def grads(bwd_impl):
        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, bwd_impl=bwd_impl) * g)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    gp = grads("pallas")
    gx = grads("xla")
    errs = {}
    for name, a, bb in zip(("dq", "dk", "dv"), gp, gx):
        a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
        rel = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-12)
        errs[name] = float(rel)
        log(f"T=1024 {name}: max rel err {rel:.2e}")
    assert max(errs.values()) < 5e-3, errs  # bf16-MXU noise floor (CLAUDE.md)
    results["numerics_T1024_max_rel_err"] = errs

    # --- 2. perf sweep (bf16, the training dtype) ---
    for t2 in (2048, 4096, 8192, 16384):
        q2, k2, v2, g2 = (
            jnp.asarray(rng.standard_normal((2, 4, t2, 64)), jnp.bfloat16)
            for _ in range(4)
        )

        def make():
            def loss(q, k, v):
                return jnp.sum(
                    flash_attention(q, k, v).astype(jnp.float32)
                    * g2.astype(jnp.float32)
                )

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            return lambda i: gfn(q2 + jnp.bfloat16(i * 0.001), k2, v2)

        ms = timed_chain(make())
        results[f"fwdbwd_ms_T{t2}"] = round(ms, 3)
        log(f"T={t2} fwd+bwd pallas: {ms:.2f} ms")

    # --- 3. T=16384 conformer training step ---
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = parse_overrides(Config(), ["model.model_type=conformer"])
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)
    T = 16384
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, T, 4, 64), jnp.float32)
    mask = jnp.zeros((1, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((1,), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
    step = make_train_step(model, loss_fn, opt, 14, donate=False)
    t0 = time.time()
    state, metrics = step(state, mel, mask, em, jax.random.PRNGKey(1))
    loss0 = float(metrics["loss"])
    log(f"T=16384 train step: compile+run {time.time() - t0:.1f}s loss {loss0:.4f}")
    losses = [loss0]
    for _ in range(4):
        state, metrics = step(state, mel, mask, em, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    results["train_T16384_losses"] = [round(x, 5) for x in losses]
    log(f"T=16384 losses: {losses}")

    out = REPO / "benchmarks" / "results" / "flash_stream_tpu.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()


