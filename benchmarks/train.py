"""Train-step performance decomposition on the real TPU (diagnostic).

Brackets where the 36 ms flagship train step goes: forward-only vs
forward+backward vs full step (optimizer included), plus batch scaling.
Single process, runs to completion (killing TPU clients wedges the
tunneled grant).
"""

from __future__ import annotations

import sys
import time

from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config
from seld_tpu.losses import SELDLossFn
from seld_tpu.models import build_model
from seld_tpu.targets.rasterize import decode_class_bitmask
from seld_tpu.train import create_train_state, make_optimizer, make_train_step

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_python_chain(step_once, n_delta=10):
    """Time a jitted callable via python-loop dispatch + final scalar
    read-back. Valid on one in-order device: the last program's completion
    implies all prior programs completed (the tunneled backend's
    block_until_ready returns early, so we sync by fetching a scalar).
    Avoids giant fori-loop HLOs that the remote-compile endpoint rejects
    (HTTP 413)."""

    def run(n):
        out = None
        t0 = time.time()
        for i in range(n):
            out = step_once(i, out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf)) if leaf.ndim else float(leaf)
        return time.time() - t0

    run(1)  # compile
    t1 = run(1)
    t11 = run(1 + n_delta)
    return (t11 - t1) / n_delta


def main():
    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(1e-3)

    for batch in (16, 32):
        T = 250
        mel = jax.random.normal(jax.random.PRNGKey(0), (batch, T, 4, 64), jnp.float32)
        mask = jnp.zeros((batch, T, 648), jnp.int32).at[:, :, 100].set(8)
        em = jnp.ones((batch,), jnp.float32)
        state = create_train_state(model, opt, jax.random.PRNGKey(0), mel)
        rng = jax.random.PRNGKey(1)

        # (a) forward only
        fwd = jax.jit(
            lambda v, x: model.apply(v, x, train=False).mean()
        )
        variables = state.variables()

        def fwd_once(i, prev):
            x = mel + np.float32(i) * 1e-6
            return fwd(variables, x)

        t_fwd = timed_python_chain(fwd_once)
        log(f"B={batch} fwd-only: {t_fwd * 1e3:.2f} ms")

        # (b) forward + backward (no optimizer)
        targets = decode_class_bitmask(mask, 14, class_major=True)

        grad_fn = jax.jit(jax.grad(
            lambda p, x, tgt, m: loss_fn(
                model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )[0],
                tgt, m,
            ).total
        ))

        def bwd_once(i, prev):
            g = grad_fn(state.params, mel + np.float32(i) * 1e-6, targets, em)
            return jax.tree_util.tree_leaves(g)[0]

        t_bwd = timed_python_chain(bwd_once)
        log(f"B={batch} fwd+bwd:  {t_bwd * 1e3:.2f} ms")

        # (c) full train step (state chains through the loop)
        step = make_train_step(model, loss_fn, opt, 14, donate=False)

        class Carrier:
            s = state

        def step_once(i, prev):
            Carrier.s, met = step(
                Carrier.s, mel + np.float32(i) * 1e-6, mask, em, rng
            )
            return met["loss"]

        t_step = timed_python_chain(step_once)
        thr = batch * 5.0 / t_step
        log(
            f"B={batch} full step: {t_step * 1e3:.2f} ms "
            f"(optimizer+loss {1e3 * (t_step - t_bwd):.2f} ms) -> {thr:.0f} audio-s/s"
        )


if __name__ == "__main__":
    main()
