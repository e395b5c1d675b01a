"""ROW_BLOCK tuning for the fused grid-loss kernel (one chip session).

Times the full b16 MSE train step with the fused loss at several row
blocks. Writes benchmarks/results/loss_block_tune.json.
Run in background; NEVER timeout-kill.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
B, T = 16, 250


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.state import TrainState
    from seld_tpu.ops import loss_pallas

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64), jnp.float32)
    mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((B,), jnp.float32)
    rng = jax.random.key(0, impl=cfg.train.prng_impl)
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)

    def make_step():
        def step(state, mel, label_mask, example_mask, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)

            def loss_of(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out, updates = model.apply(
                    variables, mel,
                    mutable=["batch_stats"] if state.batch_stats else [],
                    rngs={"dropout": dropout_rng}, train=True,
                )
                total, _ = loss_fn.from_bitmask(out, label_mask,
                                                example_mask, fused=True)
                return total, updates.get("batch_stats", state.batch_stats)

            (total, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates
            )
            return TrainState(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), total

        return jax.jit(step)

    results = {}
    for rb in (16, 32, 64, 128, 256):
      try:
          loss_pallas.ROW_BLOCK = rb
          state = create_train_state(model, opt, rng, mel)
          step = make_step()

          class C:
              s = state

          def once(i):
              C.s, tot = step(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
              return tot

          t0 = time.time()
          float(once(0))
          log(f"[rb{rb}] compile+first {time.time() - t0:.1f}s")

          def run(n):
              t0 = time.time()
              out = None
              for i in range(n):
                  out = once(i)
              float(out)
              return time.time() - t0

          best = float("inf")
          for _ in range(3):
              t1, t11 = run(1), run(11)
              best = min(best, (t11 - t1) / 10)
          results[rb] = round(best * 1e3, 2)
          log(f"[rb{rb}] {best * 1e3:.2f} ms/step")
          print(json.dumps({rb: results[rb]}), flush=True)
      except Exception as e:
          results[rb] = f"failed: {type(e).__name__}: {str(e)[:120]}"
          log(f"[rb{rb}] FAILED {e}")

    (RESULTS / "loss_block_tune.json").write_text(
        json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
