"""Single-process confirmation of the fused-vs-XLA loss A/B after the
class-major layout switch (controls for tunnel drift): measures the
production MSE train step as xla -> fused -> xla in one process with
donate=False (re-initializing state after a donated run trips a
tunnel-side INVALID_ARGUMENT).

Writes benchmarks/results/step_fused_confirm.json.
Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
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
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    base = Config()
    model = build_model(base.model, base.grid)
    opt = make_optimizer(base.train.learning_rate, base.train.weight_decay)
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64), jnp.float32)
    mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((B,), jnp.float32)
    rng = jax.random.key(0, impl=base.train.prng_impl)
    state0 = create_train_state(model, opt, rng, mel)

    def make(fused):
        fl = SELDLossFn(base.loss, base.grid)
        orig = fl.from_bitmask

        def forced(*a, _o=orig, **k):
            k["fused"] = fused
            return _o(*a, **k)

        fl.from_bitmask = forced
        return make_train_step(model, fl, opt, 14, donate=False)

    steps = {"xla": make(False), "fused": make(True)}

    def timed(step_fn):
        s = state0

        def once(i):
            nonlocal s
            s, met = step_fn(s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return met["loss"]

        t0 = time.time()
        float(once(0))
        log(f"  compile+first {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(once(0))
            t1 = time.time() - t0
            t0 = time.time()
            out = None
            for i in range(11):
                out = once(i)
            float(out)
            t11 = time.time() - t0
            best = min(best, (t11 - t1) / 10)
        return best

    results = {}
    for name in ("xla", "fused", "xla2"):
        fn = steps["xla" if name.startswith("xla") else "fused"]
        log(f"[{name}]")
        best = timed(fn)
        results[name] = round(best * 1e3, 2)
        log(f"[{name}] {best * 1e3:.2f} ms/step")
        print(json.dumps({name: results[name]}), flush=True)

    (RESULTS / "step_fused_confirm.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
