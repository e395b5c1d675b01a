"""Chip A/B after the class-major layout switch: production train step
(flagship resnet_conformer, b16) for MSE and 3-term losses, fused Pallas
loss vs the XLA (jnp) path.

Context: with the old class-minor (B, T, G, M) head layout the fused
kernel paid two ~145 MB transposes per step and won only ~1 ms (STATUS
round-3 fused-loss section: MSE 28.33 -> 27.26 ms). Class-major feeds
the kernel a pure reshape of the head output; this pins the new step
times with the same long-minus-short timing methodology.

Writes benchmarks/results/step_layout_ab.json.
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
    # One variant per process (pass it as argv[1]): re-initializing train
    # state after a donated-step run trips a tunnel-side INVALID_ARGUMENT.
    want = sys.argv[1] if len(sys.argv) > 1 else None
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config, parse_overrides
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

    def timed(step_fn):
        state = create_train_state(model, opt, rng, mel)

        class C:
            s = state

        def once(i):
            C.s, met = step_fn(C.s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return met["loss"]

        t0 = time.time()
        float(once(0))
        log(f"  compile+first {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(4):
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

    variants = {}
    for loss_name, overrides in (
        ("mse", []),
        ("3term", ["loss.use_aiur=true", "loss.use_cl=true"]),
    ):
        cfg = parse_overrides(Config(), overrides)
        loss_fn = SELDLossFn(cfg.loss, cfg.grid)
        for fused in (True, False):
            fl = SELDLossFn(cfg.loss, cfg.grid)
            if not fused:
                orig = fl.from_bitmask

                def unfused(*a, _o=orig, **k):
                    k["fused"] = False
                    return _o(*a, **k)

                fl.from_bitmask = unfused
            key = f"{loss_name}_{'fused' if fused else 'xla'}"
            if want is not None and key != want:
                continue
            log(f"[{key}]")
            step = make_train_step(model, fl, opt, 14, donate=True)
            best = timed(step)
            variants[key] = {
                "step_ms": round(best * 1e3, 2),
                "audio_s_per_s": round(B * 5.0 / best, 1),
            }
            log(f"[{key}] {best * 1e3:.2f} ms/step")
            print(json.dumps({key: variants[key]}), flush=True)

    out = RESULTS / "step_layout_ab.json"
    merged = json.loads(out.read_text()) if out.exists() else {}
    merged.update(variants)
    out.write_text(json.dumps(merged, indent=2) + "\n")


if __name__ == "__main__":
    main()
