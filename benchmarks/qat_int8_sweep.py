"""Chip numbers for the late-round quantization features.

1. QAT train-step overhead at b16 (flagship, MSE loss): the fake-quant
   elementwise passes + STE vs the plain step.
2. Int8 serving pipeline batch sweep (b8/16/24/32): does the int8 path
   keep bf16's flat b8-24 per-window optimum?

Writes benchmarks/results/qat_int8_sweep.json.
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
T, WINDOW_S, SR = 250, 5.0, 24000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import Config
    from seld_tpu.features import frame_signal
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.models import build_model, init_variables
    from seld_tpu.ops.mel_pallas import log_mel_frames_pallas
    from seld_tpu.quant import quantize_model, quantized_apply
    from seld_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    results: dict = {}

    # --- 1. QAT step overhead @ b16 ------------------------------------
    B = 16
    loss_fn = SELDLossFn(cfg.loss, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    mel = jax.random.normal(jax.random.PRNGKey(0), (B, T, 4, 64), jnp.float32)
    mask = jnp.zeros((B, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((B,), jnp.float32)
    rng = jax.random.key(0, impl=cfg.train.prng_impl)

    for name, qat in (("train_plain", False), ("train_qat", True)):
        state = create_train_state(model, opt, rng, mel)
        step = make_train_step(model, loss_fn, opt, 14, donate=False, qat=qat)

        def once(i, s):
            s, met = step(s, mel + np.float32(i) * 1e-6, mask, em, rng)
            return s, met["loss"]

        t0 = time.time()
        state, loss = once(0, state)
        log(f"[{name}] compile+first {time.time() - t0:.1f}s "
            f"loss {float(loss):.4f}")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, l1 = once(0, state)
            float(l1)
            t1 = time.time() - t0
            t0 = time.time()
            out = None
            for i in range(11):
                _, out = once(i, state)
            float(out)
            t11 = time.time() - t0
            best = min(best, (t11 - t1) / 10)
        results[name] = {"step_ms": round(best * 1e3, 2)}
        log(f"[{name}] {results[name]}")
        print(json.dumps({name: results[name]}), flush=True)

    # --- 2. int8 serving batch sweep -----------------------------------
    mel0 = jnp.zeros((8, T, 4, 64), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), mel0)

    def features(wave):
        frames = frame_signal(wave, 960, 480)
        b, c, t, nf = frames.shape
        m = log_mel_frames_pallas(frames.reshape(-1, nf))
        return jnp.transpose(m.reshape(b, c, t, 64), (0, 2, 1, 3))[:, :T]

    calib_wave = jax.random.normal(
        jax.random.PRNGKey(1), (8, 4, int(SR * WINDOW_S)), jnp.float32
    )
    qt = quantize_model(model, variables, [features(calib_wave)])

    @jax.jit
    def chained(variables, qt, wave, n):
        def body(i, acc):
            w = wave + i.astype(jnp.float32) * 1e-6
            out = quantized_apply(model, variables, qt, features(w))
            return acc + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    sweep = {}
    for batch in (8, 16, 24, 32):
        wave = jax.random.normal(
            jax.random.PRNGKey(2), (batch, 4, int(SR * WINDOW_S)), jnp.float32
        )
        t0 = time.time()
        float(chained(variables, qt, wave, 2))
        log(f"[int8 b{batch}] compile+first {time.time() - t0:.1f}s")

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                float(chained(variables, qt, wave, n))
                best = min(best, time.time() - t0)
            return best

        t_s, t_l = timed(2), timed(22)
        per_iter = (t_l - t_s) / 20
        sweep[f"b{batch}"] = {
            "ms_per_iter": round(per_iter * 1e3, 3),
            "ms_per_window": round(per_iter * 1e3 / batch, 3),
            "audio_s_per_s": round(batch * WINDOW_S / per_iter, 0),
        }
        log(f"[int8 b{batch}] {sweep[f'b{batch}']}")
        print(json.dumps({f"int8_b{batch}": sweep[f"b{batch}"]}), flush=True)
    results["int8_sweep"] = sweep

    (RESULTS / "qat_int8_sweep.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
