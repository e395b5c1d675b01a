"""Microbench: does int8 buy MXU throughput on this chip via XLA?

Gate for the int8 PTQ serving candidate (STATUS round-4 #1): v5e lists
int8 at 2x the bf16 MXU peak, but that only matters if XLA actually
lowers s8 x s8 -> s32 dot/conv to the int8 MXU path. Times, at serving
shapes (ResNet50 trunk convs + the conformer/grid-head matmuls):

  * bf16 conv / dot (the current serving numerics)
  * int8 conv / dot with s32 accumulation

Methodology: chain N iterations inside one jitted fori_loop with
iteration-dependent inputs, long-minus-short to cancel the tunnel RTT
(bench.py's methodology). Writes benchmarks/results/int8_probe.json.
Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).

CAVEAT: sub-millisecond single-op timings through the tunnel proved
unstable run-to-run (occasional negative or impossibly-high readings
even with best-of-reps). The gating signal — int8 conv consistently
faster than bf16 conv at the trunk shape — reproduced across runs, but
the COMMITTED evidence for the int8 serving path is the end-to-end A/B
in int8_serving.py (full pipeline, multi-ms scale, stable): 1.33x.
This probe's JSON is left uncommitted.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(body, x0, n_long=64, n_short=8, reps=5):
    """Long-minus-short fori_loop timing; body must be iteration-dependent."""

    def run(n):
        f = jax.jit(partial(_loop, body, n))
        # warm up AND sync via read-back: async dispatch through the
        # tunnel otherwise bleeds the warmup into the timed call
        float(jnp.sum(f(x0).astype(jnp.float32)))
        t0 = time.time()
        out = f(x0)
        s = float(jnp.sum(out.astype(jnp.float32)))
        assert s == s  # NaN guard; forces the host read-back sync
        return time.time() - t0

    # best-of-reps per point, THEN the difference: pairing individual
    # long/short runs lets a single tunnel-RTT spike in a short run
    # produce a (selected-by-min) negative estimate.
    t_s = min(run(n_short) for _ in range(reps))
    t_l = min(run(n_long) for _ in range(reps))
    return (t_l - t_s) / (n_long - n_short)


def _loop(body, n, x0):
    def step(i, x):
        return body(i, x)

    return jax.lax.fori_loop(0, n, step, x0)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {}

    # --- dot: (4000, 1024) x (1024, 9072) — the grid-head shape ---------
    M, K, N = 4000, 1024, 9072
    flops = 2 * M * K * N

    kb = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    def body_bf16(i, x):
        y = jax.lax.dot_general(
            x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3), kb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y[:, :K] * 0.02).astype(jnp.bfloat16)  # keep magnitudes ~O(1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    t = timed_loop(body_bf16, x0)
    results["dot_bf16"] = {
        "ms": round(t * 1e3, 3), "tflops": round(flops / t / 1e12, 1)
    }
    log("dot_bf16", results["dot_bf16"])

    ki = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 128, jnp.int8)

    def body_i8(i, x):
        y = jax.lax.dot_general(
            x + i.astype(jnp.int8), ki, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y[:, :K].astype(jnp.int8)

    xi0 = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 128, jnp.int8)
    t = timed_loop(body_i8, xi0)
    results["dot_int8"] = {
        "ms": round(t * 1e3, 3), "tflops": round(flops / t / 1e12, 1)
    }
    log("dot_int8", results["dot_int8"])

    # --- conv: ResNet trunk shape (B*T folded, NHWC) --------------------
    # flagship folds time into batch: (16*250, 1, 64, C) with (1, 3)
    # freq-strided 3x3 convs; use a representative mid-trunk block.
    B, H, W, C = 4000, 1, 16, 256
    kh, kw, co = 1, 3, 256
    cflops = 2 * B * H * W * C * kh * kw * co

    wb = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, C, co), jnp.bfloat16)

    def conv_bf16(i, x):
        y = jax.lax.conv_general_dilated(
            x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3), wb,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y * 0.03).astype(jnp.bfloat16)  # keep magnitudes ~O(1)

    xc0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
    t = timed_loop(conv_bf16, xc0)
    results["conv_bf16"] = {
        "ms": round(t * 1e3, 3), "tflops": round(cflops / t / 1e12, 1)
    }
    log("conv_bf16", results["conv_bf16"])

    wi = jax.random.randint(
        jax.random.PRNGKey(1), (kh, kw, C, co), -127, 128, jnp.int8
    )

    def conv_i8(i, x):
        y = jax.lax.conv_general_dilated(
            x + i.astype(jnp.int8), wi,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.int8)

    xi0 = jax.random.randint(
        jax.random.PRNGKey(0), (B, H, W, C), -127, 128, jnp.int8
    )
    t = timed_loop(conv_i8, xi0)
    results["conv_int8"] = {
        "ms": round(t * 1e3, 3), "tflops": round(cflops / t / 1e12, 1)
    }
    log("conv_int8", results["conv_int8"])

    (RESULTS / "int8_probe.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
