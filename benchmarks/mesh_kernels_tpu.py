"""TPU lowering check for the shard_mapped Pallas kernels (round 3).

The fused loss kernel and flash attention run under jax.shard_map on
meshes; CPU tests exercise interpret mode only. This compiles and runs
both on the real chip under a (1, 1) mesh — one shard, but the full
shard_map -> Mosaic lowering path the multichip configuration will use.

Writes benchmarks/results/mesh_kernels_tpu.json.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.config import GridConfig, LossConfig
    from seld_tpu.losses import SELDLossFn
    from seld_tpu.ops.attention import attention_mesh, multi_head_attention
    from seld_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=1)
    results = {"mesh": str(mesh.devices.shape)}
    rng = np.random.default_rng(0)

    # --- fused loss under shard_map ---
    b, t, g, m = 4, 50, 648, 14
    logits = jnp.asarray(rng.standard_normal((b, t, g, m)), jnp.float32)
    mask_np = np.where(rng.random((b, t, g)) < 0.95, 0,
                       rng.integers(1, 2 ** 13, (b, t, g))).astype(np.uint16)
    mask = jnp.asarray(mask_np)
    em = jnp.ones((b,), jnp.float32)
    fn = SELDLossFn(LossConfig(loss_type="mse", use_cl=True), GridConfig())

    t0 = time.time()
    ref = fn.from_bitmask(logits, mask, em, fused=True)          # no mesh
    got = jax.jit(lambda l, mk: fn.from_bitmask(
        l, mk, em, fused=True, mesh=mesh).total)(logits, mask)
    grad = jax.jit(jax.grad(lambda l: fn.from_bitmask(
        l, mask, em, fused=True, mesh=mesh).total))(logits)
    ok_loss = abs(float(got) - float(ref.total)) < 1e-5 * max(
        1.0, abs(float(ref.total)))
    ok_grad = bool(np.isfinite(np.asarray(grad)).all())
    results["fused_loss_shardmap"] = {
        "loss_nomesh": round(float(ref.total), 6),
        "loss_mesh": round(float(got), 6),
        "match": ok_loss, "grad_finite": ok_grad,
        "compile_run_s": round(time.time() - t0, 1),
    }
    log(f"fused loss under shard_map: {results['fused_loss_shardmap']}")
    (RESULTS / "mesh_kernels_tpu.json").write_text(
        json.dumps(results, indent=2) + "\n")  # incremental: keep evidence
    assert ok_loss and ok_grad

    # --- flash attention under shard_map ---
    q, k, v = (jnp.asarray(rng.standard_normal((2, 4, 512, 64)), jnp.float32)
               for _ in range(3))
    t0 = time.time()
    want = np.asarray(multi_head_attention(q, k, v, use_flash=False))
    with attention_mesh(mesh):
        got = np.asarray(jax.jit(lambda a, bb, c: multi_head_attention(
            a, bb, c, use_flash=True))(q, k, v))
    rel = float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-9))
    results["flash_shardmap"] = {
        "max_rel_err_vs_einsum": rel,
        "compile_run_s": round(time.time() - t0, 1),
    }
    log(f"flash under shard_map: {results['flash_shardmap']}")
    assert rel < 5e-3  # bf16-MXU noise floor

    (RESULTS / "mesh_kernels_tpu.json").write_text(
        json.dumps(results, indent=2) + "\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
