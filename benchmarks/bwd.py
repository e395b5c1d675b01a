"""Backward-pass attribution + optimization experiments (VERDICT item 2).

Times fwd and fwd+bwd for the flagship train workload (batch 16, T=250)
under several variants, plus grad of each submodel in isolation, to find
where the 24.6 ms backward goes and which lever moves it:

  full            — round-1 baseline (norms f32, no remat)
  norm_bf16       — BN/LN arithmetic in bf16 (stats stay f32)
  remat_resnet    — checkpoint every bottleneck
  remat_conformer — checkpoint every conformer block
  remat_all       — both
  sub_resnet      — grad of ResNet50Encoder alone
  sub_conformer   — grad of the 4 conformer blocks alone
  sub_head        — grad of the grid head alone
  sub_loss        — grad of the composite loss on logits alone

Timing: python-chain dispatch + scalar read-back (giant fori chains hit
the remote-compile HTTP 413 limit). Run in background; NEVER timeout-kill
(wedges the tunneled TPU grant).
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

import flax.linen as nn  # noqa: E402

from seld_tpu.config import Config, parse_overrides  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.models.layers import ConformerBlock, GridHead  # noqa: E402
from seld_tpu.models.resnet_conformer import ResNet50Encoder  # noqa: E402
from seld_tpu.targets.rasterize import decode_class_bitmask  # noqa: E402

BATCH, T = 16, 250


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(step_once, n_delta=10, reps=2):
    def run(n):
        out = None
        t0 = time.time()
        for i in range(n):
            out = step_once(i, out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf)) if leaf.ndim else float(leaf)
        return time.time() - t0

    run(1)  # compile
    best = float("inf")
    for _ in range(reps):
        t1 = run(1)
        t11 = run(1 + n_delta)
        best = min(best, (t11 - t1) / n_delta)
    return best


def time_fwd_bwd(model, x, extra_loss=None, label=""):
    """Returns (t_fwd_ms, t_bwd_ms) for model.apply in train mode.
    extra_loss(logits) -> scalar replaces .mean() as the loss."""
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=True)
    )(rng, x)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    mutable = [k for k in rest if k == "batch_stats"]
    loss_of = extra_loss or (lambda out: out.astype(jnp.float32).mean())

    def fwd_loss(p, x):
        out = nn.Module.apply(
            model, {"params": p, **rest}, x, train=True,
            mutable=mutable if mutable else False, rngs={"dropout": rng},
        )
        out = out[0] if mutable else out
        return loss_of(out)

    f_fwd = jax.jit(fwd_loss)
    f_grad = jax.jit(jax.grad(fwd_loss))

    t0 = time.time()
    f_fwd(params, x)
    f_grad(params, x)
    log(f"  [{label}] compile {time.time() - t0:.1f}s")

    t_fwd = timed_chain(lambda i, prev: f_fwd(params, x + np.float32(i) * 1e-6))
    t_bwd = timed_chain(
        lambda i, prev: jax.tree_util.tree_leaves(
            f_grad(params, x + np.float32(i) * 1e-6)
        )[0]
    )
    return t_fwd * 1e3, t_bwd * 1e3


def main():
    results = {}
    mel = jax.random.normal(jax.random.PRNGKey(1), (BATCH, T, 4, 64), jnp.float32)
    mask = jnp.zeros((BATCH, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((BATCH,), jnp.float32)

    variants = [
        ("full", []),
        ("norm_bf16", ["model.norm_dtype=bfloat16"]),
        ("remat_resnet", ["model.remat=resnet"]),
        ("remat_conformer", ["model.remat=conformer"]),
        ("remat_all", ["model.remat=all"]),
        ("norm_bf16_remat_all", ["model.norm_dtype=bfloat16", "model.remat=all"]),
    ]
    base_cfg = Config()
    loss_fn = SELDLossFn(base_cfg.loss, base_cfg.grid)
    targets = decode_class_bitmask(mask, 14, class_major=True)

    def composite(out):
        total, _ = loss_fn(out, targets, em)
        return total

    for name, over in variants:
        cfg = parse_overrides(Config(), over)
        model = build_model(cfg.model, cfg.grid)
        t_fwd, t_bwd = time_fwd_bwd(model, mel, extra_loss=composite, label=name)
        results[name] = {"fwd_ms": round(t_fwd, 2), "fwdbwd_ms": round(t_bwd, 2)}
        print(json.dumps({name: results[name]}), flush=True)

    # Submodel attribution (baseline dtypes: bf16 compute, f32 norms)
    dkw = dict(dtype=jnp.bfloat16, param_dtype=jnp.float32,
               norm_dtype=jnp.float32)

    sub_in = jnp.swapaxes(mel, 2, 3).astype(jnp.bfloat16)  # (B,T,64,4)
    t_fwd, t_bwd = time_fwd_bwd(ResNet50Encoder(**dkw), sub_in, label="sub_resnet")
    results["sub_resnet"] = {"fwd_ms": round(t_fwd, 2), "fwdbwd_ms": round(t_bwd, 2)}
    print(json.dumps({"sub_resnet": results["sub_resnet"]}), flush=True)

    class ConfStack(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            for i in range(4):
                x = ConformerBlock(d_model=512, n_heads=8, d_ff=2048,
                                   name=f"b{i}", **dkw)(x, train)
            return x

    seq = jax.random.normal(jax.random.PRNGKey(2), (BATCH, T, 512), jnp.bfloat16)
    t_fwd, t_bwd = time_fwd_bwd(ConfStack(), seq, label="sub_conformer")
    results["sub_conformer"] = {"fwd_ms": round(t_fwd, 2), "fwdbwd_ms": round(t_bwd, 2)}
    print(json.dumps({"sub_conformer": results["sub_conformer"]}), flush=True)

    head = GridHead(hidden=1024, grid_cells=648, num_classes=14, **dkw)
    t_fwd, t_bwd = time_fwd_bwd(head, seq, label="sub_head")
    results["sub_head"] = {"fwd_ms": round(t_fwd, 2), "fwdbwd_ms": round(t_bwd, 2)}
    print(json.dumps({"sub_head": results["sub_head"]}), flush=True)

    # loss alone: grad wrt logits
    logits = jax.random.normal(jax.random.PRNGKey(3), (BATCH, T, 648, 14),
                               jnp.float32)
    g_loss = jax.jit(jax.grad(lambda lg: loss_fn(lg, targets, em)[0]))
    g_loss(logits)
    t_loss = timed_chain(lambda i, prev: g_loss(logits + np.float32(i) * 1e-6))
    results["sub_loss"] = {"fwdbwd_ms": round(t_loss * 1e3, 2)}
    print(json.dumps({"sub_loss": results["sub_loss"]}), flush=True)

    (REPO / "logs").mkdir(exist_ok=True)

    (REPO / "logs" / "bwd_experiments.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
