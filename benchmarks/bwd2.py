"""Follow-up backward/train-overhead experiments (run after bwd.py):

  sub_head / sub_loss   — finish the attribution (harness fix)
  no_dropout            — train step with dropout=0: RNG + mask cost
  rbg_rng               — threefry -> rbg PRNG for the dropout stream
  eval_fwd              — eval-mode forward + loss (baseline for train ovh)
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

from bwd import BATCH, T, time_fwd_bwd, timed_chain, log  # noqa: E402

from seld_tpu.config import Config, parse_overrides  # noqa: E402
from seld_tpu.losses import SELDLossFn  # noqa: E402
from seld_tpu.models import build_model  # noqa: E402
from seld_tpu.models.layers import GridHead  # noqa: E402
from seld_tpu.targets.rasterize import decode_class_bitmask  # noqa: E402


def main():
    results = {}
    mel = jax.random.normal(jax.random.PRNGKey(1), (BATCH, T, 4, 64), jnp.float32)
    mask = jnp.zeros((BATCH, T, 648), jnp.int32).at[:, :, 100].set(8)
    em = jnp.ones((BATCH,), jnp.float32)
    base_cfg = Config()
    loss_fn = SELDLossFn(base_cfg.loss, base_cfg.grid)
    targets = decode_class_bitmask(mask, 14, class_major=True)

    def composite(out):
        total, _ = loss_fn(out, targets, em)
        return total

    dkw = dict(dtype=jnp.bfloat16, param_dtype=jnp.float32,
               norm_dtype=jnp.float32)
    seq = jax.random.normal(jax.random.PRNGKey(2), (BATCH, T, 512), jnp.bfloat16)

    head = GridHead(hidden=1024, grid_cells=648, num_classes=14, **dkw)
    t_fwd, t_bwd = time_fwd_bwd(head, seq, extra_loss=composite, label="sub_head")
    results["sub_head_with_loss"] = {"fwd_ms": round(t_fwd, 2),
                                     "fwdbwd_ms": round(t_bwd, 2)}
    print(json.dumps({"sub_head_with_loss": results["sub_head_with_loss"]}),
          flush=True)

    logits = jax.random.normal(jax.random.PRNGKey(3), (BATCH, T, 648, 14),
                               jnp.float32)
    f_loss = jax.jit(lambda lg: loss_fn(lg, targets, em)[0])
    g_loss = jax.jit(jax.grad(lambda lg: loss_fn(lg, targets, em)[0]))
    f_loss(logits); g_loss(logits)
    t_lf = timed_chain(lambda i, prev: f_loss(logits + np.float32(i) * 1e-6))
    t_lb = timed_chain(
        lambda i, prev: g_loss(logits + np.float32(i) * 1e-6)
    )
    results["sub_loss"] = {"fwd_ms": round(t_lf * 1e3, 2),
                           "fwdbwd_ms": round(t_lb * 1e3, 2)}
    print(json.dumps({"sub_loss": results["sub_loss"]}), flush=True)

    # dropout-off full model
    cfg = parse_overrides(Config(), ["model.resnet_dropout=0.0"])
    model = build_model(cfg.model, cfg.grid)
    t_fwd, t_bwd = time_fwd_bwd(model, mel, extra_loss=composite,
                                label="no_dropout")
    results["no_dropout"] = {"fwd_ms": round(t_fwd, 2),
                             "fwdbwd_ms": round(t_bwd, 2)}
    print(json.dumps({"no_dropout": results["no_dropout"]}), flush=True)

    # rbg PRNG for the dropout stream
    model = build_model(Config().model, Config().grid)
    from seld_tpu.models import init_variables
    variables = init_variables(model, jax.random.PRNGKey(0), mel)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    rbg_key = jax.random.key(0, impl="rbg")

    def fwd_loss(p, x):
        out, _ = model.apply(
            {"params": p, **rest}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": rbg_key},
        )
        return composite(out)

    f = jax.jit(fwd_loss)
    gf = jax.jit(jax.grad(fwd_loss))
    t0 = time.time(); f(params, mel); gf(params, mel)
    log(f"  [rbg] compile {time.time() - t0:.1f}s")
    t_f = timed_chain(lambda i, prev: f(params, mel + np.float32(i) * 1e-6))
    t_b = timed_chain(
        lambda i, prev: jax.tree_util.tree_leaves(
            gf(params, mel + np.float32(i) * 1e-6)
        )[0]
    )
    results["rbg_rng"] = {"fwd_ms": round(t_f * 1e3, 2),
                          "fwdbwd_ms": round(t_b * 1e3, 2)}
    print(json.dumps({"rbg_rng": results["rbg_rng"]}), flush=True)

    # eval-mode forward + loss (train-overhead baseline)
    def eval_loss(p, x):
        out = model.apply({"params": p, **rest}, x, train=False)
        return composite(out)

    fe = jax.jit(eval_loss)
    fe(params, mel)
    t_e = timed_chain(lambda i, prev: fe(params, mel + np.float32(i) * 1e-6))
    results["eval_fwd_with_loss"] = {"fwd_ms": round(t_e * 1e3, 2)}
    print(json.dumps({"eval_fwd_with_loss": results["eval_fwd_with_loss"]}),
          flush=True)

    (REPO / "logs").mkdir(exist_ok=True)

    (REPO / "logs" / "bwd_experiments2.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
