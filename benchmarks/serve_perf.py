"""Serving-daemon throughput/latency on the real chip.

Starts a SELDServer in-process on the TPU backend (flagship
resnet_conformer, fresh-initialized checkpoint — serve perf does not
depend on the weights' values), streams a 60 s 4-channel clip through it
in 1 s chunks over localhost TCP, and reports per-push latency and
audio-seconds-per-second for the float and int8 paths. Uses
max_streams so the server (and the TPU grant) shuts down cleanly.

Writes benchmarks/results/serve_perf.json.
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
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
SR, SECONDS, CHUNK_S = 24000, 60.0, 1.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    import tempfile

    import jax.numpy as jnp

    from seld_tpu.config import Config
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.models import build_model
    from seld_tpu.serve import SELDServer, stream_client
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.checkpoint import CheckpointManager

    cfg = Config()
    root = Path(tempfile.mkdtemp(prefix="serve_perf_"))
    model = build_model(cfg.model, cfg.grid)
    opt = make_optimizer(cfg.train.learning_rate)
    sample = jnp.zeros((8, 250, 4, 64), jnp.float32)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), sample)
    mgr = CheckpointManager(root / "ckpt", cfg)
    mgr.save_best(1, state, 1.0, 1.0)
    mgr.wait()
    mgr.close()
    log(f"checkpoint at {root}")

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((4, int(SR * SECONDS))) * 0.1).astype(np.float32)
    chunk = int(SR * CHUNK_S)
    chunks = [wave[:, i : i + chunk] for i in range(0, wave.shape[1], chunk)]

    results = {}
    for mode in ("float", "int8"):
        predictor = SELDPredictor(root / "ckpt", batch_windows=8)
        if mode == "int8":
            predictor.quantize(calib_waves=[wave[:, : SR * 5]])
        # warm the compile outside the timed stream
        t0 = time.time()
        predictor.predict_waveform(wave[:, : SR * 5])
        log(f"[{mode}] warmup (compile) {time.time() - t0:.1f}s")

        server = SELDServer(predictor, port=0, max_streams=1)
        thread = server.serve_background()
        t0 = time.time()
        classes, info = stream_client("127.0.0.1", server.port, chunks)
        wall = time.time() - t0
        thread.join(timeout=120)
        server.server_close()
        results[mode] = {
            "clip_seconds": SECONDS,
            "chunk_seconds": CHUNK_S,
            "wall_s": round(wall, 2),
            "audio_s_per_s": round(SECONDS / wall, 1),
            "mean_push_ms": round(wall / len(chunks) * 1e3, 1),
            "frames": int(classes.shape[0]),
        }
        log(f"[{mode}] {results[mode]}")
        print(json.dumps({mode: results[mode]}), flush=True)

    (RESULTS / "serve_perf.json").write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
