"""Streaming serving throughput/latency on the real chip (VERDICT r2 #6).

Bit-equality of `predict --stream` with the offline predictor is pinned
by tests; this measures what it COSTS. For a flagship ResNet50-Conformer
checkpoint (fresh weights — throughput is weight-agnostic):

* feed 120 s of 4-channel 24 kHz audio through StreamingSession in chunk
  sizes {0.1 s, 0.5 s, 1 s, 5 s}, overlap 0 and 0.5;
* report end-to-end audio_s/s, mean / p95 / max per-push wall time, and
  the offline predict_waveform number for comparison.

Window batching policy (documented for STATUS): the predictor runs
windows through one compiled forward in fixed batches of
`batch_windows` (default 8), zero-padding the last batch; a streaming
session typically completes ONE window per hop, so pushes that cross a
window boundary pay a single padded batch-8 forward (~the batch-8
pipeline cost), and all other pushes only pay host-side incremental mel.

Writes benchmarks/results/stream_perf.json.
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

SR = 24_000
CLIP_S = 120.0
RESULTS = REPO / "benchmarks" / "results"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_checkpoint(tmp: Path):
    """Save a fresh flagship state so SELDPredictor can load it."""
    import jax.numpy as jnp

    from seld_tpu.config import Config
    from seld_tpu.models import build_model
    from seld_tpu.train import create_train_state, make_optimizer
    from seld_tpu.train.checkpoint import CheckpointManager

    cfg = Config()
    model = build_model(cfg.model, cfg.grid)
    sample = jnp.zeros(
        (2, cfg.window.window_frames(cfg.features), cfg.model.n_channels,
         cfg.model.n_mels), jnp.float32,
    )
    state = create_train_state(
        model, make_optimizer(1e-3), jax.random.PRNGKey(0), sample
    )
    mgr = CheckpointManager(tmp, cfg)
    mgr.save_best(1, state, 1.0, 1.0)
    mgr.wait()
    mgr.close()
    return cfg


def run_stream(predictor, wave, chunk_s: float, overlap: float):
    from seld_tpu.stream import StreamingSession

    n = int(chunk_s * SR)
    s = StreamingSession(predictor, overlap=overlap)
    push_times = []
    frames = 0
    t0 = time.time()
    for lo in range(0, wave.shape[1], n):
        t1 = time.time()
        for start, cls in s.push(wave[:, lo : lo + n]):
            frames += cls.shape[0]
        push_times.append(time.time() - t1)
    for start, cls in s.flush():
        frames += cls.shape[0]
    total = time.time() - t0
    pt = np.array(push_times[2:]) if len(push_times) > 4 else np.array(push_times)
    return {
        "chunk_s": chunk_s,
        "overlap": overlap,
        "audio_s_per_s": round(CLIP_S / total, 1),
        "total_s": round(total, 3),
        "frames": frames,
        "push_ms_mean": round(float(pt.mean() * 1e3), 2),
        "push_ms_p95": round(float(np.percentile(pt, 95) * 1e3), 2),
        "push_ms_max": round(float(pt.max() * 1e3), 2),
    }


def main():
    import tempfile

    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from seld_tpu.infer import SELDPredictor

    results = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        make_checkpoint(tmp)
        predictor = SELDPredictor(tmp)
        wave = np.random.default_rng(0).standard_normal(
            (4, int(CLIP_S * SR))).astype(np.float32) * 0.2

        # offline reference
        t0 = time.time()
        predictor.predict_waveform(wave)
        warm = time.time() - t0  # includes compiles
        t0 = time.time()
        predictor.predict_waveform(wave)
        offline = time.time() - t0
        results["offline"] = {
            "audio_s_per_s": round(CLIP_S / offline, 1),
            "total_s": round(offline, 3),
            "first_total_s": round(warm, 1),
        }
        log(f"offline: {results['offline']}")

        rows = []
        for overlap in (0.0, 0.5):
            for chunk_s in (0.1, 0.5, 1.0, 5.0):
                r = run_stream(predictor, wave, chunk_s, overlap)
                rows.append(r)
                log(f"stream: {r}")
        results["stream"] = rows
        results["batch_windows"] = predictor.batch_windows

    (RESULTS / "stream_perf.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
