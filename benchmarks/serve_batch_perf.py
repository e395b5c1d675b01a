"""Cross-stream continuous batching: multi-stream serving throughput A/B.

Starts a SELDServer in-process on the TPU backend (flagship
resnet_conformer, fresh-initialized checkpoint) and drives N CONCURRENT
client streams of a 30 s 4-channel clip in 1 s chunks over localhost
TCP, with and without --batch-streams. Without batching, N streams pay
N device calls (each behind the device lock and, here, a ~30-40 ms
tunnel RTT) per push round; with the WindowBatcher their windows pack
into shared fixed-shape calls. Reports aggregate audio_s/s and the
batcher's rows/batches counters (mean rows per device call = the
achieved packing). Outputs are asserted bit-equal to the offline
predictor for every stream in both modes.

Writes benchmarks/results/serve_batch_perf.json.
Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = REPO / "benchmarks" / "results"
SR, SECONDS, CHUNK_S = 24000, 30.0, 1.0
N_STREAMS = 8
# (label, batch_streams, batch_wait_s): the wait variant holds partial
# batches open ~one tunnel RTT so concurrent streams actually coincide —
# with a handful of streams and a fast device, rows rarely arrive within
# one device call of each other, so wait=0 shows the lock-removal win
# but mean_rows_per_batch stays ~1.
MODES = [("locked", False, 0.0), ("batched", True, 0.0),
         ("batched_wait25ms", True, 0.025)]


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
    root = Path(tempfile.mkdtemp(prefix="serve_batch_perf_"))
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

    predictor = SELDPredictor(root / "ckpt", batch_windows=8)
    t0 = time.time()
    ref = predictor.predict_waveform(wave)  # also warms the compile
    log(f"warmup (compile + offline reference) {time.time() - t0:.1f}s")

    results = {}
    for key, batched, wait_s in MODES:
        server = SELDServer(predictor, port=0, max_streams=N_STREAMS,
                            batch_streams=batched, batch_wait_s=wait_s)
        thread = server.serve_background()
        outs = {}

        def run(name):
            outs[name] = stream_client("127.0.0.1", server.port, chunks)[0]

        t0 = time.time()
        threads = [
            threading.Thread(target=run, args=(f"s{i}",))
            for i in range(N_STREAMS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1200)
        wall = time.time() - t0
        # A hung stream must fail the run, not silently shrink the
        # verification set and record a bogus wall-clock.
        assert not any(t.is_alive() for t in threads), "client stream hung"
        assert len(outs) == N_STREAMS, f"{len(outs)}/{N_STREAMS} completed"
        thread.join(timeout=120)
        server.server_close()
        for name, classes in outs.items():
            np.testing.assert_array_equal(classes, ref.classes, err_msg=name)
        entry = {
            "n_streams": N_STREAMS,
            "clip_seconds": SECONDS,
            "chunk_seconds": CHUNK_S,
            "wall_s": round(wall, 2),
            "aggregate_audio_s_per_s": round(N_STREAMS * SECONDS / wall, 1),
            "mean_push_ms": round(wall / len(chunks) * 1e3, 1),
            "bit_equal_streams": len(outs),
        }
        if batched and server.batcher is not None:
            entry["device_batches"] = server.batcher.batches_run
            entry["rows"] = server.batcher.rows_run
            entry["mean_rows_per_batch"] = round(
                server.batcher.rows_run / max(server.batcher.batches_run, 1), 2
            )
        results[key] = entry
        log(f"[{key}] {entry}")
        print(json.dumps({key: entry}), flush=True)

    for key, _, _ in MODES[1:]:
        if "locked" in results and key in results:
            results[f"speedup_{key}"] = round(
                results["locked"]["wall_s"] / results[key]["wall_s"], 2
            )
    (RESULTS / "serve_batch_perf.json").write_text(
        json.dumps(results, indent=2) + "\n"
    )
    log("speedups:", {k: v for k, v in results.items()
                      if k.startswith("speedup")})


if __name__ == "__main__":
    main()
