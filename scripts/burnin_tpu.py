"""End-of-round full-stack burn-in on the real chip.

Drives the production surfaces through the CLI in ONE process (one TPU
grant): flagship training with gradient accumulation + EMA +
SpecAugment + ACS, evaluation, float and int8 prediction (offline and
streamed), int8 StableHLO export, and the serve daemon with a live
client — recording wall-clock per stage.

Run in background; NEVER timeout-kill (wedges the tunneled TPU grant).
Writes benchmarks/results/burnin_r3.json.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    import os
    import tempfile

    from seld_tpu.cli import main as cli

    root = Path(tempfile.mkdtemp(prefix="burnin_r3_"))
    os.chdir(root)
    report: dict = {}

    OVER = [
        f"data.base_path={root}",
        "model.model_type=resnet_conformer",
        "features.feature_set=mel_iv",
        "loss.use_aiur=true",
        "loss.use_cl=true",
        "train.batch_size=8",
        "train.accum_steps=2",
        "train.num_epochs=1",
        "train.save_every_n_epochs=1",
        "train.ema_decay=0.99",
        "train.specaugment_time_masks=2",
        "train.specaugment_freq_masks=2",
        "train.acs_augment=true",
    ]

    def stage(name, fn):
        t0 = time.time()
        rc = fn()
        dt = time.time() - t0
        assert rc == 0, f"{name} rc={rc}"
        report[name] = {"seconds": round(dt, 1)}
        log(f"[{name}] OK in {dt:.1f}s")

    stage("train", lambda: cli(["train", "--synthetic", *OVER]))
    stage("eval", lambda: cli(["eval", "--synthetic", *OVER,
                               "--num-visualizations", "1"]))

    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.synthetic import synthetic_raw_files

    cfg = parse_overrides(Config(), OVER)
    wavs, _ = synthetic_raw_files(root / "wav", cfg, n_files=1, seconds=20.0)
    wav = str(wavs[0])

    stage("predict", lambda: cli(["predict", *OVER, "--wavs", wav]))
    stage("predict_stream_overlap",
          lambda: cli(["predict", *OVER, "--wavs", wav, "--stream",
                       "--overlap", "0.5"]))
    stage("predict_int8",
          lambda: cli(["predict", *OVER, "--wavs", wav, "--int8"]))
    stage("export_int8",
          lambda: cli(["export", *OVER, "--out", str(root / "m8.stablehlo"),
                       "--batch-windows", "4",
                       "--int8-calib-wavs", wav]))

    # serve daemon + live client on the same chip
    def run_serve():
        from seld_tpu.data.audio import load_wav
        from seld_tpu.infer import SELDPredictor
        from seld_tpu.serve import SELDServer, stream_client

        predictor = SELDPredictor(cfg.data.checkpoint_path, cfg)
        server = SELDServer(predictor, port=0, max_streams=1)
        thread = server.serve_background()
        wave, _ = load_wav(wav)
        chunks = [wave[:, i : i + 24000]
                  for i in range(0, wave.shape[1], 24000)]
        t0 = time.time()
        classes, info = stream_client("127.0.0.1", server.port, chunks)
        report["serve"] = {
            "seconds": round(time.time() - t0, 1),
            "frames": int(classes.shape[0]),
            "total_samples": int(info["total_samples"]),
        }
        thread.join(timeout=120)
        server.server_close()
        return 0

    stage("serve_roundtrip", run_serve)

    # the int8 artifact loads and runs standalone
    from seld_tpu.export import load_serving

    fn, meta = load_serving(root / "m8.stablehlo")
    out = np.asarray(fn(np.zeros(meta["input_shape"], np.float32)))
    assert meta["quantized_int8"] is True
    report["load_int8_artifact"] = {"output_shape": list(out.shape)}

    (RESULTS / "burnin_r3.json").write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
