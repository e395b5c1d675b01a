"""Corpus-scale host pipeline benchmark (VERDICT r2 #5).

Generates a ~1 h STARSS22-format corpus (12 x 5 min 4-channel 24 kHz
clips with event CSVs), then measures on the real machine:

1. Per-phase host costs over all files: native WAV decode, device mel
   front-end (compute_mel_features), label rasterization.
2. `build_corpus` end-to-end wall-clock (the phase sum plus concat/pad).
3. Steady-state training epoch time for the flagship at batch 16
   (BatchIterator with prefetch -> fused train step on chip), i.e. does
   the 1-core host keep the chip fed at corpus scale?

Writes benchmarks/results/corpus_scale.json.
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
N_FILES = 12
CLIP_S = 300.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import tempfile

    RESULTS.mkdir(exist_ok=True)
    from seld_tpu.config import Config
    from seld_tpu.data.audio import load_wav
    from seld_tpu.data.corpus import build_corpus, compute_mel_features
    from seld_tpu.data.synthetic import synthetic_raw_files
    from seld_tpu.targets.rasterize import (
        encode_events_to_bitmask, load_metadata_csv, total_label_frames,
    )

    cfg = Config()
    results = {"corpus": f"{N_FILES} x {CLIP_S:.0f}s 4ch 24kHz "
                         f"({N_FILES * CLIP_S / 3600:.2f} h)"}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        t0 = time.time()
        audio_files, meta_files = synthetic_raw_files(
            tmp, cfg, n_files=N_FILES, seconds=CLIP_S, seed=0
        )
        results["generate_s"] = round(time.time() - t0, 1)
        log(f"generated in {results['generate_s']}s")

        # --- per-phase costs ---
        t0 = time.time()
        waves = [load_wav(p) for p in audio_files]
        decode_s = time.time() - t0
        t0 = time.time()
        mels = [compute_mel_features(w, cfg.features) for w, _ in waves]
        jax.block_until_ready(mels[-1]) if hasattr(mels[-1], "block_until_ready") else None
        mel_s = time.time() - t0
        t0 = time.time()
        for (w, sr), mp in zip(waves, meta_files):
            t_lab = total_label_frames(w.shape[1], sr,
                                       cfg.targets.label_frame_ms)
            frames, classes, sources, az, el = load_metadata_csv(mp)
            encode_events_to_bitmask(
                frames, classes, az, el, t_lab,
                n_el=cfg.grid.n_el, n_az=cfg.grid.n_az,
                fanout=cfg.targets.fanout,
            )
        raster_s = time.time() - t0
        del waves, mels
        results["phases_s"] = {
            "decode": round(decode_s, 1),
            "mel": round(mel_s, 1),
            "rasterize": round(raster_s, 1),
        }
        log(f"phases: {results['phases_s']}")

        # --- build_corpus end to end ---
        t0 = time.time()
        corpus = build_corpus(
            audio_files, meta_files, cfg.features, cfg.grid, cfg.window,
            cfg.targets, train=True,
        )
        results["build_corpus_s"] = round(time.time() - t0, 1)
        results["total_frames"] = int(corpus.total_frames)
        results["n_windows"] = len(corpus)
        results["build_audio_s_per_s"] = round(
            N_FILES * CLIP_S / results["build_corpus_s"], 1
        )
        log(f"build_corpus: {results['build_corpus_s']}s "
            f"({results['build_audio_s_per_s']} audio_s/s), "
            f"{results['n_windows']} windows")

        # --- steady epoch time on chip (flagship, b16) ---
        from seld_tpu.data.sampler import BatchIterator
        from seld_tpu.losses import SELDLossFn
        from seld_tpu.models import build_model
        from seld_tpu.train import (
            create_train_state, make_optimizer, make_train_step,
        )

        model = build_model(cfg.model, cfg.grid)
        loss_fn = SELDLossFn(cfg.loss, cfg.grid)
        opt = make_optimizer(1e-3)
        b = 16
        sample = jnp.zeros(
            (b, corpus.window_frames, corpus.mel.shape[1],
             cfg.model.n_mels), jnp.float32,
        )
        rng = jax.random.key(0, impl=cfg.train.prng_impl)
        state = create_train_state(model, opt, rng, sample)
        step = make_train_step(model, loss_fn, opt, cfg.grid.num_classes)

        from seld_tpu.data.sampler import device_prefetch

        def place(batch):
            mel = jnp.asarray(np.asarray(batch.mel))
            mask = jnp.asarray(np.asarray(batch.label_mask))
            em = jnp.asarray(
                (np.arange(mel.shape[0]) < batch.n_valid).astype(np.float32)
            )
            return mel, mask, em

        for mode in ("inline", "device_prefetch"):
            # fresh state per mode: self-contained A/B (comparable losses,
            # no cross-mode training carry-over)
            state = create_train_state(model, opt, rng, sample)
            epochs = []
            for epoch in range(3):
                it = BatchIterator(corpus, b, shuffle=True, seed=epoch,
                                   prefetch=cfg.data.prefetch_depth)
                batches = (device_prefetch(it, place, depth=2)
                           if mode == "device_prefetch"
                           else (place(x) for x in it))
                t0 = time.time()
                n_steps = 0
                metrics = None
                for mel, mask, em in batches:
                    state, metrics = step(state, mel, mask, em, rng)
                    n_steps += 1
                loss = float(metrics["loss"])  # sync
                dt = time.time() - t0
                epochs.append(round(dt, 2))
                log(f"[{mode}] epoch {epoch}: {dt:.2f}s, {n_steps} steps, "
                    f"loss {loss:.4f}")
            results[f"epoch_s_{mode}"] = epochs
            results[f"steady_epoch_s_{mode}"] = min(epochs[1:])
            results[f"train_audio_s_per_s_{mode}"] = round(
                N_FILES * CLIP_S / min(epochs[1:]), 1
            )
        results["steps_per_epoch"] = n_steps

    (RESULTS / "corpus_scale.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
