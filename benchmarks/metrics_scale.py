"""Corpus-scale benchmark for the official DCASE2022 metrics path.

VERDICT r2 #4: STARSS22-dev-scale eval (~1.2M frames) must not take
minutes-to-hours of single-core Python. The vectorized
``dcase2022_metrics`` (precomputed cell-distance table, sparse
(frame, class) grouping, scipy Hungarian only on multi-source frames)
is measured here over 1M synthetic frames at realistic event density.

Writes benchmarks/results/metrics_scale.json. Run on the 1-core host:
    python benchmarks/metrics_scale.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from seld_tpu.eval.metrics import dcase2022_metrics

F, G = 1_000_000, 648  # 5.5 h of audio at 50 fps


def add_events(g: np.ndarray, n_events: int, seed: int) -> None:
    r = np.random.default_rng(seed)
    for _ in range(n_events):
        c = int(r.integers(0, 13))
        f0 = int(r.integers(0, F - 200))
        ln = int(r.integers(20, 200))
        g[f0:f0 + ln, int(r.integers(0, G))] = c
        if r.random() < 0.15:  # simultaneous same-class source (track path)
            g[f0:f0 + ln, int(r.integers(0, G))] = c


def main() -> None:
    gt = np.full((F, G), 13, np.int8)
    pred = np.full((F, G), 13, np.int8)
    add_events(gt, 12000, 1)
    add_events(pred, 12000, 1)  # same seed: high-overlap predictions
    add_events(pred, 1500, 2)   # plus false alarms

    t0 = time.time()
    m = dcase2022_metrics(pred, gt)
    elapsed = time.time() - t0

    result = {
        "benchmark": "dcase2022_metrics corpus scale",
        "n_frames": F,
        "audio_hours": F / 50 / 3600,
        "seconds": round(elapsed, 2),
        "frames_per_second": round(F / elapsed),
        "target_seconds": 60,
        "scores": {k: (round(v, 6) if isinstance(v, float) else v)
                   for k, v in m.items()
                   if k not in ("classwise", "macro_gt")},
    }
    out = Path(__file__).parent / "results" / "metrics_scale.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    assert elapsed < 60, f"corpus-scale metrics too slow: {elapsed:.1f}s"


if __name__ == "__main__":
    main()
