"""Profiler trace summarization: aggregate device-op time from a captured
jax.profiler trace (xplane) without TensorBoard.

Completes the tracing/profiling subsystem (SURVEY §5: the reference has
none — only epoch wall-clock logs): `train.profile_steps=N` captures a
trace during training; this tool turns it into a top-K op-time table.

Usage:
  python -m seld_tpu.tools.profile_summary outputs/profile [--top 25]
"""

from __future__ import annotations

import argparse
import glob
from collections import defaultdict
from pathlib import Path


def find_xplane(trace_dir) -> str:
    files = sorted(
        glob.glob(str(Path(trace_dir) / "**" / "*.xplane.pb"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return files[-1]


def summarize(trace_dir, top: int = 25, plane_filter: str | None = None) -> list:
    """Returns [(duration_ms, share, op_name)] sorted desc, aggregated over
    the busiest device plane (TPU if present, else CPU)."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(find_xplane(trace_dir))
    planes = list(pd.planes)
    device_planes = [
        p for p in planes
        if (plane_filter or "/device:") in p.name and "CUSTOM" not in p.name
    ]
    if not device_planes:
        device_planes = planes

    best = None
    best_total = -1.0
    for p in device_planes:
        tot = defaultdict(float)
        for line in p.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
        s = sum(tot.values())
        if s > best_total:
            best, best_total, best_tot = p, s, tot

    rows = sorted(best_tot.items(), key=lambda kv: -kv[1])[:top]
    return [
        (ns / 1e6, ns / best_total, name) for name, ns in rows
    ], best.name


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)
    rows, plane = summarize(args.trace_dir, args.top)
    print(f"plane: {plane}")
    print(f"{'ms':>10}  {'share':>6}  op")
    for ms, share, name in rows:
        print(f"{ms:10.3f}  {share * 100:5.1f}%  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
