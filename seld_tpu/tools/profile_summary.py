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


#: coarse HLO buckets for the roofline accounting: which share of device
#: time is pure data movement (layout copies / slices) vs real compute.
#: Buckets are matched in order against the HLO expression text.
_CATEGORIES = (
    # async -start spans OVERLAP compute (their duration is the whole
    # in-flight window, not exclusive device time — a trace where their
    # sum exceeds the enclosing jit time proves the overlap); the -done
    # events are the actual stalls. Keep them apart.
    ("async_issue", ("copy-start", "slice-start", "async-start")),
    ("async_wait", ("copy-done", "slice-done", "async-done")),
    ("copy", ("copy",)),
    ("slice_concat", ("slice", "dynamic-update-slice", "concatenate",
                      " pad(")),
    ("gather_scatter", ("gather", "scatter")),
    ("convolution", ("convolution",)),
    ("dot", (" dot(", "%dot")),
    ("allreduce_collective", ("all-reduce", "all-gather", "collective",
                              "reduce-scatter")),
)


def category_totals(trace_dir, plane_filter: str | None = None) -> dict:
    """Aggregate device-op time into coarse categories over the busiest
    device plane. Returns {"total_ms", "enclosing_ms", <category>_ms...,
    "fusion_other_ms"}. `enclosing_ms` is the jit_* wrapper events'
    total (the actual on-device wall time of the traced computations);
    category sums partition the remaining leaf-op time. Fusions hide
    their bodies, so `convolution`/`dot` here are LOWER bounds on MXU
    time and `fusion_other` mixes elementwise work with fused MXU ops —
    the split is still decisive for "how much is naked data movement"
    (copies/slices never fuse into MXU work)."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(find_xplane(trace_dir))
    planes = [
        p for p in pd.planes
        if (plane_filter or "/device:") in p.name and "CUSTOM" not in p.name
    ] or list(pd.planes)
    best, best_tot, best_total = None, None, -1.0
    for p in planes:
        tot = defaultdict(float)
        for line in p.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
        s = sum(tot.values())
        if s > best_total:
            best, best_total, best_tot = p, s, tot

    out = defaultdict(float)
    for name, ns in best_tot.items():
        if name.startswith("jit_") or name.startswith("pjit"):
            out["enclosing"] += ns
            continue
        low = name.lower()
        for cat, keys in _CATEGORIES:
            if any(k in low for k in keys):
                out[cat] += ns
                break
        else:
            out["fusion_other"] += ns
    return {f"{k}_ms": v / 1e6 for k, v in sorted(out.items())}


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
