"""Synthetic SELD data: random FOA-like clips + plausible metadata.

Serves the role of the reference's single-file debug mode and notebook
quick-tests (ref config.py:14-18, SMR_SELD_2.ipynb cell 37) when no
STARSS22 corpus is mounted — used by tests, smoke training, and bench.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from seld_tpu.config import Config
from seld_tpu.data.audio import write_wav
from seld_tpu.data.corpus import WindowedCorpus, build_corpus


def foa_gains(az_deg, el_deg) -> np.ndarray:
    """SN3D first-order ambisonic panning gains in STARSS22's ACN channel
    order (W, Y, Z, X) for a plane wave from (az, el) degrees — the same
    convention the mel_iv intensity vectors decode
    (features/spatial.py) and the ACS transforms permute
    (features/acs.py). Accepts scalars -> (4,) or equal-shape arrays ->
    (4, *shape) (per-sample gains for moving sources)."""
    az = np.asarray(np.deg2rad(az_deg), np.float32)
    el = np.asarray(np.deg2rad(el_deg), np.float32)
    return np.stack([
        np.ones_like(az),
        np.sin(az) * np.cos(el),
        np.sin(el),
        np.cos(az) * np.cos(el),
    ]).astype(np.float32)


def _wrap_az(az):
    """Wrap azimuth(s) to [-180, 180) degrees."""
    return (np.asarray(az) + 180.0) % 360.0 - 180.0


def _reflect(x, lo: float, hi: float):
    """Reflect value(s) into [lo, hi] (triangle wave) — elevation
    trajectories bounce off the caps instead of crossing the poles,
    like a physical source tracked in (az, el) coordinates."""
    span = hi - lo
    y = (np.asarray(x, np.float64) - lo) % (2.0 * span)
    return lo + np.where(y > span, 2.0 * span - y, y)


def synthetic_clip(rng, seconds: float, sample_rate: int, n_channels: int = 4,
                   doa_step_deg: int | None = None,
                   event_rate_hz: float | None = None,
                   motion_deg_per_s: float | None = None):
    """A clip of FOA-panned tones + noise, and matching metadata rows.

    Events are genuinely spatialized: each source signal is panned onto
    the 4 channels with the SN3D gains for its labeled (az, el), so the
    DOA labels are recoverable from the audio (via the mel_iv intensity
    vectors) and localization is learnable — unlike random channel gains,
    under which any model collapses to background-everywhere. Each class
    gets a distinct fundamental so detection is learnable across files.
    Non-FOA channel counts fall back to random gains (shape-only data).

    doa_step_deg: if set, az/el are drawn from multiples of this step
    (el limited to [-60, 60]) instead of uniformly — directions then
    repeat across events, making localization learnable at fixture
    scale (648 cells vs a few hundred events otherwise). Multiples of
    45/90 are closed under the 16 ACS transforms.

    event_rate_hz: expected events per second. The default (None) keeps
    the legacy 2-8 events per CLIP — fine for the <=12 s fixture clips
    it was written for, but at 120 s it leaves ~95% of 5 s training
    windows pure background (the flagship accuracy study collapsed on
    exactly that corpus). Long training clips should set ~0.3-0.5.

    motion_deg_per_s: if set, sources MOVE — each event gets a constant
    angular velocity (magnitude ~ the knob +-20%, random direction in
    the (az, el) plane); the audio is panned with PER-SAMPLE SN3D gains
    along the trajectory and the metadata rows carry the per-100 ms-
    frame (az, el) at the frame midpoint, exactly STARSS22's moving-
    source labeling that the reference rasterizer consumes row-by-row
    (ref dataset.py:60-119). Azimuth wraps at the dateline (a moving
    source crossing +-180 exercises the wraparound for free); elevation
    reflects off the caps. With doa_step_deg, only the STARTING
    direction is lattice-quantized — trajectories leave the lattice,
    like real motion does.
    """
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    wave = 0.01 * rng.standard_normal((n_channels, n)).astype(np.float32)
    if event_rate_hz is None:
        n_events = rng.integers(2, 8)
    else:
        n_events = max(1, int(round(seconds * event_rate_hz)))
    rows = []
    for _ in range(n_events):
        cls = int(rng.integers(0, 13))
        # class-keyed fundamental (+ slight jitter): detection is learnable
        f0 = 220.0 * (2.0 ** (cls / 3.0)) * rng.uniform(0.98, 1.02)
        start_s = rng.uniform(0, max(seconds - 1.0, 0.1))
        dur_s = rng.uniform(0.3, 1.5)
        src = int(rng.integers(0, 3))
        if doa_step_deg is not None:
            step = int(doa_step_deg)
            az = int(rng.choice(np.arange(-180, 180, step)))
            # step-aligned and symmetric around 0 so the set is closed
            # under the ACS elevation flip (el -> -el)
            el_max = (60 // step) * step
            el = int(rng.choice(np.arange(-el_max, el_max + 1, step)))
        else:
            az = int(rng.integers(-180, 180))
            el = int(rng.integers(-90, 91))
        s0, s1 = int(start_s * sample_rate), min(int((start_s + dur_s) * sample_rate), n)
        tone = 0.3 * np.sin(2 * np.pi * f0 * t[s0:s1]).astype(np.float32)
        tone += 0.1 * np.sin(2 * np.pi * 2 * f0 * t[s0:s1]).astype(np.float32)
        if motion_deg_per_s is not None:
            # constant angular velocity; elevation bounces off the same
            # cap the start elevation was drawn from
            speed = motion_deg_per_s * rng.uniform(0.8, 1.2)
            theta = rng.uniform(0.0, 2.0 * np.pi)
            v_az, v_el = speed * np.cos(theta), speed * np.sin(theta)
            el_cap = float((60 // int(doa_step_deg)) * int(doa_step_deg)
                           if doa_step_deg is not None else 85)

            def angles_at(rel_t):
                return (_wrap_az(az + v_az * rel_t),
                        _reflect(el + v_el * rel_t, -el_cap, el_cap))
        else:
            def angles_at(rel_t):
                shape = np.shape(rel_t)
                return (np.full(shape, float(az)), np.full(shape, float(el)))
        if n_channels == 4:
            if motion_deg_per_s is not None:
                az_t, el_t = angles_at(np.arange(s1 - s0) / sample_rate)
                gains = foa_gains(az_t, el_t)  # (4, s1-s0) per-sample pan
            else:
                gains = foa_gains(az, el)[:, None]
        else:
            gains = rng.uniform(0.3, 1.0, (n_channels, 1)).astype(np.float32)
        wave[:, s0:s1] += tone * gains
        # metadata rows at 100 ms cadence over the active span, labeled
        # at the frame midpoint (the trajectory's per-frame average for
        # linear motion — STARSS22's per-frame az/el convention)
        for meta_frame in range(int(start_s * 10), int((start_s + dur_s) * 10)):
            rel_mid = np.clip((meta_frame + 0.5) / 10.0 - start_s,
                              0.0, dur_s)
            az_mf, el_mf = angles_at(rel_mid)
            rows.append((meta_frame, cls, src,
                         int(round(float(az_mf))), int(round(float(el_mf)))))
    # uniform rescale if overlapping events could clip the int16 wav
    # write — clipping is per-sample nonlinear and would corrupt the
    # SN3D channel RATIOS the intensity vectors decode; a uniform scale
    # preserves them exactly
    peak = float(np.max(np.abs(wave)))
    if peak > 0.99:
        wave *= np.float32(0.99 / peak)
    rows.sort()
    return wave, np.asarray(rows, dtype=np.int64).reshape(-1, 5)


def synthetic_corpus(
    cfg: Config, n_files: int = 2, seconds: float = 12.0, seed: int = 0,
    train: bool = True, doa_step_deg: int | None = None,
    event_rate_hz: float | None = None,
    motion_deg_per_s: float | None = None,
) -> WindowedCorpus:
    """Build a WindowedCorpus directly from in-memory synthetic clips."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        audio_files, meta_files = synthetic_raw_files(
            Path(td), cfg, n_files=n_files, seconds=seconds, seed=seed,
            doa_step_deg=doa_step_deg, event_rate_hz=event_rate_hz,
            motion_deg_per_s=motion_deg_per_s,
        )
        return build_corpus(
            audio_files, meta_files, cfg.features, cfg.grid, cfg.window,
            cfg.targets, train=train,
        )


def synthetic_raw_files(
    root: Path, cfg: Config, n_files: int = 2, seconds: float = 12.0, seed: int = 0,
    split_dirs: bool = False, doa_step_deg: int | None = None,
    event_rate_hz: float | None = None,
    motion_deg_per_s: float | None = None,
):
    """Write synthetic (wav, csv) pairs to disk; with split_dirs=True,
    lay out the STARSS22 directory structure for discovery tests."""
    rng = np.random.default_rng(seed)
    audio_files, meta_files = [], []
    for i in range(n_files):
        wave, rows = synthetic_clip(rng, seconds, cfg.features.sample_rate,
                                    doa_step_deg=doa_step_deg,
                                    event_rate_hz=event_rate_hz,
                                    motion_deg_per_s=motion_deg_per_s)
        if split_dirs:
            sub = "dev-train-sony" if i % 2 == 0 else "dev-train-tau"
            apath = root / cfg.data.audio_dirname / sub / f"fold3_room1_mix{i:03d}.wav"
            mpath = root / cfg.data.metadata_dirname / sub / f"fold3_room1_mix{i:03d}.csv"
        else:
            apath = root / f"clip{i:03d}.wav"
            mpath = root / f"clip{i:03d}.csv"
        write_wav(apath, wave, cfg.features.sample_rate)
        mpath.parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(mpath, rows, fmt="%d", delimiter=",")
        audio_files.append(str(apath))
        meta_files.append(str(mpath))
    return audio_files, meta_files


# STARSS22-realistic fixture events: (start_meta_frame, end_meta_frame,
# class, source, azimuth, elevation). Deliberately exercises the corners
# the random generator can miss (ref dataset.py:60-119 semantics):
#   * dateline azimuths at exactly +-180 and a crossing +175 -> -175
#   * elevation poles +-90
#   * two sources of the SAME class in the SAME metadata frame
#     (>1 CSV row per frame, multi-label cells)
#   * two different classes overlapping in time
_FIXTURE_EVENTS = {
    "train": [
        (0, 12, 2, 0, 180, 30),       # dateline east edge
        (0, 12, 2, 1, -180, -30),     # same class, second source, west edge
        (5, 18, 7, 0, -90, 90),       # pole elevation, overlaps class 2
        (20, 28, 4, 0, 175, 10),      # crossing pair: ends at +175 ...
        (28, 36, 4, 0, -175, 10),     # ... continues at -175 (wraps)
        (30, 38, 11, 1, 0, -90),      # south pole
    ],
    "test": [
        (0, 10, 2, 0, 179, 25),
        (0, 10, 5, 1, -179, -25),     # overlapping different class
        (12, 22, 9, 0, 45, 60),
        (12, 22, 9, 1, -135, -60),    # same class, two sources per frame
    ],
}


def starss_fixture(root: Path, cfg: Config, seconds: float = 6.0, seed: int = 0):
    """Write a STARSS22-format directory tree (foa_dev/metadata_dev with
    dev-{train,test}-{sony,tau} splits, fold-style filenames) containing
    deterministic multi-source / dateline / pole events, for end-to-end
    tests over the real discovery -> rasterize -> train -> serve path.

    Returns {split: (audio_files, meta_files)}.
    """
    rng = np.random.default_rng(seed)
    sr = cfg.features.sample_rate
    n = int(seconds * sr)
    t = np.arange(n) / sr
    out = {}
    for split, fold in (("train", 3), ("test", 4)):
        audio_files, meta_files = [], []
        for site_i, site in enumerate(("sony", "tau")):
            wave = 0.01 * rng.standard_normal((4, n)).astype(np.float32)
            rows = []
            for (f0, f1, cls, src, az, el) in _FIXTURE_EVENTS[split]:
                s0 = min(int(f0 * 0.1 * sr), n)
                s1 = min(int(f1 * 0.1 * sr), n)
                tone = 0.1 * np.sin(
                    2 * np.pi * (300.0 + 150.0 * cls) * t[s0:s1]
                ).astype(np.float32)
                gains = rng.uniform(0.3, 1.0, (4, 1)).astype(np.float32)
                wave[:, s0:s1] += tone * gains
                max_meta = int(seconds * 10)
                for mf in range(f0, min(f1, max_meta)):
                    rows.append((mf, cls, src, az, el))
            rows.sort()
            sub = f"dev-{split}-{site}"
            name = f"fold{fold}_room{site_i + 1}_mix001"
            apath = Path(root) / cfg.data.audio_dirname / sub / f"{name}.wav"
            mpath = Path(root) / cfg.data.metadata_dirname / sub / f"{name}.csv"
            write_wav(apath, wave, sr)
            mpath.parent.mkdir(parents=True, exist_ok=True)
            np.savetxt(mpath, np.asarray(rows, np.int64), fmt="%d", delimiter=",")
            audio_files.append(str(apath))
            meta_files.append(str(mpath))
        out[split] = (audio_files, meta_files)
    return out
