"""Vectorized spatial-grid label rasterization.

Parity contract (ref: dataset.py:60-119):
  * metadata rows are (frame@100ms, class, source, azimuth, elevation);
  * each metadata frame fans out to `fanout`=5 label frames @20 ms
    (ref: dataset.py:67-70, 100-103);
  * the event's grid cell comes from polar_to_grid and is flattened as
    i * n_az + j (ref: dataset.py:105-106);
  * labels[t, cell, class] = 1.0 for every covered frame — multiple
    classes may be active in one cell (multi-hot), later rows never erase
    earlier ones (ref: dataset.py:109-111);
  * cells with no event in a frame get background=1 at class index
    num_classes-1 (ref: dataset.py:113-117).

TPU-native design: instead of materializing the dense (T, 648, 14) float32
tensor (the reference holds the whole corpus dense in RAM — tens of GB for
the full dataset), labels are stored as a (T, 648) uint16 *class bitmask*
(bit c set <=> class c active in that cell; zero <=> background). The dense
one-hot target is decoded on-device inside the jitted train step with two
vector ops, cutting label HBM/host traffic by 112x while reproducing the
reference's semantics exactly (events are classes 0..12, so 13 bits
suffice; background is derived as mask == 0).
"""

from __future__ import annotations

import numpy as np

from seld_tpu.grid import cell_index, polar_to_grid


def total_label_frames(n_samples: int, sample_rate: int, label_frame_ms: int = 20) -> int:
    """Number of 20 ms label frames for a clip.

    ref: dataset.py:73 — total_frames = int(duration_s * 1000 / 20) with
    duration_s = n_samples / sample_rate (float division, truncated).
    """
    return int((n_samples / sample_rate) * 1000.0 / label_frame_ms)


def encode_events_to_bitmask(
    frames: np.ndarray,
    classes: np.ndarray,
    azimuths: np.ndarray,
    elevations: np.ndarray,
    total_frames: int,
    n_el: int = 18,
    n_az: int = 36,
    fanout: int = 5,
) -> np.ndarray:
    """Rasterize metadata rows into a (T, n_el*n_az) uint16 class bitmask.

    Fully vectorized: one scatter-or per fanout offset instead of the
    reference's per-row x per-frame Python loops (ref: dataset.py:92-111).
    """
    mask = np.zeros((total_frames, n_el * n_az), dtype=np.uint16)
    if len(frames) == 0:
        return mask
    frames = np.asarray(frames, dtype=np.int64)
    classes = np.asarray(classes, dtype=np.int64)
    i, j = polar_to_grid(azimuths, elevations, n_el, n_az)
    cells = cell_index(i.astype(np.int64), j.astype(np.int64), n_az)
    bits = (1 << classes).astype(np.uint16)
    base = frames * fanout
    for o in range(fanout):
        t = base + o
        valid = t < total_frames
        np.bitwise_or.at(mask, (t[valid], cells[valid]), bits[valid])
    return mask


def bitmask_to_dense(mask: np.ndarray, num_classes: int = 14) -> np.ndarray:
    """Decode a (T, G) uint16 bitmask to dense (T, G, num_classes) float32
    one/multi-hot labels with derived background — numpy reference decoder
    (the on-device decoder lives in seld_tpu.targets.rasterize.decode_class_bitmask)."""
    event_bits = np.arange(num_classes - 1, dtype=np.uint16)
    onehot = ((mask[..., None] >> event_bits) & 1).astype(np.float32)
    background = (mask == 0).astype(np.float32)[..., None]
    return np.concatenate([onehot, background], axis=-1)


def decode_class_bitmask(mask, num_classes: int = 14, class_major: bool = False):
    """On-device (jit-friendly) bitmask -> dense one-hot decoder.

    mask: integer array (..., G). Returns float32 (..., G, num_classes),
    or the repo's class-major (..., num_classes, G) loss layout when
    `class_major=True`. Background (last class) = 1 where no event bit
    is set, matching ref dataset.py:113-117.
    """
    import jax.numpy as jnp

    m = mask.astype(jnp.int32)
    event_bits = jnp.arange(num_classes - 1, dtype=jnp.int32)
    if class_major:
        onehot = ((m[..., None, :] >> event_bits[:, None]) & 1).astype(jnp.float32)
        background = (m == 0).astype(jnp.float32)[..., None, :]
        return jnp.concatenate([onehot, background], axis=-2)
    onehot = ((m[..., None] >> event_bits) & 1).astype(jnp.float32)
    background = (m == 0).astype(jnp.float32)[..., None]
    return jnp.concatenate([onehot, background], axis=-1)


def rasterize_point_labels(
    frames: np.ndarray,
    classes: np.ndarray,
    azimuths: np.ndarray,
    elevations: np.ndarray,
    total_frames: int,
    n_el: int = 18,
    n_az: int = 36,
    num_classes: int = 14,
    fanout: int = 5,
) -> np.ndarray:
    """Dense (T, G, M) float32 point-target labels — direct parity output
    (composition of the bitmask encoder and decoder)."""
    mask = encode_events_to_bitmask(
        frames, classes, azimuths, elevations, total_frames, n_el, n_az, fanout
    )
    return bitmask_to_dense(mask, num_classes)


def load_metadata_csv(path) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a STARSS22 metadata CSV (no header: frame, class, source,
    azimuth, elevation — ref dataset.py:86, 92-97).

    Returns (frames, classes, sources, azimuths, elevations) as int arrays.
    """
    data = np.loadtxt(path, delimiter=",", dtype=np.int64, ndmin=2)
    if data.size == 0:
        z = np.zeros((0,), dtype=np.int64)
        return z, z, z, z, z
    return data[:, 0], data[:, 1], data[:, 2], data[:, 3], data[:, 4]
