"""On-disk corpus/feature cache (TPU-framework addition).

The reference rebuilds the entire corpus eagerly on every run — per-file
decode + mel + label rasterization inside ``SELDDataset.__init__``
(ref dataset.py:212-317) — which costs minutes at STARSS22 scale. This
module caches the finished :class:`WindowedCorpus` arrays to a single
``.npz`` keyed on the *inputs* that determine them: the ordered file list
(resolved path, size, mtime) plus the feature/grid/window/target configs
and the train flag. Any change to a file or a knob produces a different
key, so stale hits are impossible without touching a file in place while
preserving size AND mtime.

Enabled via ``data.cache_dir`` (empty string = off, the default). Cache
writes are atomic (tmp file + ``os.replace``) so concurrent runs sharing a
cache directory never observe a torn file; unreadable/corrupt entries are
rebuilt, never trusted.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
from pathlib import Path

import numpy as np

from seld_tpu.config import FeatureConfig, GridConfig, TargetConfig, WindowConfig
from seld_tpu.data.corpus import WindowedCorpus, build_corpus
from seld_tpu.utils.logging import get_logger

# Bump whenever the WindowedCorpus array contents/semantics change
# (e.g. a rasterizer fix) so old caches invalidate automatically.
CACHE_FORMAT_VERSION = 1


def _file_sig(path) -> list:
    st = os.stat(path)
    return [str(Path(path).resolve()), st.st_size, st.st_mtime_ns]


def corpus_cache_key(
    audio_files,
    metadata_files,
    feat: FeatureConfig,
    grid: GridConfig,
    window: WindowConfig,
    targets: TargetConfig,
    train: bool,
) -> str:
    """Hex digest identifying one corpus build's full input set."""
    key = {
        "version": CACHE_FORMAT_VERSION,
        "audio": [_file_sig(p) for p in audio_files],
        "metadata": [_file_sig(p) for p in metadata_files],
        "features": dataclasses.asdict(feat),
        "grid": dataclasses.asdict(grid),
        "window": dataclasses.asdict(window),
        "targets": dataclasses.asdict(targets),
        "train": bool(train),
    }
    blob = json.dumps(key, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:24]


def _save_corpus(path: Path, corpus: WindowedCorpus, key: str) -> None:
    meta = {
        "key": key,
        "window_frames": corpus.window_frames,
        "total_frames": corpus.total_frames,
        "n_el": corpus.n_el,
        "n_az": corpus.n_az,
        "num_classes": corpus.num_classes,
    }
    arrays = {
        "mel": corpus.mel,
        "label_mask": corpus.label_mask,
        "starts": corpus.starts,
        "meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    if corpus.accdoa is not None:
        arrays["accdoa"] = corpus.accdoa
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_corpus(path: Path, key: str) -> WindowedCorpus:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["key"] != key:  # digest-prefix collision guard
            raise ValueError("cache key mismatch")
        return WindowedCorpus(
            mel=z["mel"],
            label_mask=z["label_mask"],
            starts=z["starts"],
            window_frames=int(meta["window_frames"]),
            total_frames=int(meta["total_frames"]),
            n_el=int(meta["n_el"]),
            n_az=int(meta["n_az"]),
            num_classes=int(meta["num_classes"]),
            accdoa=z["accdoa"] if "accdoa" in z.files else None,
        )


def cached_build_corpus(
    audio_files,
    metadata_files,
    feat: FeatureConfig,
    grid: GridConfig,
    window: WindowConfig,
    targets: TargetConfig,
    train: bool = True,
    cache_dir: str = "",
) -> WindowedCorpus:
    """``build_corpus`` with an optional on-disk cache.

    With ``cache_dir`` empty this is exactly ``build_corpus``. Otherwise a
    hit loads the stored arrays (identical to a fresh build — the build is
    deterministic, including Gaussian augmentation which is keyed on
    ``targets.augmentation_seed`` + file order); a miss builds then stores.
    Cache failures degrade to a rebuild with a warning, never an error.
    """
    if not cache_dir:
        return build_corpus(
            audio_files, metadata_files, feat, grid, window, targets, train=train
        )
    log = get_logger()
    cdir = Path(cache_dir)
    cdir.mkdir(parents=True, exist_ok=True)
    key = corpus_cache_key(
        audio_files, metadata_files, feat, grid, window, targets, train
    )
    path = cdir / f"corpus_{key}.npz"
    if path.exists():
        try:
            corpus = _load_corpus(path, key)
            log.info(
                "Corpus cache hit: %s (%d windows, %d frames)",
                path, len(corpus), corpus.total_frames,
            )
            return corpus
        except Exception as e:  # corrupt/torn/foreign file: rebuild
            log.warning("Corpus cache %s unreadable (%s); rebuilding", path, e)
    corpus = build_corpus(
        audio_files, metadata_files, feat, grid, window, targets, train=train
    )
    try:
        _save_corpus(path, corpus, key)
        log.info("Corpus cache stored: %s", path)
    except Exception as e:  # read-only dir, disk full, ...
        log.warning("Corpus cache store failed (%s); continuing uncached", e)
    return corpus
