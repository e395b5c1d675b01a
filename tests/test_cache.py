"""Corpus feature cache (seld_tpu/data/cache.py).

Contract: a cache hit returns arrays bit-identical to a fresh build; any
change to an input file or a relevant config knob produces a different key
(a rebuild); corrupt cache entries are rebuilt, never trusted.
"""

import dataclasses

import numpy as np
import pytest

from seld_tpu.config import Config
from seld_tpu.data import build_corpus, cached_build_corpus, synthetic_raw_files
from seld_tpu.data.cache import corpus_cache_key


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache_fixture")
    cfg = Config()
    return synthetic_raw_files(root, cfg, n_files=2, seconds=6.0, seed=3)


def _build(cfg, files, cache_dir, train=True):
    a, m = files
    return cached_build_corpus(
        a, m, cfg.features, cfg.grid, cfg.window, cfg.targets,
        train=train, cache_dir=cache_dir,
    )


def _assert_equal(a, b):
    np.testing.assert_array_equal(a.mel, b.mel)
    np.testing.assert_array_equal(a.label_mask, b.label_mask)
    np.testing.assert_array_equal(a.starts, b.starts)
    assert (a.window_frames, a.total_frames, a.n_el, a.n_az, a.num_classes) == (
        b.window_frames, b.total_frames, b.n_el, b.n_az, b.num_classes
    )
    if a.accdoa is None:
        assert b.accdoa is None
    else:
        np.testing.assert_array_equal(a.accdoa, b.accdoa)


def test_hit_is_bit_identical_and_skips_build(files, tmp_path, monkeypatch):
    cfg = Config()
    cache = str(tmp_path / "cache")
    fresh = _build(cfg, files, cache)  # miss: builds + stores
    assert len(list((tmp_path / "cache").glob("corpus_*.npz"))) == 1

    # A hit must not invoke the builder at all.
    import seld_tpu.data.cache as cache_mod

    def boom(*a, **k):
        raise AssertionError("build_corpus called on a cache hit")

    monkeypatch.setattr(cache_mod, "build_corpus", boom)
    hit = _build(cfg, files, cache)
    _assert_equal(fresh, hit)


def test_empty_cache_dir_is_plain_build(files):
    cfg = Config()
    a, m = files
    direct = build_corpus(
        a, m, cfg.features, cfg.grid, cfg.window, cfg.targets, train=True
    )
    uncached = _build(cfg, files, cache_dir="")
    _assert_equal(direct, uncached)


def test_accdoa_targets_roundtrip(files, tmp_path):
    cfg = Config().replace_path("targets.accdoa", True)
    cache = str(tmp_path / "cache")
    fresh = _build(cfg, files, cache)
    assert fresh.accdoa is not None
    hit = _build(cfg, files, cache)
    _assert_equal(fresh, hit)


def test_key_changes_on_file_edit_and_config_change(files, tmp_path):
    cfg = Config()
    a, m = files
    k0 = corpus_cache_key(a, m, cfg.features, cfg.grid, cfg.window,
                          cfg.targets, train=True)
    # train flag participates
    k_eval = corpus_cache_key(a, m, cfg.features, cfg.grid, cfg.window,
                              cfg.targets, train=False)
    assert k_eval != k0
    # config knob participates
    cfg2 = cfg.replace_path("targets.use_gaussian_augmentation", True)
    k_cfg = corpus_cache_key(a, m, cfg2.features, cfg2.grid, cfg2.window,
                             cfg2.targets, train=True)
    assert k_cfg != k0
    # touching a metadata file (size change) participates
    with open(m[0], "a") as fh:
        fh.write("0,0,0,0,0\n")
    k_edit = corpus_cache_key(a, m, cfg.features, cfg.grid, cfg.window,
                              cfg.targets, train=True)
    assert k_edit != k0
    # restore for other tests (module-scoped fixture)
    lines = open(m[0]).read().splitlines(keepends=True)
    with open(m[0], "w") as fh:
        fh.writelines(lines[:-1])


def test_corrupt_entry_rebuilds(files, tmp_path):
    cfg = Config()
    cache_dir = tmp_path / "cache"
    fresh = _build(cfg, files, str(cache_dir))
    (entry,) = cache_dir.glob("corpus_*.npz")
    entry.write_bytes(b"not an npz")
    rebuilt = _build(cfg, files, str(cache_dir))
    _assert_equal(fresh, rebuilt)
    # and the rebuild restored a loadable entry
    hit = _build(cfg, files, str(cache_dir))
    _assert_equal(fresh, hit)


def test_gaussian_augmentation_cached_deterministically(files, tmp_path):
    cfg = Config().replace_path("targets.use_gaussian_augmentation", True)
    cache = str(tmp_path / "cache")
    fresh = _build(cfg, files, cache, train=True)
    hit = _build(cfg, files, cache, train=True)
    _assert_equal(fresh, hit)
    # eval never augments, so its labels are sparser and live under a
    # separate cache entry (train flag participates in the key)
    ev = _build(cfg, files, cache, train=False)
    assert np.count_nonzero(ev.label_mask) < np.count_nonzero(fresh.label_mask)
    assert len(list((tmp_path / "cache").glob("corpus_*.npz"))) == 2


def test_cli_path_uses_cache(files, tmp_path, monkeypatch):
    """The CLI's corpus builder routes through the cache when
    data.cache_dir is set: two invocations share the entries."""
    from seld_tpu.cli import _build_corpora
    from seld_tpu.utils.logging import get_logger

    a, m = files
    cache_dir = tmp_path / "clicache"
    cfg = Config().replace_path("data.cache_dir", str(cache_dir))

    import seld_tpu.data as data_pkg

    # _build_corpora resolves discover_files from seld_tpu.data at call time
    monkeypatch.setattr(
        data_pkg, "discover_files", lambda _: (a, m, a[:1], m[:1])
    )
    c1 = _build_corpora(cfg, synthetic=False, logger=get_logger())
    assert len(list(cache_dir.glob("corpus_*.npz"))) == 2  # train + test
    c2 = _build_corpora(cfg, synthetic=False, logger=get_logger())
    assert len(list(cache_dir.glob("corpus_*.npz"))) == 2
    _assert_equal(c1[0], c2[0])
    _assert_equal(c1[1], c2[1])
