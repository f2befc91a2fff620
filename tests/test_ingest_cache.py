"""Unit coverage for the memmap-backed ingest file cache.

The cross-fold ingest cache (``data/dataset.py:_cached_load``) memoizes
raw ``.npy`` reads as READ-ONLY MEMMAPS so the 9-suite cv eval loop does
not retain tens of GB of fragmented heap (SCALE.md round 5).  Until now
it was exercised only by the slow cv-parallel e2e twin; these fast tests
pin its contract directly:

  * cache off  → plain heap ndarray, nothing memoized;
  * cache on   → read-only memmap, same object on repeat reads,
    values byte-identical to a heap load;
  * ingest through ``EEGWindowDataset`` (serial and threaded I/O paths)
    produces byte-identical chunks with the cache installed, and the
    cache ends up holding memmaps for every ``.npy`` it read.
"""

import os

import numpy as np
import pytest

from transformer_clip_eeg_tpu.data import (
    EEGWindowDataset,
    get_train_val_test_files_final,
)
from transformer_clip_eeg_tpu.data.dataset import (
    _cached_load,
    set_ingest_file_cache,
)
from transformer_clip_eeg_tpu.data.fixtures import make_fixture

WL = 192


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest_cache_corpus")
    return make_fixture(
        str(root), n_stories=4, n_subjects=3, story_seconds=120,
        speech_dim=8, window_length=WL, seed=3,
    )


@pytest.fixture(autouse=True)
def _always_reset_cache():
    # the cache is a process-wide global: never leak it into other tests
    yield
    set_ingest_file_cache(None)


def test_cached_load_disabled_returns_heap_array(tmp_path):
    path = os.path.join(tmp_path, "x.npy")
    np.save(path, np.arange(12.0).reshape(3, 4))
    set_ingest_file_cache(None)
    arr = _cached_load(path)
    assert not isinstance(arr, np.memmap)
    assert arr.flags.writeable
    np.testing.assert_array_equal(arr, np.arange(12.0).reshape(3, 4))


def test_cached_load_memoizes_readonly_memmaps(tmp_path):
    path = os.path.join(tmp_path, "x.npy")
    ref = np.arange(30.0).reshape(5, 6)
    np.save(path, ref)
    cache = {}
    set_ingest_file_cache(cache)
    arr = _cached_load(path)
    # file-backed, not heap; read-only so any in-place downstream mutation
    # would raise instead of silently corrupting the shared cache
    assert isinstance(arr, np.memmap)
    assert not arr.flags.writeable
    np.testing.assert_array_equal(np.asarray(arr), ref)
    # memoized: the very same object comes back, and it is the cached one
    assert _cached_load(path) is arr
    assert cache[path] is arr
    with pytest.raises((ValueError, RuntimeError)):
        arr[0, 0] = -1.0


def _ingest(fixture_root, io_workers, cache):
    root = fixture_root["root"]
    split_json = os.path.join(root, "fold_split.json")
    tr, _va, _te, _teh, tra, *_ = get_train_val_test_files_final(
        root, 0, "wav2vec_19", split_json, 1000
    )
    set_ingest_file_cache(cache)
    try:
        return EEGWindowDataset(
            tr, tra, WL, WL, batch_size=8, seed=0, io_workers=io_workers
        )
    finally:
        set_ingest_file_cache(None)


@pytest.mark.parametrize("io_workers", [1, 4])
def test_ingest_identical_with_cache_installed(fixture_root, io_workers):
    baseline = _ingest(fixture_root, io_workers=1, cache=None)
    cache = {}
    cached = _ingest(fixture_root, io_workers=io_workers, cache=cache)

    assert baseline.chunks, "fixture produced no train chunks — test is vacuous"
    assert sorted(cached.chunks.keys()) == sorted(baseline.chunks.keys())
    for key, chunk in baseline.chunks.items():
        got = cached.chunks[key]
        for feat in ("eeg", "wav2vec_19"):
            np.testing.assert_array_equal(got[feat], chunk[feat])
            # chunk arrays MAY stay memmap-backed (that is the point of the
            # cache) — but then they must be read-only, so an accidental
            # in-place mutation downstream raises instead of corrupting the
            # cache shared across folds
            if isinstance(got[feat], np.memmap) or (
                got[feat].base is not None
                and isinstance(got[feat].base, np.memmap)
            ):
                assert not got[feat].flags.writeable
        assert got["identifiers"] == chunk["identifiers"]
        assert got["sub"] == chunk["sub"]

    # every .npy the ingest touched is now memoized as a memmap
    assert cache, "ingest with a cache installed memoized nothing"
    for path, arr in cache.items():
        assert path.endswith(".npy")
        assert isinstance(arr, np.memmap)
        assert not arr.flags.writeable

    # a second ingest served from the warm cache is still byte-identical
    rewarm = _ingest(fixture_root, io_workers=io_workers, cache=cache)
    for key, chunk in baseline.chunks.items():
        np.testing.assert_array_equal(
            rewarm.chunks[key]["eeg"], chunk["eeg"]
        )
