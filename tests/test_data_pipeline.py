"""Data pipeline parity vs the reference loader (with braindecode stubbed)."""

import json
import os
import sys
import types

import numpy as np
import pytest

# --- stub braindecode so the reference dataset_loader imports -------------
if "braindecode" not in sys.modules:
    bd = types.ModuleType("braindecode")
    aug = types.ModuleType("braindecode.augmentation")
    for name in (
        "SignFlip", "FTSurrogate", "FrequencyShift", "BandstopFilter",
        "GaussianNoise", "SmoothTimeMask", "ChannelsDropout", "ChannelsShuffle",
    ):
        setattr(aug, name, lambda *a, **k: (lambda x: x))
    bd.augmentation = aug
    sys.modules["braindecode"] = bd
    sys.modules["braindecode.augmentation"] = aug

sys.path.insert(0, "/root/reference")
import dataset_loader as ref_loader  # noqa: E402
import train_clip_helper_functions as ref_helper  # noqa: E402

from transformer_clip_eeg_tpu.data import (  # noqa: E402
    EEGWindowDataset,
    get_train_val_test_files_final,
)
from transformer_clip_eeg_tpu.data.fixtures import make_fixture  # noqa: E402
from transformer_clip_eeg_tpu.ops.windowing import (  # noqa: E402
    split_into_windows_np,
)

WL = 192


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sparrkulee")
    meta = make_fixture(str(root), n_stories=4, n_subjects=3, story_seconds=120,
                        speech_dim=32, window_length=WL, seed=0)
    return meta


def test_split_discovery_matches_reference(fixture_root):
    root = fixture_root["root"]
    split_json = os.path.join(root, "fold_split.json")
    ours = get_train_val_test_files_final(root, 0, "wav2vec_19", split_json, 1000)
    theirs = ref_helper.get_train_val_test_files_final(
        root, 0, "wav2vec_19", split_json, 1000
    )
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert sorted(a) == sorted(list(b)), f"split list {i} differs"


def test_windowing_quirk():
    # evenly divisible length drops the final *full* window (ref :474-477)
    x = np.arange(384 * 2).reshape(384, 2)
    w = split_into_windows_np(x, 192)
    assert w.shape == (1, 192, 2)
    ref = ref_loader.EEGDatasetSimdata.split_into_windows.__get__(
        types.SimpleNamespace(window_length=192)
    )(x)
    np.testing.assert_array_equal(w, ref)
    # ragged tail dropped
    x2 = np.arange(400 * 2).reshape(400, 2)
    w2 = split_into_windows_np(x2, 192)
    assert w2.shape == (2, 192, 2)


def _build_datasets(fixture_root, bs=16):
    root = fixture_root["root"]
    split_json = os.path.join(root, "fold_split.json")
    tr, va, te, teh, tra, vaa, tea, teha = get_train_val_test_files_final(
        root, 0, "wav2vec_19", split_json, 1000
    )
    ours = EEGWindowDataset(tr, tra, WL, WL, batch_size=bs, seed=0)
    theirs = ref_loader.EEGDatasetSimdata(tr, tra, WL, WL, batch_size=bs)
    return ours, theirs


def test_ingest_matches_reference(fixture_root):
    ours, theirs = _build_datasets(fixture_root)
    assert sorted(ours.chunks.keys()) == sorted(theirs.eeg.keys())
    for key in ours.chunks:
        ref_chunk = theirs.eeg[key]
        our_chunk = ours.chunks[key]
        np.testing.assert_allclose(our_chunk["eeg"], ref_chunk["eeg"], atol=0)
        np.testing.assert_allclose(
            our_chunk["wav2vec_19"], ref_chunk["wav2vec_19"], atol=0
        )
        assert our_chunk["identifiers"] == ref_chunk["identifiers"]
        assert our_chunk["sub"] == ref_chunk["sub"]
    assert (
        ours.get_number_of_stimuli_segments()
        == theirs.get_number_of_stimuli_segments()
    )


def test_parallel_ingest_matches_serial(fixture_root):
    """io_workers>1 overlaps np.load I/O but must produce byte-identical
    chunks (identifier numbering depends on consumption order)."""
    root = fixture_root["root"]
    split_json = os.path.join(root, "fold_split.json")
    tr, _va, _te, _teh, tra, *_ = get_train_val_test_files_final(
        root, 0, "wav2vec_19", split_json, 1000
    )
    serial = EEGWindowDataset(tr, tra, WL, WL, batch_size=4, seed=0,
                              io_workers=1)
    threaded = EEGWindowDataset(tr, tra, WL, WL, batch_size=4, seed=0,
                                io_workers=4)
    assert list(serial.chunks.keys()) == list(threaded.chunks.keys())
    for key in serial.chunks:
        a, b = serial.chunks[key], threaded.chunks[key]
        assert a["identifiers"] == b["identifiers"]
        assert a["sub"] == b["sub"]
        np.testing.assert_array_equal(a["eeg"], b["eeg"])
        np.testing.assert_array_equal(a["wav2vec_19"], b["wav2vec_19"])


def test_iteration_contract(fixture_root):
    """Yielded batches must be self-consistent gathers of the chunk data."""
    ours, _ = _build_datasets(fixture_root)
    id_to_window = {}
    for chunk in ours.chunks.values():
        for j, ident in enumerate(chunk["identifiers"]):
            id_to_window[ident] = (chunk, j)
    n_batches = 0
    for eeg_batch, speech_list, ids, subs in ours:
        n_batches += 1
        bs = ours.batch_size
        assert eeg_batch.shape == (bs, WL, 64)
        assert speech_list[0].shape == (bs, WL, 32)
        assert ids.shape == (bs,)
        assert subs.shape == (bs,)
        # speech windows correspond exactly to the yielded segment ids
        for k in range(bs):
            chunk, j = id_to_window[int(ids[k])]
            np.testing.assert_array_equal(speech_list[0][k], chunk["wav2vec_19"][j])
    expected = sum(c["eeg"].shape[0] for c in ours.chunks.values())
    assert n_batches == expected  # one batch per (chunk, subject)


def test_cross_subject_shuffle(fixture_root):
    ours, _ = _build_datasets(fixture_root)
    ours.shuffle_subs = True
    ours.shuffle_percentage = 1.0
    key = ours.batches_keys[0]
    idx, subs = ours.create_eeg_indices(ours.chunks[key]["eeg"])
    n_subs, bs = subs.shape
    # every column must remain a permutation of subjects
    for col in range(bs):
        assert sorted(subs[:, col]) == list(range(n_subs))
    # with 100% shuffling at least one row mixes subjects
    assert any(len(set(subs[i])) > 1 for i in range(n_subs))


def test_sampling_without_replacement(fixture_root):
    ours, _ = _build_datasets(fixture_root)
    key = ours.batches_keys[0]
    idx, _ = ours.create_eeg_indices(ours.chunks[key]["eeg"])
    for row in idx:
        assert len(set(row.tolist())) == len(row)


def test_mixup_preserves_shape_and_convexity(fixture_root):
    ours, _ = _build_datasets(fixture_root)
    ours.addEEG = True
    ours.data_augmentation_probability = 1.0
    key = ours.batches_keys[0]
    eeg = ours.chunks[key]["eeg"]
    mixed = ours._mixup(eeg)
    assert mixed.shape == eeg.shape
    # convex combination bound: result within global min/max envelope
    assert mixed.max() <= eeg.max() + 1e-6
    assert mixed.min() >= eeg.min() - 1e-6
    assert not np.allclose(mixed, eeg)


def test_batch_equalizer_matches_reference(rng):
    from transformer_clip_eeg_tpu.data import batch_equalizer

    eeg = rng.standard_normal((4, 8, 3)).astype(np.float32)
    s1 = rng.standard_normal((4, 8, 2)).astype(np.float32)
    s2 = rng.standard_normal((4, 8, 2)).astype(np.float32)
    ours_f, ours_l = batch_equalizer([eeg, s1, s2])
    ref_f, ref_l = ref_loader.batch_equalizer([eeg, s1, s2])
    assert len(ours_f) == len(ref_f)
    for a, b in zip(ours_f, ref_f):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ours_l, ref_l)


def test_split_reference_oracle(tmp_path):
    """Our split vs the reference's get_train_val_test_files_final on the
    same fixture tree: all 8 lists must match as sets, debug and full
    (ref train_clip_helper_functions.py:383-440)."""
    import sys
    import types

    if "braindecode" not in sys.modules:
        stub = types.ModuleType("braindecode")
        aug = types.ModuleType("braindecode.augmentation")
        for name in [
            "SignFlip", "FTSurrogate", "FrequencyShift", "BandstopFilter",
            "GaussianNoise", "SmoothTimeMask", "ChannelsDropout",
            "ChannelsShuffle",
        ]:
            setattr(aug, name, object)
        stub.augmentation = aug
        sys.modules["braindecode"] = stub
        sys.modules["braindecode.augmentation"] = aug
    sys.path.insert(0, "/root/reference")
    import train_clip_helper_functions as ref_helper

    root = str(tmp_path / "data")
    make_fixture(root, n_stories=4, n_subjects=3, story_seconds=45,
                 speech_dim=8)
    fold = os.path.join(root, "fold_split.json")
    for run in (0, 3):
        for debug in (False, True):
            ours = get_train_val_test_files_final(
                root, run, "wav2vec_19", fold, 2, debug=debug
            )
            ref = ref_helper.get_train_val_test_files_final(
                root, run, "wav2vec_19", fold, 2, debug=debug
            )
            assert len(ours) == len(ref) == 8
            for i, (a, b) in enumerate(zip(ours, ref)):
                assert sorted(a) == sorted(b), (run, debug, i)


def test_dataset_ingestion_reference_oracle(tmp_path):
    """Our chunk store vs the reference's EEGDatasetSimdata.load_files on
    the same files: chunk keys, EEG/speech window contents, identifiers,
    and subject order must be identical (ref dataset_loader.py:197-281)."""
    import sys
    import types

    if "braindecode" not in sys.modules:
        stub = types.ModuleType("braindecode")
        aug = types.ModuleType("braindecode.augmentation")
        for name in [
            "SignFlip", "FTSurrogate", "FrequencyShift", "BandstopFilter",
            "GaussianNoise", "SmoothTimeMask", "ChannelsDropout",
            "ChannelsShuffle",
        ]:
            setattr(aug, name, object)
        stub.augmentation = aug
        sys.modules["braindecode"] = stub
        sys.modules["braindecode.augmentation"] = aug
    sys.path.insert(0, "/root/reference")
    import dataset_loader as ref_loader

    root = str(tmp_path / "data")
    make_fixture(root, n_stories=3, n_subjects=3, story_seconds=45,
                 speech_dim=8)
    fold = os.path.join(root, "fold_split.json")
    files = get_train_val_test_files_final(root, 0, "wav2vec_19", fold, 3)
    train_f, train_a = files[0], files[4]

    bs = 4
    ref_ds = ref_loader.EEGDatasetSimdata(
        list(train_f), list(train_a), 192, 192, batch_size=bs
    )
    ours = EEGWindowDataset(train_f, train_a, 192, 192, batch_size=bs, seed=0)

    assert sorted(ours.chunks.keys()) == sorted(ref_ds.eeg.keys())
    assert (
        ours.get_number_of_stimuli_segments()
        == ref_ds.get_number_of_stimuli_segments()
    )
    for key in ref_ds.eeg:
        ref_chunk = ref_ds.eeg[key]
        our_chunk = ours.chunks[key]
        assert our_chunk["sub"] == ref_chunk["sub"], key
        np.testing.assert_array_equal(
            np.asarray(our_chunk["identifiers"]),
            np.asarray(ref_chunk["identifiers"]), err_msg=key,
        )
        np.testing.assert_array_equal(
            our_chunk["eeg"], ref_chunk["eeg"], err_msg=key
        )
        np.testing.assert_array_equal(
            our_chunk["wav2vec_19"], ref_chunk["wav2vec_19"], err_msg=key
        )
