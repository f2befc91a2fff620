"""Device-resident chunk store: gather equivalence + device-mode training."""

import numpy as np
import pytest

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.data.discovery import get_train_val_test_files_final
from transformer_clip_eeg_tpu.data.fixtures import make_fixture
from transformer_clip_eeg_tpu.train import TrainConfig, Trainer
from transformer_clip_eeg_tpu.train.device_data import (
    DeviceChunkStore,
    gather_batch,
)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparrkulee_dev"))
    make_fixture(root, n_stories=3, n_subjects=3, story_seconds=60, speech_dim=16)
    files = get_train_val_test_files_final(
        root, 0, "wav2vec_19", f"{root}/fold_split.json", 3
    )
    train = EEGWindowDataset(files[0], files[4], 192, 192, batch_size=8, seed=0)
    val = EEGWindowDataset(files[1], files[5], 192, 192, batch_size=8, seed=0)
    return root, train, val


def test_gather_matches_host_path(ds):
    _, train, _ = ds
    store = DeviceChunkStore(train)
    key = train.batches_keys[0]
    chunk = train.chunks[key]
    eeg_d, sp_d, ids_d, n_subs, n_win = store.get(key)
    assert n_subs == chunk["eeg"].shape[0]
    assert n_win == chunk["eeg"].shape[1]
    # padded regions are zeros and never indexed
    rng = np.random.default_rng(0)
    idx = rng.choice(n_win, 8, replace=False).astype(np.int32)
    subs = rng.integers(0, n_subs, 8).astype(np.int32)
    batch = gather_batch(eeg_d, sp_d, ids_d, idx, subs)
    # (host chunk arrays are float64 after zero-padding; store is f32)
    np.testing.assert_allclose(
        np.asarray(batch["eeg"]), chunk["eeg"][subs, idx], rtol=1e-6
    )
    feature = train.features_to_load[0]
    np.testing.assert_allclose(
        np.asarray(batch["speech"]), chunk[feature][idx], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(batch["ids"]), np.asarray(chunk["identifiers"])[idx]
    )


def test_epoch_batches_counts(ds):
    _, train, _ = ds
    store = DeviceChunkStore(train, max_resident=1)
    batches = list(store.epoch_batches(shuffle=False, add_eeg=True))
    expected = sum(
        c["eeg"].shape[0] for c in train.chunks.values() if "eeg" in c
    )
    assert len(batches) == expected
    _, _, _, idx, subs, partner = batches[0]
    assert idx.shape == subs.shape == partner.shape
    n_subs = train.chunks[train.batches_keys[0]]["eeg"].shape[0]
    assert partner.max() < n_subs  # never points at padded rows


def test_device_mode_training(ds, tmp_path):
    root, train, val = ds
    cfg = TrainConfig(
        data_dir=root, run=0, batch_size=8, epochs=2, patience=5,
        attention_depth=1, latent_dim=4, lstm_units=8,
        number_of_training_subjects=3, speech_dim_override=16,
        data_mode="device",
    )
    trainer = Trainer(
        cfg, train, val, results_dir=str(tmp_path / "devrun")
    )
    assert trainer.device_data
    out = trainer.fit()
    assert np.isfinite(out["best_loss"])
    assert out["history"][-1]["val_loss_ce"] <= out["history"][0][
        "val_loss_ce"
    ] + 0.5
