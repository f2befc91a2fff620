"""End-to-end learning signal: the flagship pipeline must beat chance.

Trains a small flagship-architecture model on a strongly correlated
synthetic fixture (EEG = linear mix of the stimulus + noise) and requires
the ICASSP match-mismatch eval to clear chance by a wide margin — the
framework-level analogue of the reference's quality claim."""

import os

import numpy as np
import pytest

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.data.discovery import get_train_val_test_files_final
from transformer_clip_eeg_tpu.data.fixtures import make_fixture
from transformer_clip_eeg_tpu.eval import evaluate_model_challenge_2023_mm
from transformer_clip_eeg_tpu.train import TrainConfig, Trainer


@pytest.mark.slow
def test_flagship_learns_above_chance(tmp_path):
    root = str(tmp_path / "data")
    make_fixture(
        root, n_stories=4, n_subjects=3, story_seconds=90, speech_dim=16,
        seed=3,
    )
    cfg = TrainConfig(
        data_dir=root, run=0, batch_size=8, epochs=12, patience=12,
        attention_depth=2, latent_dim=4, lstm_units=16,
        number_of_training_subjects=3, speech_dim_override=16,
        lr_scheduler="no",
    )
    files = get_train_val_test_files_final(
        root, 0, "wav2vec_19", cfg.fold_split_path, 3
    )
    train_ds = EEGWindowDataset(
        files[0], files[4], 192, 192, batch_size=8, shuffle=True,
        shuffle_percentage=1.0, seed=0,
    )
    val_ds = EEGWindowDataset(files[1], files[5], 192, 192, batch_size=8, seed=0)
    trainer = Trainer(cfg, train_ds, val_ds, results_dir=str(tmp_path / "run"))
    out = trainer.fit()

    # contrastive loss must fall well below the ln(B)=2.08 chance plateau
    assert out["best_loss"] < 1.4, out["history"]

    mm_dir = os.path.join(root, "icassp", "TEST_task1_matchmismatch")
    ev, _, ev_topx, _ = evaluate_model_challenge_2023_mm(
        trainer.model, trainer.state.variables, mm_dir,
        speech_feature="wav2vec_19",
    )
    accs = list(ev.values())
    mean_acc = float(np.mean(accs))
    # 2-candidate chance = 0.5; the correlated fixture is easy
    assert mean_acc >= 0.7, ev
    # top-1 retrieval over 12 candidates: chance = 1/12
    top1 = float(np.mean([c[0] for c in ev_topx.values()]))
    assert top1 >= 0.3, ev_topx
