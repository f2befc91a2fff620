"""Learning-quality gate at FLAGSHIP shape on the real chip.

The in-suite gate (tests/test_learning_quality.py) trains depth-2 on the
virtual CPU mesh; the round-3 verdict flagged that no learning-quality
evidence existed at the depth-10 flagship shape on real hardware
(VERDICT r3 #5).  This runs the same gate — same fixture recipe, same
thresholds — with the reference's flagship architecture hyperparameters
(attention_depth 10, lstm_units 128, latent_dim 8; ref
``train_clip_final.py:170,179-180,216``) on the ambient platform (the
TPU when present).

    python scripts/learning_quality_flagship.py --out /tmp/lq_flagship

Prints one JSON line with best val loss_ce, MM accuracy, and top-1
retrieval, and exits nonzero if any gate threshold fails.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.data.fixtures import make_fixture
    from transformer_clip_eeg_tpu.eval import (
        evaluate_model_challenge_2023_mm,
    )
    from transformer_clip_eeg_tpu.train import TrainConfig, Trainer

    work = args.out or tempfile.mkdtemp(prefix="lq_flagship_")
    root = os.path.join(work, "data")
    if not os.path.exists(os.path.join(root, "fold_split.json")):
        make_fixture(root, n_stories=4, n_subjects=3, story_seconds=90,
                     speech_dim=16, seed=3)

    cfg = TrainConfig(
        data_dir=root, run=0, batch_size=args.batch_size,
        epochs=args.epochs, patience=args.epochs,
        attention_depth=10, latent_dim=8, lstm_units=128,
        number_of_training_subjects=3, speech_dim_override=16,
        lr_scheduler="no",
    )
    files = get_train_val_test_files_final(
        root, 0, "wav2vec_19", cfg.fold_split_path, 3
    )
    train_ds = EEGWindowDataset(
        files[0], files[4], 192, 192, batch_size=args.batch_size,
        shuffle=True, shuffle_percentage=1.0, seed=0,
    )
    val_ds = EEGWindowDataset(files[1], files[5], 192, 192,
                              batch_size=args.batch_size, seed=0)

    import jax

    t0 = time.time()
    trainer = Trainer(cfg, train_ds, val_ds,
                      results_dir=os.path.join(work, "run"))
    out = trainer.fit()
    train_s = time.time() - t0

    mm_dir = os.path.join(root, "icassp", "TEST_task1_matchmismatch")
    ev, _, ev_topx, _ = evaluate_model_challenge_2023_mm(
        trainer.model, trainer.state.variables, mm_dir,
        speech_feature="wav2vec_19",
    )
    mean_acc = float(np.mean(list(ev.values())))
    top1 = float(np.mean([c[0] for c in ev_topx.values()]))
    rec = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "attention_depth": 10,
        "lstm_units": 128,
        "latent_dim": 8,
        "best_val_loss_ce": float(out["best_loss"]),
        "mm_mean_accuracy": mean_acc,
        "top1_retrieval": top1,
        "train_s": round(train_s, 1),
    }
    print(json.dumps(rec))
    # same thresholds as the in-suite depth-2 gate
    ok = out["best_loss"] < 1.4 and mean_acc >= 0.7 and top1 >= 0.3
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
