"""Torch-oracle parity for the regression-eval primitives (VERDICT r4 #1a).

The reference's envelope-regression machinery lives at
``train_clip_helper_functions.py:1107-1140`` (PearsonLoss / PearsonLossMean /
RegressionModel) and ``:535-547`` (the stride-compensation upsample of EEG
embeddings to envelope length).  Every Pearson number the regression suite
had ever produced was ~0.0, so a sign flip or misalignment in any of these
was invisible — these tests pin each primitive against the reference's own
torch code at 1e-4.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

# stub braindecode so the reference helper imports (same pattern as
# test_data_pipeline.py — the helper pulls in dataset_loader → braindecode)
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
import train_clip_helper_functions as ref_helper  # noqa: E402

from transformer_clip_eeg_tpu.eval.regression import match_time_length  # noqa: E402
from transformer_clip_eeg_tpu.models.regression import (  # noqa: E402
    RegressionModel,
    pearson_loss,
    pearson_loss_mean,
)


def test_pearson_loss_oracle():
    """pearson_loss vs ref PearsonLoss (helper:1107-1117) at 1e-5.

    The reference computes in [B, C, T] (cosine over dim=2); ours runs in the
    TPU-native [B, T, C] layout with axis=1 — same numbers after permute.
    """
    rng = np.random.default_rng(0)
    for b, c, t in ((4, 1, 192), (8, 3, 64), (2, 8, 17)):
        x = rng.standard_normal((b, c, t)).astype(np.float32)
        y = rng.standard_normal((b, c, t)).astype(np.float32)
        ref = ref_helper.PearsonLoss()(torch.from_numpy(x), torch.from_numpy(y))
        ours = pearson_loss(
            np.transpose(x, (0, 2, 1)), np.transpose(y, (0, 2, 1)), axis=1
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_pearson_loss_sign_is_negative_correlation():
    """A perfectly correlated pair must give loss -1 (the sign contract a
    flipped implementation would break — exactly the failure mode the
    verdict flagged as invisible)."""
    rng = np.random.default_rng(1)
    sig = rng.standard_normal((5, 100, 1)).astype(np.float32)
    # affine transforms preserve Pearson r = 1
    loss = pearson_loss(sig, 3.0 * sig + 2.0, axis=1)
    np.testing.assert_allclose(np.asarray(loss), -np.ones(1), atol=1e-5)
    anti = pearson_loss(sig, -sig, axis=1)
    np.testing.assert_allclose(np.asarray(anti), np.ones(1), atol=1e-5)


def test_pearson_loss_mean_oracle():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 4, 96)).astype(np.float32)
    y = rng.standard_normal((6, 4, 96)).astype(np.float32)
    ref = ref_helper.PearsonLossMean()(torch.from_numpy(x), torch.from_numpy(y))
    ours = pearson_loss_mean(
        np.transpose(x, (0, 2, 1)), np.transpose(y, (0, 2, 1)), axis=1
    )
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-5)


def test_regression_model_forward_oracle():
    """RegressionModel (same-pad Conv1d k=32 + LeakyReLU, helper:1132-1140)
    forward parity under the reference's own weights at 1e-4."""
    torch.manual_seed(0)
    in_dim, out_dim, k = 8, 1, 32
    ref_model = ref_helper.RegressionModel(in_dim, out_dim, receptive_field=k)
    ref_model.eval()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 192, in_dim)).astype(np.float32)
    with torch.no_grad():
        # reference runs [B, C, T]
        ref_out = ref_model(torch.from_numpy(np.transpose(x, (0, 2, 1))))

    ours = RegressionModel(output_dim=out_dim, receptive_field=k)
    params = {
        "params": {
            "conv": {
                "kernel": ref_model.conv.weight.detach()
                .numpy()
                .transpose(2, 1, 0),
                "bias": ref_model.conv.bias.detach().numpy(),
            }
        }
    }
    out = ours.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out),
        np.transpose(ref_out.numpy(), (0, 2, 1)),
        atol=1e-4,
    )


def _ref_match_time_length(emb: np.ndarray, target_len: int) -> np.ndarray:
    """The reference's stride-compensation block, verbatim semantics
    (helper:535-547): nearest-neighbor F.interpolate by the integer stride,
    then extrapolate the last value.  Executable torch oracle."""
    e = torch.from_numpy(emb)
    if e.shape[1] != target_len:
        stride = int(target_len / e.shape[1])
        e = torch.transpose(
            F.interpolate(
                torch.transpose(e, 1, 2), scale_factor=stride, mode="nearest"
            ),
            1,
            2,
        )
        if e.shape[1] != target_len:
            e = torch.cat(
                [e, e[:, -1:, :].repeat(1, target_len - e.shape[1], 1)], dim=1
            )
    return e.numpy()


@pytest.mark.parametrize(
    "t,target",
    [
        (64, 192),   # exact stride 3
        (64, 200),   # stride 3 + extrapolate 8
        (100, 192),  # stride 1 (ragged) + extrapolate 92
        (192, 192),  # no-op
        (7, 192),    # stride 27 + extrapolate 3
    ],
)
def test_match_time_length_oracle(t, target):
    """match_time_length vs the reference's interpolate/extrapolate logic on
    every stride regime the reference survives (when the embedding is longer
    than the target the reference's ``int(target/t)`` stride is 0 and
    F.interpolate crashes — our crop branch is a documented extension)."""
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((2, t, 5)).astype(np.float32)
    ref = _ref_match_time_length(emb, target)
    ours = match_time_length(emb, target)
    assert ours.shape == ref.shape == (2, target, 5)
    np.testing.assert_array_equal(ours, ref)


def test_match_time_length_crop_extension():
    """Our crop branch (embedding longer than target — the reference would
    crash here, see ref :535-540 stride=0) keeps the leading samples."""
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((1, 300, 4)).astype(np.float32)
    out = match_time_length(emb, 192)
    np.testing.assert_array_equal(out, emb[:, :192])


@pytest.mark.slow
def test_regression_suite_positive_control(tmp_path):
    """End-to-end positive control (VERDICT r4 #1b): on an
    envelope-decodable fixture the full chain — CLIP training → frozen
    embedding extraction → general-probe training → challenge overlap-add
    reconstruction — must produce MATERIALLY POSITIVE Pearson.  A sign
    flip, misaligned ``match_time_length``, or degenerate probe anywhere
    drives it to ~0 and fails here.  (Measured on this fixture: probe test
    Pearson ≈ 0.91, challenge r ≈ 0.92 after 2 epochs.)
    """
    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.data.fixtures import make_fixture
    from transformer_clip_eeg_tpu.eval import (
        evaluate_model_challenge_2023_regression,
        evaluate_model_do_regression_sub_independent,
    )
    from transformer_clip_eeg_tpu.train import TrainConfig, Trainer

    root = str(tmp_path)
    make_fixture(
        root, n_stories=3, n_subjects=3, story_seconds=60, speech_dim=16,
        env_decodable=True,
    )
    cfg = TrainConfig(
        data_dir=root, run=0, batch_size=8, epochs=2, patience=5,
        attention_depth=2, latent_dim=4, lstm_units=16,
        number_of_training_subjects=3, speech_dim_override=16,
    )
    files = get_train_val_test_files_final(
        root, 0, "wav2vec_19", cfg.fold_split_path, 3
    )
    train_f, val_f, test_f = files[0], files[1], files[2]
    train_a, val_a, test_a = files[4], files[5], files[6]
    train_ds = EEGWindowDataset(
        train_f, train_a, 192, 192, batch_size=8, shuffle=True,
        shuffle_percentage=1.0, seed=0,
    )
    val_ds = EEGWindowDataset(val_f, val_a, 192, 192, batch_size=8, seed=0)
    results_dir = os.path.join(root, "results_run")
    trainer = Trainer(cfg, train_ds, val_ds, results_dir=results_dir)
    trainer.fit()

    ev = evaluate_model_do_regression_sub_independent(
        trainer.model, trainer.state.variables, train_f, val_f, test_f,
        train_a, val_a, test_a, results_dir, batch_size=8,
    )
    assert ev, "sub-independent eval produced no subjects"
    for sub, neg_pearson in ev.items():
        # loss is NEGATIVE pearson: decodable envelope must be decoded
        assert neg_pearson < -0.5, (sub, neg_pearson)

    reg, _ = evaluate_model_challenge_2023_regression(
        trainer.model, trainer.state.variables, results_dir,
        os.path.join(root, "icassp", "TEST_task2_regression"),
    )
    assert reg, "challenge regression produced no subjects"
    for sub, r in reg.items():
        assert r > 0.5, (sub, r)
