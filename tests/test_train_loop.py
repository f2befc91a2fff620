"""End-to-end training-layer tests on the synthetic SparrKULee fixture."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.data.discovery import get_train_val_test_files_final
from transformer_clip_eeg_tpu.data.fixtures import make_fixture
from transformer_clip_eeg_tpu.train import (
    TrainConfig,
    Trainer,
    batch_iterator,
    make_scheduler,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparrkulee"))
    make_fixture(root, n_stories=3, n_subjects=3, story_seconds=60, speech_dim=16)
    return root


def small_config(root, **overrides) -> TrainConfig:
    defaults = dict(
        data_dir=root,
        run=0,
        batch_size=8,
        epochs=3,
        patience=5,
        attention_depth=2,
        latent_dim=4,
        lstm_units=16,
        window_length_s=3,
        number_of_training_subjects=3,
        stimulus_features="wav2vec_19",
        speech_dim_override=16,  # fixture stimuli are 16-dim for speed
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def make_datasets(cfg: TrainConfig):
    (train_f, val_f, _t, _h, train_a, val_a, _ta, _ha) = (
        get_train_val_test_files_final(
            cfg.data_dir,
            cfg.run,
            cfg.stimulus_features,
            cfg.fold_split_path,
            cfg.number_of_training_subjects,
        )
    )
    train_ds = EEGWindowDataset(
        train_f,
        train_a,
        cfg.window_length,
        cfg.hop_length,
        batch_size=cfg.batch_size,
        shuffle=cfg.shuffle_b,
        shuffle_percentage=cfg.shuffle_percentage,
        seed=0,
    )
    val_ds = EEGWindowDataset(
        val_f, val_a, cfg.window_length, cfg.hop_length,
        batch_size=cfg.batch_size, seed=0,
    )
    return train_ds, val_ds


def test_batch_iterator_shapes(fixture_root):
    cfg = small_config(fixture_root)
    train_ds, _ = make_datasets(cfg)
    batches = list(batch_iterator(train_ds, add_eeg=True))
    assert batches
    b = batches[0]
    assert b["eeg"].shape == (8, 192, 64)
    assert b["partner_eeg"].shape == (8, 192, 64)
    assert b["speech"].shape == (8, 192, 16)
    assert b["ids"].shape == (8,)
    assert b["ids"].min() >= 1


def test_trainer_learns_and_checkpoints(fixture_root, tmp_path):
    cfg = small_config(fixture_root, epochs=3)
    train_ds, val_ds = make_datasets(cfg)
    results_dir = str(tmp_path / "results_run")
    trainer = Trainer(cfg, train_ds, val_ds, results_dir=results_dir)
    out = trainer.fit()

    assert out["best_loss"] < float("inf")
    assert len(out["history"]) >= 1
    # loss should drop from epoch 0 to the best epoch on correlated data
    first = out["history"][0]["val_loss_ce"]
    assert out["best_loss"] <= first + 1e-6
    # checkpoint exists and args.txt round-trips
    assert os.path.isdir(os.path.join(results_dir, "checkpoints", "model_ckpt"))
    loaded = TrainConfig.load(os.path.join(results_dir, "args.txt"))
    assert loaded.model_arch == cfg.model_arch

    # resume: a fresh trainer on the same results dir restores the checkpoint
    # AND the best-val-CE bar it was saved at (best_meta.json) — a resumed
    # run whose epochs are all worse must not overwrite the saved best
    from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib

    ckpt_dir = os.path.join(results_dir, "checkpoints")
    meta = ckpt_lib.load_best_meta(ckpt_dir)
    assert meta == pytest.approx(out["best_loss"], rel=1e-6)
    ckpt_lib.save_best_meta(ckpt_dir, 0.0)  # pretend the best is unbeatable
    trainer2 = Trainer(cfg, train_ds, val_ds, results_dir=results_dir)
    restored_from = trainer2.fit()
    assert restored_from["best_loss"] == 0.0  # never "improved"
    assert ckpt_lib.load_best_meta(ckpt_dir) == 0.0


def test_scheduler_semantics():
    s = make_scheduler("step", 1.0, 2)
    lrs = [s.step() for _ in range(5)]
    assert lrs == [1.0, 0.1, 0.1, pytest.approx(0.01), pytest.approx(0.01)]

    s = make_scheduler("plateau", 1.0)
    for _ in range(7):
        lr = s.step(1.0)
    assert lr == pytest.approx(0.1)

    s = make_scheduler("cosine", 1.0)
    first = s.step()
    assert 0.9 < first < 1.0
    for _ in range(9):
        last = s.step()
    assert last == pytest.approx(0.0, abs=1e-9)

    s = make_scheduler("cosine_warmup", 1.0)
    vals = [s.step() for _ in range(11)]
    assert vals[9] == pytest.approx(1.0)  # restart at epoch 10


def test_warmup_uses_loss_ce_only(fixture_root, tmp_path):
    cfg = small_config(fixture_root, epochs=1, warmup_epochs=1, lambda_sim_loss=1.0)
    train_ds, val_ds = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, val_ds, results_dir=str(tmp_path / "warmup_run")
    )
    out = trainer.fit()
    assert np.isfinite(out["history"][0]["val_loss_ce"])


def test_reference_flag_parity():
    """Every argparse flag of the reference driver is a TrainConfig field,
    so reference-written args.txt files hydrate losslessly
    (ref train_clip_final.py:158-218)."""
    import dataclasses
    import re

    src = open("/root/reference/train_clip_final.py").read()
    ref_flags = set(re.findall(r"add_argument\(\s*['\"]--([A-Za-z0-9_]+)", src))
    assert len(ref_flags) >= 35
    ours = {f.name for f in dataclasses.fields(TrainConfig)}
    missing = ref_flags - ours
    assert not missing, f"reference flags without a TrainConfig field: {missing}"


def test_early_stop_restores_usable_state(fixture_root, tmp_path):
    """Early stopping must restore a *live* best state: the training and
    validation steps donate the state's buffers, so the best-state snapshot
    must be a deep copy (an aliasing snapshot raises 'Array has been
    deleted' when the post-training evals touch it)."""
    cfg = small_config(
        fixture_root, epochs=10, patience=1, learning_rate=5.0
    )
    train_ds, val_ds = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, val_ds, results_dir=str(tmp_path / "earlystop")
    )
    out = trainer.fit()
    assert out["best_epoch"] < cfg.epochs - 1  # actually early-stopped
    # touching every leaf of the restored state must not raise
    for leaf in jax.tree.leaves(trainer.state.variables):
        np.asarray(leaf)


@pytest.mark.parametrize(
    "arch,eeg_enc,speech_enc",
    [
        # the fast gate keeps two rows (dispatch wiring itself + the
        # flagship head); every arch string still trains in the full
        # suite, and each head/encoder has its own fast unit/parity tests
        pytest.param("clip_sim", "vlaai", "convLSTM",
                     marks=pytest.mark.slow),
        ("clip_mp", "conformer", "smallConv"),
        pytest.param("clip_kld", "convLSTMnew", "convLSTM",
                     marks=pytest.mark.slow),
        pytest.param("clip_kld_latent_proj", "lstm", "double_lstm",
                     marks=pytest.mark.slow),
        pytest.param("no_contrastive_learning", "convLSTM", "convLSTM",
                     marks=pytest.mark.slow),
        ("clip_sim_no_latent_proj", "double_lstm", "double_lstm"),
    ],
)
def test_arch_encoder_dispatch_smoke(fixture_root, tmp_path, arch, eeg_enc,
                                     speech_enc):
    """Trainer-level wiring smoke across the arch x encoder dispatch matrix
    (ref train_clip_final.py:37-130,379-396): one epoch must train to a
    finite loss and checkpoint for every supported combination."""
    cfg = small_config(
        fixture_root, epochs=1, model_arch=arch, eeg_encoder=eeg_enc,
        speech_encoder=speech_enc,
    )
    train_ds, val_ds = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, val_ds,
        results_dir=str(tmp_path / f"{arch}_{eeg_enc}_{speech_enc}"),
    )
    out = trainer.fit()
    assert np.isfinite(out["best_loss"]), (arch, eeg_enc, speech_enc)


@pytest.mark.parametrize(
    "aug",
    [
        "GaussianNoise",
        # FT surrogate's FFT path has fast op-level tests; the trainer-level
        # wiring is identical to the GaussianNoise row kept in the gate
        pytest.param("FTSurrogate", marks=pytest.mark.slow),
    ],
)
def test_trainer_with_augmentation_and_mixup(fixture_root, tmp_path, aug):
    """On-device augmentation + cross-subject mixup wired through the full
    fit path (ref dataset_loader.py:113-165,333-356 run these on the host;
    here they are part of the jitted step).  One epoch, finite loss."""
    cfg = small_config(
        fixture_root, epochs=1, data_augmentation=aug, addEEG="yes",
        data_augmentation_percentage=0.5,
    )
    train_ds, val_ds = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, val_ds, results_dir=str(tmp_path / aug)
    )
    out = trainer.fit()
    assert np.isfinite(out["best_loss"]), aug


@pytest.mark.parametrize("feature", ["mel", "env"])
def test_stimulus_feature_paths_train(fixture_root, tmp_path, feature):
    """The reference's alternative stimulus features train end-to-end with
    their derived dims (mel → 28-dim, env → 1-dim; spatial filters 64/8 —
    ref train_clip_final.py:291-300).  The fixture writes
    ``<story>_-_mel.npy`` / ``<story>_-_env.npy`` alongside wav2vec."""
    cfg = small_config(
        fixture_root, epochs=1, stimulus_features=feature,
        speech_dim_override=None,  # use the real mel/env dims
    )
    assert cfg.speech_dimension == {"mel": 28, "env": 1}[feature]
    assert cfg.spatial_filters == {"mel": 64, "env": 8}[feature]
    train_ds, val_ds = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, val_ds, results_dir=str(tmp_path / feature)
    )
    out = trainer.fit()
    assert np.isfinite(out["best_loss"]), feature


def test_wav2vec_small_quirk_fails_like_reference(fixture_root, tmp_path):
    """``Wav2vecSmallModel.get_output_dim`` reports ``window * filters`` but
    the strided-valid conv outputs ~window/3 steps (ref clip_model.py:177-201)
    — every sizing-dependent arch crashes on it in the reference (verified:
    torch raises 'mat1 and mat2 shapes cannot be multiplied'); we must fail
    the same way, not silently re-size."""
    cfg = small_config(
        fixture_root, epochs=1, model_arch="clip_kld",
        speech_encoder="Wav2vecSmallModel",
    )
    train_ds, val_ds = make_datasets(cfg)
    with pytest.raises(TypeError, match="contracting dimensions"):
        Trainer(
            cfg, train_ds, val_ds, results_dir=str(tmp_path / "quirk")
        ).fit()


def test_fit_without_val_set_keeps_final_state(fixture_root, tmp_path):
    """With val_dataset=None there is no best-on-val tracking: fit() must
    keep (and checkpoint) the final trained state, not silently restore the
    initial copy because 'nan < inf' never updates the best."""
    cfg = small_config(fixture_root, epochs=2)
    train_ds, _ = make_datasets(cfg)
    trainer = Trainer(
        cfg, train_ds, None, results_dir=str(tmp_path / "noval")
    )
    initial = jax.tree.map(jnp.copy, trainer.state.params)
    out = trainer.fit()
    # training actually moved the weights
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), initial,
        trainer.state.params,
    )
    assert max(jax.tree.leaves(diffs)) > 1e-6
    # and a checkpoint of the final state exists
    import os
    assert os.path.exists(os.path.join(trainer.checkpoint_dir, "model_ckpt"))


def test_restore_incompatible_checkpoint_starts_fresh(fixture_root, tmp_path):
    """A checkpoint written under a different state layout (e.g. before an
    optimizer-state change) must fall back to training from scratch, not
    crash auto-resume (ref train_clip_final.py:443-449 semantics)."""
    import optax

    from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib
    from transformer_clip_eeg_tpu.train.state import TrainState

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    def mk(tx):
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, membank={},
            batch_stats={}, opt_state=tx.init(params), tx=tx,
            apply_fn=lambda *a, **k: None,
        )
    d = str(tmp_path / "ckpt")
    ckpt_lib.save_checkpoint(d, mk(optax.adam(1e-3)))
    # different optimizer → incompatible opt_state tree in the template
    restored = ckpt_lib.restore_checkpoint(d, mk(optax.sgd(1e-3)))
    assert restored is None


def test_crash_flushes_deferred_loss_lines(fixture_root, tmp_path):
    """With the default --loss_log_stream epoch, per-100-batch loss lines
    are held until the epoch drains.  A mid-epoch crash must flush the
    pending lines to loss.txt before re-raising — they are the diagnostic
    that localizes a divergence."""
    cfg = small_config(fixture_root, epochs=1)
    train_ds, val_ds = make_datasets(cfg)
    results_dir = str(tmp_path / "results_crash")
    trainer = Trainer(cfg, train_ds, val_ds, results_dir=results_dir)

    real = trainer._train_batches

    def exploding(warmup):
        it = real(warmup)
        yield next(it)  # one item → one pending loss line (next_log = 0)
        raise RuntimeError("synthetic mid-epoch crash")

    trainer._train_batches = exploding
    with pytest.raises(RuntimeError, match="synthetic mid-epoch crash"):
        trainer.fit()
    with open(os.path.join(results_dir, "loss.txt")) as f:
        content = f.read()
    assert "loss" in content, (
        "the deferred per-100-batch line was not flushed on crash:\n"
        + content
    )
