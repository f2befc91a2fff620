"""Fold-parallel CV training: vmap correctness + fold isolation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.data.discovery import get_train_val_test_files_final
from transformer_clip_eeg_tpu.data.fixtures import make_fixture
from transformer_clip_eeg_tpu.train import TrainConfig
from transformer_clip_eeg_tpu.train.fold_parallel import (
    FoldParallelTrainer,
    make_fold_scan_step,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparrkulee_folds"))
    # 4 stories → folds 0/1/2 hold one story each + one 2023 test story
    make_fixture(root, n_stories=4, n_subjects=3, story_seconds=60,
                 speech_dim=16)
    return root


def _cfg(root, **overrides):
    defaults = dict(
        data_dir=root, batch_size=8, epochs=2, patience=5,
        attention_depth=1, latent_dim=4, lstm_units=8,
        number_of_training_subjects=3, speech_dim_override=16,
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def _union(root, cfg):
    files = get_train_val_test_files_final(
        root, 0, cfg.stimulus_features, cfg.fold_split_path,
        cfg.number_of_training_subjects,
    )
    return files[0] + files[1], files[4] + files[5]


def test_fold_scan_step_matches_unvmapped_base(fixture_root):
    """One fold-stacked scan step (F=2, identical folds) must reproduce the
    proven single-fold chunk-scan step exactly."""
    from transformer_clip_eeg_tpu.train.device_data import DeviceChunkStore
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state, make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_chunk_scan_step

    cfg = _cfg(fixture_root)
    union_f, union_a = _union(fixture_root, cfg)
    ds = EEGWindowDataset(union_f, union_a, 192, 192, batch_size=8, seed=0)
    store = DeviceChunkStore(ds)
    key = ds.batches_keys[0]
    eeg_d, sp_d, ids_d, n_subs, _ = store.get(key)
    idx_m, subs_m = ds.create_eeg_indices(ds.chunks[key]["eeg"])
    idx_m = idx_m.astype(np.int32)
    subs_m = subs_m.astype(np.int32)
    n = idx_m.shape[0]

    from transformer_clip_eeg_tpu.models.registry import (
        build_model, load_eeg_encoder, load_speech_encoder,
    )

    model = build_model(
        cfg.model_arch,
        load_eeg_encoder(cfg.eeg_encoder, cfg.lstm_units,
                         cfg.spatial_filters, cfg.number_conv_layers,
                         cfg.window_length, cfg.latent_dim,
                         cfg.attention_depth),
        load_speech_encoder(cfg.speech_encoder, cfg.lstm_units,
                            cfg.spatial_filters, cfg.number_conv_layers,
                            cfg.window_length, cfg.stride_temporal,
                            cfg.speech_dimension, cfg.latent_dim),
        window_length=cfg.window_length, temperature=cfg.temperature,
        latent_dim=cfg.latent_dim,
        bank_size=ds.get_number_of_stimuli_segments(),
        lambda_clip_loss=1.0, lambda_sim_loss=0.0, momentum_membank=0.9,
    )
    feature = ds.features_to_load[0]
    chunk = ds.chunks[key]
    example = (
        chunk["eeg"][0, :8].astype(np.float32),
        chunk[feature][:8].astype(np.float32),
        np.asarray(chunk["identifiers"][:8], np.int32),
    )
    tx = make_optimizer("adamw", 1e-3)
    state0 = init_train_state(model, jax.random.PRNGKey(0), example, tx)
    rng = jax.random.PRNGKey(7)

    base_scan = make_chunk_scan_step(cfg.model_arch, donate=False)
    base_state, base_losses = base_scan(
        state0, eeg_d, sp_d, ids_d, idx_m, subs_m, subs_m,
        np.ones(n, bool), rng, warmup=False,
    )

    F = 2
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (F,) + x.shape).copy(), state0
    )
    tile = lambda m: np.broadcast_to(m[:, None], (n, F) + m.shape[1:]).copy()
    fold_scan = make_fold_scan_step(cfg.model_arch, donate=False)
    fold_states, fold_losses = fold_scan(
        stacked, eeg_d, sp_d, ids_d, tile(idx_m), tile(subs_m),
        tile(subs_m), np.ones((n, F), bool), rng, warmup=False,
    )

    np.testing.assert_allclose(
        np.asarray(fold_losses["loss_ce"])[:, 0],
        np.asarray(base_losses["loss_ce"]), rtol=2e-5, atol=2e-5,
    )
    for j in range(F):
        jax.tree.map(
            lambda a, b, _j=j: np.testing.assert_allclose(
                np.asarray(a)[_j], np.asarray(b), rtol=3e-4, atol=3e-4
            ),
            fold_states.params, base_state.params,
        )


@pytest.mark.slow
def test_fold_parallel_isolates_folds(fixture_root, tmp_path):
    """Per-fold numerics in a concurrent 2-fold run must equal each fold
    trained alone under the same schedule (folds must not interfere through
    the stacked state, the shared chunk order, or the masking)."""
    cfg = _cfg(fixture_root, epochs=2)
    union_f, union_a = _union(fixture_root, cfg)

    both = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "both")
    )
    out_both = both.fit()

    for j, fold in enumerate([0, 1]):
        solo = FoldParallelTrainer(
            cfg, [fold], union_f, union_a, str(tmp_path / f"solo{fold}")
        )
        out_solo = solo.fit()
        for e_both, e_solo in zip(out_both["history"], out_solo["history"]):
            np.testing.assert_allclose(
                e_both["val_loss_ce"][j], e_solo["val_loss_ce"][0],
                rtol=2e-5, atol=2e-5,
            )
            np.testing.assert_allclose(
                e_both["train_loss_ce"][j], e_solo["train_loss_ce"][0],
                rtol=2e-5, atol=2e-5,
            )
        jax.tree.map(
            lambda a, b, _j=j: np.testing.assert_allclose(
                np.asarray(a)[_j], np.asarray(b)[0], rtol=5e-4, atol=5e-4
            ),
            both.best_states.params, solo.best_states.params,
        )

    # per-fold run dirs carry args.txt (with the fold's run id) + checkpoint
    for fold, d in zip([0, 1], out_both["fold_dirs"]):
        loaded = TrainConfig.load(os.path.join(d, "args.txt"))
        assert loaded.run == fold
        assert os.path.isdir(os.path.join(d, "checkpoints", "model_ckpt"))


@pytest.mark.slow
def test_fold_group_chunking_matches_ungrouped(fixture_root, tmp_path):
    """Fold-group chunking (G < F, the HBM-pressure fallback) must be
    bit-identical to the all-folds-in-one-dispatch walk: the group loop is
    contiguous and in fold order, so every rng (per-fold sampling, shared
    chunk order, mixup partners) draws in exactly the ungrouped order."""
    cfg = _cfg(fixture_root, epochs=2)
    union_f, union_a = _union(fixture_root, cfg)

    whole = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "whole")
    )
    out_whole = whole.fit()
    grouped = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "grouped"),
        fold_group_size=1,
    )
    assert grouped.fold_group_size == 1
    out_grouped = grouped.fit()

    assert out_grouped["best_loss"] == pytest.approx(
        out_whole["best_loss"], rel=2e-5
    )
    for e_w, e_g in zip(out_whole["history"], out_grouped["history"]):
        np.testing.assert_allclose(
            e_g["val_loss_ce"], e_w["val_loss_ce"], rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            e_g["train_loss_ce"], e_w["train_loss_ce"], rtol=2e-5, atol=2e-5
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        grouped.best_states.params, whole.best_states.params,
    )


def test_fold_group_size_validation(fixture_root, tmp_path):
    cfg = _cfg(fixture_root, epochs=1)
    union_f, union_a = _union(fixture_root, cfg)
    with pytest.raises(ValueError, match="divisor"):
        FoldParallelTrainer(
            cfg, [0, 1, 2], union_f, union_a, str(tmp_path / "bad"),
            fold_group_size=2,
        )
    from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="mesh"):
        FoldParallelTrainer(
            cfg, [0, 1], union_f, union_a, str(tmp_path / "bad2"),
            mesh=make_mesh(2), fold_group_size=1,
        )
    # 'auto' resolves to a valid divisor wherever memory stats exist, and
    # to F (no grouping) on backends without them — never an error
    t = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "auto"),
        fold_group_size="auto",
    )
    assert t.fold_group_size in (1, 2)


@pytest.mark.slow
def test_fold_parallel_auto_resume(fixture_root, tmp_path):
    """A new trainer pointed at a previous sweep's results root must restore
    each fold's best checkpoint into its stacked row (ref
    train_clip_final.py:443-449, per run dir)."""
    cfg = _cfg(fixture_root, epochs=1)
    union_f, union_a = _union(fixture_root, cfg)
    root = str(tmp_path / "resume")

    first = FoldParallelTrainer(cfg, [0], union_f, union_a, root)
    first_result = first.fit()

    again = FoldParallelTrainer(cfg, [0], union_f, union_a, root)
    assert again.resumed.all()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        again.states.params, first.best_states.params,
    )

    fresh = FoldParallelTrainer(
        cfg, [0], union_f, union_a, str(tmp_path / "fresh")
    )
    assert not fresh.resumed.any()

    # the resumed trainer must also know the val CE bar the checkpoint was
    # saved at, so a worse first post-resume epoch cannot overwrite it
    assert np.isfinite(again.resume_best_loss).all()
    np.testing.assert_allclose(
        again.resume_best_loss, first_result["best_loss"], rtol=1e-6
    )


@pytest.mark.slow
def test_fold_parallel_mesh_shards_folds(fixture_root, tmp_path):
    """Fold axis sharded over a 2-device 'data' mesh: per-fold numerics
    must match the unsharded fold-parallel trainer (folds are independent,
    so fold-sharding needs zero collectives)."""
    from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

    cfg = _cfg(fixture_root, epochs=2)
    union_f, union_a = _union(fixture_root, cfg)

    mesh = make_mesh(2)
    sharded = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "sharded"), mesh=mesh
    )
    res_s = sharded.fit()
    plain = FoldParallelTrainer(
        cfg, [0, 1], union_f, union_a, str(tmp_path / "plain")
    )
    res_p = plain.fit()

    np.testing.assert_allclose(
        res_s["best_loss"], res_p["best_loss"], rtol=1e-5
    )
    for hs, hp in zip(res_s["history"], res_p["history"]):
        np.testing.assert_allclose(
            hs["val_loss_ce"], hp["val_loss_ce"], rtol=1e-5
        )
        np.testing.assert_allclose(
            hs["train_loss_ce"], hp["train_loss_ce"], rtol=1e-5
        )
    # two epochs of Adam updates amplify per-step f32 reassociation noise
    # (the shard_map'd per-fold program is the plain program, but XLA may
    # fuse differently); measured max drift ~2.3e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        jax.device_get(sharded.best_states.params),
        jax.device_get(plain.best_states.params),
    )


def test_fold_parallel_mesh_rejects_uneven_folds(fixture_root, tmp_path):
    from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

    cfg = _cfg(fixture_root)
    union_f, union_a = _union(fixture_root, cfg)
    with pytest.raises(ValueError, match="shard evenly"):
        FoldParallelTrainer(
            cfg, [0, 1, 2], union_f, union_a, str(tmp_path / "uneven"),
            mesh=make_mesh(2),
        )


@pytest.mark.slow
def test_fold_run_dir_serves(fixture_root, tmp_path):
    """A fold-parallel per-fold results dir (args.txt with persisted
    bank_size + checkpoints/) must load straight into the serving layer."""
    from transformer_clip_eeg_tpu.serve import InferenceSession

    cfg = _cfg(fixture_root, epochs=1)
    union_f, union_a = _union(fixture_root, cfg)
    root = str(tmp_path / "servable")
    trainer = FoldParallelTrainer(cfg, [0], union_f, union_a, root)
    res = trainer.fit()

    session = InferenceSession.from_results_dir(res["fold_dirs"][0], chunk=4)
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((2, cfg.window_length, 64)).astype(np.float32)
    emb = np.asarray(session.embed_eeg(eeg))
    assert emb.shape[0] == 2 and np.isfinite(emb).all()
    # serving contract: L2-normalized rows
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # the served weights are the fold's best checkpoint, not a fresh init:
    # the session's params must equal the trainer's best fold state
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(session.variables["params"]),
        jax.device_get(trainer.fold_state(0).params),
    )


@pytest.mark.slow
def test_fold_parallel_resume_keeps_best_checkpoint(fixture_root, tmp_path):
    """A resumed sweep whose epochs are all worse than the recorded best
    must leave the saved best checkpoint untouched."""
    from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib

    cfg = _cfg(fixture_root, epochs=2)
    union_f, union_a = _union(fixture_root, cfg)
    root = str(tmp_path / "keepbest")

    first = FoldParallelTrainer(cfg, [0], union_f, union_a, root)
    res1 = first.fit()
    ckpt_dir = os.path.join(res1["fold_dirs"][0], "checkpoints")
    saved_best = ckpt_lib.load_best_meta(ckpt_dir)
    assert saved_best is not None
    np.testing.assert_allclose(saved_best, res1["best_loss"][0], rtol=1e-6)
    params_before = jax.device_get(first.fold_state(0).params)

    # pretend the recorded best is unbeatable: the resumed run's epochs
    # cannot improve on it, so neither checkpoint nor meta may change
    ckpt_lib.save_best_meta(ckpt_dir, 0.0)
    again = FoldParallelTrainer(cfg, [0], union_f, union_a, root)
    np.testing.assert_allclose(again.resume_best_loss, [0.0])
    res2 = again.fit()
    assert res2["best_loss"][0] == 0.0  # never "improved"
    assert ckpt_lib.load_best_meta(ckpt_dir) == 0.0
    restored = ckpt_lib.restore_checkpoint(
        ckpt_dir, jax.tree.map(lambda x: x[0], again.states)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        restored.params, params_before,
    )
