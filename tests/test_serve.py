"""Serving path: session load from a results dir, retrieval index, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from transformer_clip_eeg_tpu.serve import (
    InferenceSession,
    RetrievalIndex,
    match_mismatch_decide,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T, EEG_C, SP_D = 32, 64, 8


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A minimal trained-run directory: args.txt + orbax checkpoint."""
    import jax

    from transformer_clip_eeg_tpu.serve import build_model_from_config
    from transformer_clip_eeg_tpu.train.checkpoint import save_checkpoint
    from transformer_clip_eeg_tpu.train.config import TrainConfig
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )

    root = tmp_path_factory.mktemp("run")
    cfg = TrainConfig(
        window_length_s=1,
        fs=T,
        attention_depth=1,
        latent_dim=4,
        lstm_units=8,
        speech_dim_override=SP_D,
        batch_size=4,
    )
    cfg.save(os.path.join(root, "args.txt"))

    model = build_model_from_config(cfg, bank_size=16)
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((2, T, EEG_C)).astype(np.float32)
    speech = rng.standard_normal((2, T, SP_D)).astype(np.float32)
    ids = np.arange(1, 3, dtype=np.int32)
    tx = make_optimizer("adamw", 1e-3)
    state = init_train_state(
        model, jax.random.PRNGKey(0), (eeg, speech, ids), tx
    )
    ckpt_dir = os.path.join(root, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state)
    return str(root), model, state


def test_session_from_results_dir_matches_direct(run_dir):
    root, model, state = run_dir
    sess = InferenceSession.from_results_dir(root, chunk=4)
    rng = np.random.default_rng(1)
    eeg = rng.standard_normal((6, T, EEG_C)).astype(np.float32)

    got = sess.embed_eeg(eeg)
    assert got.shape[0] == 6
    # unit-norm embeddings
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), 1.0, atol=1e-5
    )

    # identical to embedding with the original (pre-checkpoint) variables
    from transformer_clip_eeg_tpu.train.steps import make_embed_fns

    embed_eeg, _ = make_embed_fns(model)
    want = np.asarray(
        embed_eeg({"params": state.params, "membank": state.membank}, eeg)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_session_speech_and_mvn(run_dir):
    root, _, _ = run_dir
    sess = InferenceSession.from_results_dir(root, chunk=4)
    rng = np.random.default_rng(2)
    sp = rng.standard_normal((3, T, SP_D)).astype(np.float32)
    emb = sess.embed_speech(sp)
    assert emb.shape[0] == 3

    eeg = rng.standard_normal((5, T, EEG_C)).astype(np.float32) * 3 + 1
    raw = sess.embed_eeg(eeg, normalize=False)
    mvn = sess.embed_eeg(eeg, normalize=True)
    # MVN must match embedding the explicitly-normalized input
    norm = (eeg - eeg.mean(axis=(0, 1), keepdims=True)) / eeg.std(
        axis=(0, 1), keepdims=True
    )
    np.testing.assert_allclose(
        mvn, sess.embed_eeg(norm, normalize=False), atol=1e-5, rtol=1e-5
    )
    assert not np.allclose(raw, mvn)


def test_retrieval_index_topk_exact():
    rng = np.random.default_rng(3)
    bank = rng.standard_normal((20, 6)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    q = rng.standard_normal((4, 6)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    idx = RetrievalIndex.from_embeddings(bank, capacity=32)
    scores, ids = idx.topk(q, k=5)

    sims = q @ bank.T
    want_ids = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(
        scores, np.take_along_axis(sims, want_ids, 1), atol=1e-5
    )

    # growing the bank after construction keeps shapes static but extends
    # the candidate set
    extra = rng.standard_normal((4, 6)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    new_ids = idx.add(extra)
    assert list(new_ids) == [20, 21, 22, 23]
    _, ids2 = idx.topk(q, k=24)
    assert ids2.shape == (4, 24)

    with pytest.raises(ValueError):
        idx.add(np.zeros((100, 6), np.float32))


def test_sharded_session_matches_single_device(run_dir):
    """Batch-sharded embedding over the 8-device CPU mesh is numerically
    identical to single-device serving."""
    from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

    root, _, _ = run_dir
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    plain = InferenceSession.from_results_dir(root, chunk=8)
    sharded = InferenceSession.from_results_dir(root, chunk=8, mesh=mesh)

    rng = np.random.default_rng(7)
    eeg = rng.standard_normal((11, T, EEG_C)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.embed_eeg(eeg), plain.embed_eeg(eeg), atol=1e-6, rtol=1e-6
    )
    speech = rng.standard_normal((11, T, SP_D)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.embed_speech(speech), plain.embed_speech(speech),
        atol=1e-6, rtol=1e-6,
    )

    with pytest.raises(ValueError):
        InferenceSession.from_results_dir(root, chunk=6, mesh=mesh)


def test_sharded_index_matches_single_device():
    from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(8)
    bank = rng.standard_normal((21, 6)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    q = rng.standard_normal((3, 6)).astype(np.float32)

    plain = RetrievalIndex.from_embeddings(bank, capacity=24)
    sharded = RetrievalIndex.from_embeddings(bank, capacity=21, mesh=mesh)
    assert sharded.capacity == 24  # rounded up to a multiple of 8

    s0, i0 = plain.topk(q, k=4)
    s1, i1 = sharded.topk(q, k=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)

    extra = rng.standard_normal((2, 6)).astype(np.float32)
    plain.add(extra)
    sharded.add(extra)
    s0, i0 = plain.topk(q, k=23)
    s1, i1 = sharded.topk(q, k=23)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)


def test_match_mismatch_decide():
    e = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    a = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
    b = np.array([[0.0, 1.0], [0.0, 1.0]], np.float32)
    np.testing.assert_array_equal(match_mismatch_decide(e, a, b), [0, 1])


@pytest.mark.parametrize(
    "arch",
    [
        # the registry's dispatchable archs (ref train_clip_final.py:379-396;
        # the plain CLIP class exists but is not CLI-dispatchable there either)
        "clip_sim",
        "clip_sim_no_latent_proj",
        "clip_mp",
        "clip_kld",
        "no_contrastive_learning",
    ],
)
def test_session_embeds_for_every_arch(arch):
    """Every head the registry dispatches exposes working embedders."""
    import jax

    from transformer_clip_eeg_tpu.serve import build_model_from_config
    from transformer_clip_eeg_tpu.train.config import TrainConfig

    cfg = TrainConfig(
        model_arch=arch,
        window_length_s=1,
        fs=T,
        attention_depth=1,
        latent_dim=4,
        lstm_units=8,
        speech_dim_override=SP_D,
        batch_size=4,
    )
    model = build_model_from_config(cfg, bank_size=8)
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((2, T, EEG_C)).astype(np.float32)
    speech = rng.standard_normal((2, T, SP_D)).astype(np.float32)
    ids = np.arange(1, 3, dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), eeg, speech, ids)

    sess = InferenceSession(model, variables, chunk=2)
    e = sess.embed_eeg(eeg)
    s = sess.embed_speech(speech)
    assert e.shape[0] == 2 and s.shape[0] == 2
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(s))
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_cli_embed_and_retrieve(run_dir, tmp_path):
    root, _, _ = run_dir
    rng = np.random.default_rng(4)
    eeg_path = os.path.join(tmp_path, "eeg.npy")
    cand_path = os.path.join(tmp_path, "cand.npy")
    np.save(eeg_path, rng.standard_normal((3, T, EEG_C)).astype(np.float32))
    np.save(cand_path, rng.standard_normal((7, T, SP_D)).astype(np.float32))

    def run_cli(*cli_args):
        # env JAX_PLATFORMS=cpu alone is NOT enough on hosts whose
        # sitecustomize prepends an accelerator platform (config becomes
        # "axon,cpu" and the accelerator wins) — force the config like the
        # other subprocess e2e tests do
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from transformer_clip_eeg_tpu.serve import main; "
            f"sys.exit(main({list(cli_args)!r}))"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        return subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, env=env, cwd=REPO,
        )

    out_emb = os.path.join(tmp_path, "emb.npy")
    r = run_cli("--results_folder", root, "--eeg", eeg_path, "--out", out_emb)
    assert r.returncode == 0, r.stderr[-2000:]
    assert np.load(out_emb).shape[0] == 3

    out_json = os.path.join(tmp_path, "ret.json")
    r = run_cli("--results_folder", root, "--eeg", eeg_path,
                "--candidates", cand_path, "--topk", "3", "--out", out_json)
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.load(open(out_json))
    assert len(got["indices"]) == 3
    assert len(got["indices"][0]) == 3

    # partial retrieval flags must error, not silently embed
    r = run_cli("--results_folder", root, "--eeg", eeg_path,
                "--topk", "3", "--out", out_json)
    assert r.returncode != 0
    assert "retrieval requires" in r.stderr

    # --shard: same retrieval over the virtual 8-device CPU mesh
    out_shard = os.path.join(tmp_path, "ret_shard.json")
    r = run_cli("--results_folder", root, "--eeg", eeg_path,
                "--candidates", cand_path, "--topk", "3", "--chunk", "8",
                "--shard", "8", "--out", out_shard)
    assert r.returncode == 0, r.stderr[-2000:]
    got_shard = json.load(open(out_shard))
    assert got_shard["indices"] == got["indices"]


def _membank_free_run_dir(tmp_path, bank_size):
    """Run dir for a membank-free arch (clip_kld); bank_size persisted or
    stripped to simulate a pre-r2 args.txt."""
    import jax

    from transformer_clip_eeg_tpu.serve import build_model_from_config
    from transformer_clip_eeg_tpu.train.checkpoint import save_checkpoint
    from transformer_clip_eeg_tpu.train.config import TrainConfig
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )

    root = str(tmp_path)
    cfg = TrainConfig(
        model_arch="clip_kld", window_length_s=1, fs=T, attention_depth=1,
        latent_dim=4, lstm_units=8, speech_dim_override=SP_D, batch_size=4,
        bank_size=bank_size,
    )
    cfg.save(os.path.join(root, "args.txt"))
    model = build_model_from_config(cfg, bank_size=13)
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((2, T, EEG_C)).astype(np.float32)
    speech = rng.standard_normal((2, T, SP_D)).astype(np.float32)
    ids = np.arange(1, 3, dtype=np.int32)
    state = init_train_state(
        model, jax.random.PRNGKey(0), (eeg, speech, ids),
        make_optimizer("adamw", 1e-3),
    )
    ckpt_dir = os.path.join(root, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state)
    return root, state


def test_membank_free_arch_uses_persisted_bank_size(tmp_path):
    """clip_kld leaves no memory bank in the checkpoint; the session must
    size the head from the persisted args.txt bank_size, making the rebuilt
    model faithful (params load without structural mismatch)."""
    root, state = _membank_free_run_dir(tmp_path, bank_size=13)
    sess = InferenceSession.from_results_dir(root, chunk=2)
    # the KLD class-prior table must have bank_size+1 rows, as trained
    assert (
        sess.variables["params"]["mu_eeg_lookup"].shape
        == state.params["mu_eeg_lookup"].shape
    )
    eeg = np.random.default_rng(1).standard_normal((2, T, EEG_C)).astype(np.float32)
    e = sess.embed_eeg(eeg)
    assert np.all(np.isfinite(e))


def test_membank_free_arch_without_bank_size_raises(tmp_path):
    """Without a persisted bank_size there is nothing to size the head from
    — a clear error beats silently rebuilding with bank_size=1."""
    root, _ = _membank_free_run_dir(tmp_path, bank_size=0)
    with pytest.raises(ValueError, match="bank_size"):
        InferenceSession.from_results_dir(root, chunk=2)


def test_cli_embed_rejects_both_inputs(run_dir, tmp_path):
    """--eeg plus --speech in embed-only mode must error, not silently drop
    the speech input."""
    root, _, _ = run_dir
    rng = np.random.default_rng(5)
    eeg_path = os.path.join(tmp_path, "e.npy")
    sp_path = os.path.join(tmp_path, "s.npy")
    np.save(eeg_path, rng.standard_normal((2, T, EEG_C)).astype(np.float32))
    np.save(sp_path, rng.standard_normal((2, T, SP_D)).astype(np.float32))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; from transformer_clip_eeg_tpu.serve import main; "
        f"sys.exit(main(['--results_folder', {root!r}, '--eeg', {eeg_path!r},"
        f" '--speech', {sp_path!r}, '--out', {os.path.join(tmp_path, 'o.npy')!r}]))"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=REPO,
    )
    assert r.returncode != 0
    assert "mutually exclusive" in r.stderr
