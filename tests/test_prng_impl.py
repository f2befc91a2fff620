"""The rbg PRNG training default (``TrainConfig.prng_impl``).

The flagship step spends a measurable slice of its time generating dropout
masks with jax's default threefry2x32 (10 conv-block masks of
[128, 192, 64] per step); switching bit generation to XLA's
``RngBitGenerator`` (impl 'rbg' — key derivation stays threefry) measured
+16-20% step throughput on the real chip (PERF.md).  These tests pin the
semantics that switch relies on: config plumbing, stream independence under
the transforms the train steps use, and that the step still trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.train.config import TrainConfig
from transformer_clip_eeg_tpu.utils.platform import (
    DEFAULT_PRNG_IMPL,
    PRNG_IMPLS,
    configure_prng_impl,
)


def test_default_prng_impl_is_shared():
    """The bench/profile entry points configure DEFAULT_PRNG_IMPL so they
    measure what training runs; this pins it to TrainConfig's default."""
    assert TrainConfig().prng_impl == DEFAULT_PRNG_IMPL


def test_explicit_impl_losing_to_env_warns(monkeypatch, capsys):
    """JAX_DEFAULT_PRNG_IMPL wins over configure_prng_impl (standard jax
    behavior), but an explicit NON-default request that loses to it must
    say so — `--prng_impl threefry2x32` is the documented
    bit-reproducibility escape hatch and may not fail silently."""
    monkeypatch.setenv("JAX_DEFAULT_PRNG_IMPL", "rbg")
    before = jax.config.jax_default_prng_impl
    configure_prng_impl("threefry2x32")
    assert jax.config.jax_default_prng_impl == before  # env won
    assert "overrides requested" in capsys.readouterr().out
    # the default request losing to the env is routine — no warning
    configure_prng_impl(DEFAULT_PRNG_IMPL)
    assert "overrides requested" not in capsys.readouterr().out


def test_config_field_default_and_roundtrip(tmp_path):
    cfg = TrainConfig()
    assert cfg.prng_impl == "rbg"
    path = tmp_path / "args.txt"
    cfg.save(str(path))
    assert TrainConfig.load(str(path)).prng_impl == "rbg"
    # reference-written args.txt (no such key) loads with the default
    assert TrainConfig.from_dict({"run": 1}).prng_impl == "rbg"


def test_configure_rejects_unknown_impl():
    with pytest.raises(ValueError):
        configure_prng_impl("philox")


@pytest.mark.parametrize("impl", PRNG_IMPLS)
def test_configure_switches_default(impl):
    configure_prng_impl(impl)
    assert jax.config.jax_default_prng_impl == impl
    key = jax.random.PRNGKey(0)
    bits = jax.random.bernoulli(key, 0.5, (64,))
    assert 0 < int(bits.sum()) < 64  # non-degenerate stream


def test_rbg_streams_independent_under_vmap_and_scan():
    """The fold-parallel step vmaps dropout over folds and scans over
    batches; masks must differ across both axes under rbg."""
    configure_prng_impl("rbg")
    key = jax.random.PRNGKey(0)

    rows = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (128,)))(
        jax.random.split(key, 4)
    )
    assert len({tuple(np.asarray(r)) for r in rows}) == 4

    def body(c, i):
        kk = jax.random.fold_in(key, i)
        return c, jax.random.bernoulli(kk, 0.5, (128,))

    _, masks = jax.lax.scan(body, 0, jnp.arange(4))
    assert len({tuple(np.asarray(m)) for m in masks}) == 4


def test_rbg_bits_under_vmap_are_position_dependent():
    """The hazard that keeps fold-parallel on threefry streams: under rbg,
    a vmapped draw differs from the same key's unbatched draw for rows ≥ 1
    (XLA's RngBitGenerator block-generates across the batch), so per-row
    streams depend on the row's position in the stack.  threefry's batching
    rule is exact.  If a jax upgrade ever makes rbg exact under vmap, this
    test fails and ``fold_scan_rng`` can be retired."""
    configure_prng_impl("rbg")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    batched = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (64,)))(ks)
    solo = jnp.stack(
        [jax.random.bernoulli(ks[i], 0.5, (64,)) for i in range(3)]
    )
    # the load-bearing hazard: SOME row's batched bits differ from its
    # unbatched draw (today rows >= 1; which rows is an XLA detail this
    # test deliberately does not pin)
    assert not bool(jnp.all(batched == solo))

    # threefry: exact under vmap — what fold isolation relies on
    configure_prng_impl("threefry2x32")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    batched = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (64,)))(ks)
    solo = jnp.stack(
        [jax.random.bernoulli(ks[i], 0.5, (64,)) for i in range(3)]
    )
    assert bool(jnp.all(batched == solo))


def test_fold_scan_rng_is_threefry_even_under_rbg_default():
    """FoldParallelTrainer's scan rng must stay threefry-typed (exact under
    the fold vmap) even when the trainer configures the rbg default."""
    from transformer_clip_eeg_tpu.train.fold_parallel import fold_scan_rng

    configure_prng_impl("rbg")
    k = fold_scan_rng(7)
    assert "threefry" in str(jax.random.key_impl(k))
    # derived keys keep the impl: bits generated inside a fold vmap with
    # per-fold fold_in'd steps are position-invariant
    def draw(step):
        kk = jax.random.fold_in(k, step)
        return jax.random.bernoulli(kk, 0.5, (32,))

    batched = jax.vmap(draw)(jnp.arange(3))
    solo = jnp.stack([draw(i) for i in range(3)])
    assert bool(jnp.all(batched == solo))


@pytest.mark.slow
def test_train_step_runs_under_rbg():
    """A real (tiny) flagship train step under rbg: finite losses, params
    move, and two steps draw different dropout masks (loss differs on
    identical inputs)."""
    configure_prng_impl("rbg")
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_train_step

    model = _flagship(window_length=32, speech_dim=8, depth=2, bank_size=32)
    rng = np.random.default_rng(0)
    batch = {
        "eeg": rng.standard_normal((4, 32, 64)).astype(np.float32),
        "speech": rng.standard_normal((4, 32, 8)).astype(np.float32),
        "ids": np.arange(1, 5, dtype=np.int32),
    }
    state = init_train_state(
        model, jax.random.PRNGKey(0),
        (batch["eeg"], batch["speech"], batch["ids"]),
        make_optimizer("adamw", 1e-3),
    )
    step = make_train_step("clip_sim_no_latent_proj", donate=False)
    key = jax.random.PRNGKey(1)
    state1, l1 = step(state, batch, key, warmup=False)
    state2, l2 = step(state1, batch, key, warmup=False)
    assert np.isfinite(float(l1["loss_ce"]))
    assert np.isfinite(float(l2["loss_ce"]))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # per-step mask divergence, isolated from the param update: identical
    # params and inputs, only the folded-in step counter differs (the step
    # does fold_in(rng, state.step) — train/steps.py) → different dropout
    # masks → different loss
    state_b = state.replace(step=state.step + 1)
    _, la = step(state, batch, key, warmup=False)
    _, lb = step(state_b, batch, key, warmup=False)
    assert float(la["loss_ce"]) != float(lb["loss_ce"])


def test_trainer_configures_impl_from_config(tmp_path):
    """Constructing a Trainer applies cfg.prng_impl to the global default
    (the conftest fixture restores it after the test)."""
    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.data.fixtures import make_fixture
    from transformer_clip_eeg_tpu.train import Trainer

    root = str(tmp_path / "spk")
    make_fixture(root, n_stories=3, n_subjects=2, story_seconds=60,
                 speech_dim=16)
    cfg = TrainConfig(
        data_dir=root, run=0, batch_size=8, epochs=1, attention_depth=1,
        latent_dim=4, lstm_units=8, number_of_training_subjects=2,
        speech_dim_override=16,
    )
    (train_f, _v, _t, _h, train_a, _va, _ta, _ha) = (
        get_train_val_test_files_final(
            cfg.data_dir, cfg.run, cfg.stimulus_features,
            cfg.fold_split_path, cfg.number_of_training_subjects,
        )
    )
    train_ds = EEGWindowDataset(
        train_f, train_a, cfg.window_length, cfg.hop_length,
        batch_size=cfg.batch_size, seed=0,
    )

    configure_prng_impl("threefry2x32")
    Trainer(cfg, train_ds, results_dir=str(tmp_path / "run"))
    assert jax.config.jax_default_prng_impl == "rbg"
