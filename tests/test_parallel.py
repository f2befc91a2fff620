"""Data-parallel sharding tests on the 8-virtual-device CPU mesh.

Verifies the InfoNCE train step keeps *global*-batch semantics when the batch
is sharded over the 'data' axis (SURVEY §5.8): the sharded step must produce
numerically matching losses/params vs the unsharded step, and the memory bank
must stay consistent (replicated) across devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.models.encoders import EEGConvLSTM, SpeechSmallConv
from transformer_clip_eeg_tpu.models.heads import CLIPSimNoLatentProj
from transformer_clip_eeg_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
)
from transformer_clip_eeg_tpu.train.state import init_train_state, make_optimizer
from transformer_clip_eeg_tpu.train.steps import make_eval_step, make_train_step


def tiny_model(bank_size=64):
    eeg = SpeechSmallConv(
        output_dim=4, kernel_size_temporal=8, dropout_rate=0.0,
        speech_dim=64, time_dimension=32,
    )
    speech = SpeechSmallConv(
        output_dim=4, kernel_size_temporal=8, dropout_rate=0.0,
        speech_dim=8, time_dimension=32,
    )
    latent = speech.get_output_dim(32)
    return CLIPSimNoLatentProj(
        eegModel=eeg, speechModel=speech, bank_size=bank_size,
        latent_dim=latent, temperature=0.075, window_length=32,
    )


def make_batch(rng, bs=16):
    return {
        "eeg": rng.standard_normal((bs, 32, 64)).astype(np.float32),
        "speech": rng.standard_normal((bs, 32, 8)).astype(np.float32),
        "ids": rng.choice(64, bs, replace=False).astype(np.int32) + 1,
    }


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh42 = make_mesh(4, 2)
    assert mesh42.shape["data"] == 4 and mesh42.shape["model"] == 2


def test_sharded_train_step_matches_single_device():
    assert len(jax.devices()) == 8
    model = tiny_model()
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    tx = make_optimizer("adamw", 1e-3)
    example = (batch["eeg"], batch["speech"], batch["ids"])

    state_single = init_train_state(model, jax.random.PRNGKey(0), example, tx)
    state_shard = init_train_state(model, jax.random.PRNGKey(0), example, tx)

    step = make_train_step("clip_sim_no_latent_proj", donate=False)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh()
    state_shard = replicate(mesh, state_shard)

    for i in range(3):
        b = make_batch(rng)
        state_single, losses_single = step(state_single, b, key, warmup=False)
        state_shard, losses_shard = step(
            state_shard, shard_batch(mesh, b), key, warmup=False
        )
        np.testing.assert_allclose(
            float(losses_single["loss_ce"]),
            float(losses_shard["loss_ce"]),
            rtol=2e-5,
        )

    # params identical after 3 steps → global-batch gradient semantics held
    flat_single = jax.tree_util.tree_leaves(state_single.params)
    flat_shard = jax.tree_util.tree_leaves(jax.device_get(state_shard.params))
    for a, b_ in zip(flat_single, flat_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    # memory bank consistent too (scatter applied identically on all shards)
    np.testing.assert_allclose(
        np.asarray(state_single.membank["eegMemoryBank"]["memory"]),
        np.asarray(jax.device_get(state_shard.membank["eegMemoryBank"]["memory"])),
        atol=2e-5,
    )


def test_sharded_eval_step_runs():
    model = tiny_model()
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    tx = make_optimizer("adam", 1e-3)
    state = init_train_state(
        model, jax.random.PRNGKey(0),
        (batch["eeg"], batch["speech"], batch["ids"]), tx,
    )
    mesh = make_mesh()
    state = replicate(mesh, state)
    eval_step = make_eval_step("clip_sim_no_latent_proj")
    state, losses = eval_step(state, shard_batch(mesh, batch))
    assert np.isfinite(float(losses["loss_ce"]))


@pytest.mark.xfail(
    strict=False,
    reason="upstream XLA SPMD partitioner bug: a vmapped conv (batched "
    "kernel -> grouped conv) computes wrong values when the vmap axis is "
    "GSPMD-sharded (jax 0.9, CPU). fold_parallel works around it with "
    "shard_map. If this XPASSes after a jax upgrade, the bug is fixed and "
    "the workaround can be revisited.",
)
def test_gspmd_grouped_conv_partitioning_canary():
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    r = np.random.default_rng(0)
    F, bs, T, C = 2, 4, 192, 64
    x = r.standard_normal((F, bs, T, C)).astype(np.float32)
    w = r.standard_normal((F, 1, C, C)).astype(np.float32)

    def conv(xf, wf):
        return lax.conv_general_dilated(
            xf, wf, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC")
        )

    f = jax.jit(lambda x, w: jax.vmap(conv)(x, w))
    plain = f(x, w)
    mesh = make_mesh(2)
    sh = NamedSharding(mesh, P("data"))
    sharded = f(jax.device_put(x, sh), jax.device_put(w, sh))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), atol=1e-5)
