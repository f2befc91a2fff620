"""Fused BasicBlock kernel: parity with the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.models.encoders import BasicBlock
from transformer_clip_eeg_tpu.ops.pallas_conv import fused_basic_block

B, T, C = 4, 32, 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)


@pytest.mark.parametrize("k", [12, 7])  # even (asymmetric pad) + odd kernels
def test_forward_and_grad_parity(data, k):
    xla = BasicBlock(out_channels=C, kernel_size=k, dropout_rate=0.0,
                     time_dimension=T, use_pallas=False)
    pls = BasicBlock(out_channels=C, kernel_size=k, dropout_rate=0.0,
                     time_dimension=T, use_pallas=True)
    variables = xla.init(jax.random.PRNGKey(0), data)
    out_xla = xla.apply(variables, data, True)
    out_pls = pls.apply(variables, data, True)
    np.testing.assert_allclose(
        np.asarray(out_pls), np.asarray(out_xla), atol=5e-5
    )

    def loss(mod):
        return lambda v, x: (mod.apply(v, x, True) ** 2).sum()

    gv_x, gx_x = jax.grad(loss(xla), argnums=(0, 1))(variables, data)
    gv_p, gx_p = jax.grad(loss(pls), argnums=(0, 1))(variables, data)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=5e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(gv_p), jax.tree_util.tree_leaves(gv_x)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_param_tree_identical(data):
    xla = BasicBlock(out_channels=C, kernel_size=8, dropout_rate=0.2,
                     time_dimension=T, use_pallas=False)
    pls = BasicBlock(out_channels=C, kernel_size=8, dropout_rate=0.2,
                     time_dimension=T, use_pallas=True)
    v1 = xla.init(jax.random.PRNGKey(0), data)
    v2 = pls.init(jax.random.PRNGKey(0), data)
    for a, b in zip(
        jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_determinism(data):
    pls = BasicBlock(out_channels=C, kernel_size=8, dropout_rate=0.4,
                     time_dimension=T, use_pallas=True)
    variables = pls.init(jax.random.PRNGKey(0), data)
    a = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(2)})
    c = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def loss(v, x):
        out = pls.apply(v, x, False, rngs={"dropout": jax.random.PRNGKey(3)})
        return (out ** 2).sum()

    for leaf in jax.tree_util.tree_leaves(jax.grad(loss)(variables, data)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_non_square_falls_back(data):
    """C_in != C_out must silently use the XLA path (same results)."""
    blk = BasicBlock(out_channels=C * 2, kernel_size=8, dropout_rate=0.0,
                     time_dimension=T, use_pallas=True)
    variables = blk.init(jax.random.PRNGKey(0), data)
    out = blk.apply(variables, data, True)
    assert out.shape == (B, T, C * 2)
