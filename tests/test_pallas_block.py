"""Fused Pallas transformer block: parity with the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.ops.attention import TransformerEncoderBlock
from transformer_clip_eeg_tpu.ops.pallas_block import fused_transformer_block

B, T, E, H = 8, 32, 16, 4


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)


def test_param_tree_identical(data):
    xla = TransformerEncoderBlock(E, num_heads=H, use_pallas=False)
    pls = TransformerEncoderBlock(E, num_heads=H, use_pallas=True)
    v_xla = xla.init(jax.random.PRNGKey(0), data)
    v_pls = pls.init(jax.random.PRNGKey(0), data)
    paths_xla = {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(v_xla)[0]
    }
    paths_pls = {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(v_pls)[0]
    }
    assert paths_xla == paths_pls
    # same init values too (same names + same distributions + same key)
    for a, b in zip(
        jax.tree_util.tree_leaves(v_xla), jax.tree_util.tree_leaves(v_pls)
    ):
        assert a.shape == b.shape


def test_forward_parity_deterministic(data):
    xla = TransformerEncoderBlock(E, num_heads=H, use_pallas=False)
    variables = xla.init(jax.random.PRNGKey(0), data)
    pls = TransformerEncoderBlock(E, num_heads=H, use_pallas=True)
    out_xla = xla.apply(variables, data, True)
    out_pls = pls.apply(variables, data, True)
    np.testing.assert_allclose(
        np.asarray(out_pls), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )


def test_gradient_parity_deterministic(data):
    xla = TransformerEncoderBlock(E, num_heads=H, use_pallas=False)
    variables = xla.init(jax.random.PRNGKey(0), data)
    pls = TransformerEncoderBlock(E, num_heads=H, use_pallas=True)

    def loss(mod):
        return lambda v, x: (mod.apply(v, x, True) ** 2).sum()

    gv_xla, gx_xla = jax.grad(loss(xla), argnums=(0, 1))(variables, data)
    gv_pls, gx_pls = jax.grad(loss(pls), argnums=(0, 1))(variables, data)
    np.testing.assert_allclose(
        np.asarray(gx_pls), np.asarray(gx_xla), atol=5e-4, rtol=1e-3
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gv_pls), jax.tree_util.tree_leaves(gv_xla)
    ):
        scale_ref = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 5e-3 * max(
            scale_ref, 1.0
        )


def test_training_dropout_statistics(data):
    """Dropout path: mean over many seeds approaches the deterministic out."""
    pls = TransformerEncoderBlock(
        E, num_heads=H, drop_p=0.3, forward_drop_p=0.3, use_pallas=True
    )
    variables = pls.init(jax.random.PRNGKey(0), data)
    det = np.asarray(pls.apply(variables, data, True))
    outs = []
    for i in range(24):
        out = pls.apply(
            variables, data, False, rngs={"dropout": jax.random.PRNGKey(i)}
        )
        outs.append(np.asarray(out))
    avg = np.mean(outs, axis=0)
    # stochastic mean approaches the deterministic forward (inverted dropout
    # is unbiased per-layer; residual structure keeps it close)
    assert np.abs(avg - det).mean() < 0.3 * np.abs(det).mean()
    # two different seeds give different outputs; same seed identical
    a = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(2)})
    c = pls.apply(variables, data, False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_training_gradients_finite(data):
    pls = TransformerEncoderBlock(
        E, num_heads=H, drop_p=0.5, forward_drop_p=0.5, use_pallas=True
    )
    variables = pls.init(jax.random.PRNGKey(0), data)

    def loss(v, x):
        out = pls.apply(
            v, x, False, rngs={"dropout": jax.random.PRNGKey(3)}
        )
        return (out ** 2).sum()

    gv, gx = jax.grad(loss, argnums=(0, 1))(variables, data)
    for leaf in jax.tree_util.tree_leaves((gv, gx)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_matmul_mode_close_to_f32(data):
    """mm_dtype='bfloat16' (the --compute_dtype fast mode) must stay close
    to the f32 kernel in both forward and gradients — bf16 operands, f32
    accumulation/softmax/LN."""
    pls = TransformerEncoderBlock(E, num_heads=H, use_pallas=True)
    variables = pls.init(jax.random.PRNGKey(0), data)

    out_f32 = pls.apply(variables, data, True)
    out_bf16 = pls.apply(variables, data.astype(jnp.bfloat16), True)
    assert out_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32),
        atol=5e-2, rtol=5e-2,
    )

    def loss(v, x):
        return jnp.sum(jnp.square(pls.apply(v, x, True).astype(jnp.float32)))

    g_f32 = jax.grad(loss)(variables, data)
    g_bf16 = jax.grad(loss)(variables, data.astype(jnp.bfloat16))
    for a, b in zip(
        jax.tree_util.tree_leaves(g_f32), jax.tree_util.tree_leaves(g_bf16)
    ):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.all(np.isfinite(b))
        denom = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / denom < 0.06
