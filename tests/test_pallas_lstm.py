"""Pallas LSTM recurrence: parity with the lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_clip_eeg_tpu.ops.lstm import LSTM, _lstm_scan
from transformer_clip_eeg_tpu.ops.pallas_lstm import lstm_scan_pallas


@pytest.mark.parametrize("t", [16, 19])  # aligned + ragged (padding path)
def test_scan_parity(t):
    rng = np.random.default_rng(0)
    b, h = 4, 8
    xw = jnp.asarray(rng.standard_normal((t, b, 4 * h)) * 0.5, jnp.float32)
    whh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.3, jnp.float32)
    ref = _lstm_scan(xw, whh, h)
    out = lstm_scan_pallas(xw, whh, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    t, b, h = 19, 4, 8
    xw = jnp.asarray(rng.standard_normal((t, b, 4 * h)) * 0.5, jnp.float32)
    whh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.3, jnp.float32)

    def loss_p(xw, whh):
        return (lstm_scan_pallas(xw, whh, h, True) ** 2).sum()

    def loss_r(xw, whh):
        return (_lstm_scan(xw, whh, h) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(xw, whh)
    gr = jax.grad(loss_r, argnums=(0, 1))(xw, whh)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-5)


def test_module_pallas_matches_scan():
    """Full bidirectional LSTM module: pallas path == lax.scan path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 19, 6)), jnp.float32)
    ref_mod = LSTM(hidden_size=5, bidirectional=True, use_pallas=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    pls_mod = LSTM(hidden_size=5, bidirectional=True, use_pallas=True)
    out_ref = ref_mod.apply(variables, x)
    out_pls = pls_mod.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_pls), np.asarray(out_ref), atol=1e-6
    )


def test_batch_tiling_parity(monkeypatch):
    """Batches above BATCH_TILE walk an outer grid dimension (VMEM blocks
    must not scale with global batch); ragged tiles are zero-padded and the
    padding must be invisible in outputs and grads."""
    import transformer_clip_eeg_tpu.ops.pallas_lstm as mod

    monkeypatch.setattr(mod, "BATCH_TILE", 4)
    rng = np.random.default_rng(3)
    t, h = 16, 8
    for b in (4, 8, 10):  # single tile, exact tiles, ragged final tile
        xw = jnp.asarray(rng.standard_normal((t, b, 4 * h)) * 0.5, jnp.float32)
        whh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.3, jnp.float32)
        ref = _lstm_scan(xw, whh, h)
        out = lstm_scan_pallas(xw, whh, h, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        gp = jax.grad(lambda a, w: (lstm_scan_pallas(a, w, h, True) ** 2).sum(),
                      argnums=(0, 1))(xw, whh)
        gr = jax.grad(lambda a, w: (_lstm_scan(a, w, h) ** 2).sum(),
                      argnums=(0, 1))(xw, whh)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-5)
