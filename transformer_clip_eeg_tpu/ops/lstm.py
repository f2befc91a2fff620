"""LSTM as a ``lax.scan`` cell with the input projection hoisted to one matmul.

torch ``nn.LSTM`` semantics (gate order i, f, g, o; two bias vectors; zero
initial state) are replicated exactly so reference checkpoints import
losslessly (ref usage: ``clip_model.py:267-268, 322-324, 492, 542, 593-594,
610-611; 147, 173``).

TPU design notes
----------------
The recurrence is the one op XLA cannot parallelize over time, so we minimize
the work inside the scan: the full ``x @ W_ih^T + b`` for all timesteps is one
large ``[B*T, in] @ [in, 4H]`` MXU matmul *outside* the scan; the scan body is
a single ``[B, H] @ [H, 4H]`` matmul plus pointwise gate math.  Hidden sizes
here are small (4–128), so padding gates to lane width is left to XLA.

Weights are stored pre-transposed for the matmul:
``kernel_ih [in, 4H]`` (torch ``weight_ih_l0`` is ``[4H, in]``),
``kernel_hh [H, 4H]``, ``bias_ih``/``bias_hh`` ``[4H]``.
Bidirectional layers hold a second set with suffix ``_reverse``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from transformer_clip_eeg_tpu.ops.layers import torch_uniform_init

Array = jax.Array


def _pallas_lstm_default() -> bool:
    if os.environ.get("TCE_DISABLE_PALLAS", "") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _lstm_scan(
    xw: Array,  # [T, B, 4H] — precomputed x @ W_ih^T + b_ih + b_hh
    kernel_hh: Array,  # [H, 4H]
    hidden: int,
) -> Array:
    """Run the recurrence; returns hidden states [T, B, H]."""
    b = xw.shape[1]
    h0 = jnp.zeros((b, hidden), xw.dtype)
    c0 = jnp.zeros((b, hidden), xw.dtype)

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + jnp.dot(h, kernel_hh, preferred_element_type=xw.dtype)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, hs = lax.scan(step, (h0, c0), xw)
    return hs


class LSTM(nn.Module):
    """Single-layer (optionally bidirectional) batch-first LSTM.

    Input ``[B, T, in]`` → output ``[B, T, H]`` (or ``[B, T, 2H]`` if
    bidirectional, forward/backward concatenated on features like torch).
    """

    hidden_size: int
    bidirectional: bool = False
    use_pallas: Optional[bool] = None  # None = auto (TPU backend)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        h = self.hidden_size
        init = torch_uniform_init(h)  # torch: U(-1/sqrt(H), 1/sqrt(H)) everywhere
        enabled = (
            _pallas_lstm_default() if self.use_pallas is None else self.use_pallas
        )

        def dir_params(suffix: str):
            kernel_ih = self.param(f"kernel_ih{suffix}", init, (in_features, 4 * h))
            kernel_hh = self.param(f"kernel_hh{suffix}", init, (h, 4 * h))
            bias_ih = self.param(f"bias_ih{suffix}", init, (4 * h,))
            bias_hh = self.param(f"bias_hh{suffix}", init, (4 * h,))
            return kernel_ih, kernel_hh, bias_ih, bias_hh

        def input_proj(xs: Array, p) -> Array:
            # one big MXU matmul for the input projection of every timestep
            kernel_ih, _, bias_ih, bias_hh = p
            xw = (
                jnp.dot(xs, kernel_ih.astype(xs.dtype), preferred_element_type=xs.dtype)
                + (bias_ih + bias_hh).astype(xs.dtype)
            )
            return jnp.transpose(xw, (1, 0, 2))  # [T, B, 4H]

        interpret = jax.default_backend() != "tpu"
        p_f = dir_params("")
        if self.bidirectional:
            p_r = dir_params("_reverse")

        # NOTE: block-diagonal direction packing (fwd+rev as one hidden-2H
        # recurrence) was tried and measured SLOWER: doubling the state
        # width forces the VMEM-constrained batch tile from 128 down to 56,
        # which adds more sequential grid programs than packing removes.
        def direction(p, xs: Array) -> Array:
            xw = input_proj(xs, p)
            if enabled:
                from transformer_clip_eeg_tpu.ops.pallas_lstm import (
                    lstm_scan_pallas,
                )

                hs = lstm_scan_pallas(xw, p[1].astype(xs.dtype), h, interpret)
            else:
                hs = _lstm_scan(xw, p[1].astype(xs.dtype), h)
            return jnp.transpose(hs, (1, 0, 2))  # [B, T, H]

        out = direction(p_f, x)
        if self.bidirectional:
            rev = direction(p_r, jnp.flip(x, axis=1))
            out = jnp.concatenate([out, jnp.flip(rev, axis=1)], axis=-1)
        return out
