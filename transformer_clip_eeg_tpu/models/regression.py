"""Envelope-regression probe and Pearson losses.

Ref ``train_clip_helper_functions.py:1107-1140``: the probe is a single
same-pad Conv1d(input_dim → output_dim, k=32) + LeakyReLU trained with a
negative-Pearson loss (cosine of mean-centered signals over time).

The probe here runs in the TPU-native ``[B, T, C]`` layout (the reference
permutes to ``[B, C, T]`` first); ``pearson_loss`` reduces over the time axis
accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_clip_eeg_tpu.ops.layers import Conv1d, leaky_relu

Array = jax.Array


def pearson_loss(x: Array, y: Array, axis: int = 1, eps: float = 1e-6) -> Array:
    """Negative Pearson r per (batch, channel), shape ``[C]`` after batch-mean.

    Matches torch ``PearsonLoss`` (helper:1107-1117): cosine similarity of
    mean-centered signals along the time axis, mean over batch, negated.
    """
    xc = x - jnp.mean(x, axis=axis, keepdims=True)
    yc = y - jnp.mean(y, axis=axis, keepdims=True)
    num = jnp.sum(xc * yc, axis=axis)
    den = jnp.maximum(
        jnp.linalg.norm(xc, axis=axis), eps
    ) * jnp.maximum(jnp.linalg.norm(yc, axis=axis), eps)
    pearson = num / den
    return -jnp.mean(pearson, axis=0)


def pearson_loss_mean(x: Array, y: Array, axis: int = 1) -> Array:
    """torch ``PearsonLossMean`` (helper:1120-1129)."""
    return jnp.mean(pearson_loss(x, y, axis=axis))


# Aliases mirroring the reference class names.
PearsonLoss = pearson_loss
PearsonLossMean = pearson_loss_mean


class RegressionModel(nn.Module):
    """Conv1d(k=32, same) + LeakyReLU probe (helper:1132-1140).

    Input ``[B, T, input_dim]`` → ``[B, T, output_dim]``.
    """

    output_dim: int = 1
    receptive_field: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv1d(self.output_dim, self.receptive_field, name="conv")(x)
        return leaky_relu(x)
