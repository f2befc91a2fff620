"""Core layers with PyTorch-compatible numerics in a TPU-friendly layout.

Canonical activation layout is ``[B, T, C]`` (time on sublanes, features on
lanes).  The reference keeps permuting between ``[B, C, T]`` (torch conv) and
``[B, T, C]`` (attention / LSTM); here every layer consumes and produces
``[B, T, C]`` directly so XLA sees one clean layout and can fuse freely.

Numerics intentionally replicated from the reference:

* torch ``padding='same'`` for even kernels pads ``total//2`` low and the
  remainder high (verified empirically against torch 2.13);
* torch ``nn.LayerNorm([C, T])`` normalizes jointly over the channel *and*
  time axes with an elementwise affine of shape ``[C, T]``
  (ref ``clip_model.py:239``, ``vlaai.py:31``) — here :class:`LayerNormTC`
  normalizes over the last two axes of ``[B, T, C]`` with affine ``[T, C]``;
* exact (erf) GELU (ref ``clip_model.py:70-72``);
* torch default init for linear/conv layers: ``U(-1/sqrt(fan_in), +1/sqrt(fan_in))``
  for both weight and bias.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Array = jax.Array
Dtype = Any


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def torch_uniform_init(fan_in: int) -> Callable:
    """Torch's default Linear/Conv init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    (kaiming_uniform with a=sqrt(5) collapses to exactly this bound; torch
    uses it for both weights and biases of Linear/ConvNd.)
    """
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu_exact(x: Array) -> Array:
    """Exact (erf-based) GELU, matching torch nn.GELU and ref clip_model.py:70-72."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: Array, negative_slope: float = 0.01) -> Array:
    """torch nn.LeakyReLU default (slope 0.01)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def elu(x: Array) -> Array:
    return jax.nn.elu(x)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "gelu": gelu_exact,
    "elu": elu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


# ---------------------------------------------------------------------------
# Dense / Conv
# ---------------------------------------------------------------------------


class Dense(nn.Module):
    """Linear layer on the last axis; torch-default init.

    kernel is stored ``[in, out]`` (JAX convention); import from a torch
    ``nn.Linear.weight`` ([out, in]) by transposing.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_uniform_init(in_features), (in_features, self.features)
        )
        y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(in_features), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def _same_padding(kernel_size: int, dilation: int) -> Tuple[int, int]:
    """torch padding='same': total = d*(k-1); low = total//2, high = rest."""
    total = dilation * (kernel_size - 1)
    lo = total // 2
    return (lo, total - lo)


class Conv1d(nn.Module):
    """1-D convolution over the time axis of ``[B, T, C]`` input.

    Matches torch ``nn.Conv1d`` numerics (including the asymmetric even-kernel
    'same' padding).  kernel stored ``[K, C_in, C_out]`` (WIO); import from a
    torch weight ([C_out, C_in, K]) by ``transpose(2, 1, 0)``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: str = "same"  # 'same' | 'valid'
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size
        kernel = self.param(
            "kernel",
            torch_uniform_init(fan_in),
            (self.kernel_size, in_features, self.features),
        )
        if self.padding == "same":
            pad = [_same_padding(self.kernel_size, self.dilation)]
        elif self.padding == "valid":
            pad = [(0, 0)]
        else:
            raise ValueError(f"unsupported padding {self.padding!r}")
        y = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Conv2dValidTime(nn.Module):
    """The reference's strided ``Conv2d(1, F, (kT, 1), stride=(sT, 1), 'valid')``.

    Used by EEGModel / EEGExtended / MelModel (ref ``clip_model.py:144-145,
    555-556, 623-624``): a temporal conv applied independently to each spatial
    channel, with ``F`` output filters per channel.

    Input ``[B, T, S]`` → output ``[B, T', F * S]`` where the feature axis is
    flattened in torch's (filter-major, spatial-minor) order, replicating
    ``torch.reshape(x, [B, T', S * F])`` after the reference's permutes.
    ``T' = (T - kT) // sT + 1``.
    """

    filters: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, s = x.shape
        fan_in = self.kernel_size * 1  # torch fan_in: in_channels(=1) * kH * kW
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (self.kernel_size, 1, self.filters)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.filters,))
        # fold spatial into batch, run a valid strided conv1d over time
        xb = jnp.transpose(x, (0, 2, 1)).reshape(b * s, t, 1)
        y = lax.conv_general_dilated(
            xb,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        y = y + bias.astype(x.dtype)
        t_out = y.shape[1]
        y = y.reshape(b, s, t_out, self.filters)
        # torch order after its permutes is [B, T', F, S] -> flatten (F, S)
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b, t_out, self.filters * s)
        return y

    @staticmethod
    def output_length(t: int, kernel_size: int, stride: int) -> int:
        return (t - kernel_size) // stride + 1


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class LayerNorm(nn.Module):
    """Standard last-axis LayerNorm, torch eps (1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)  # stats in f32 for low-precision inputs
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = ((xf - mean) * lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class LayerNormTC(nn.Module):
    """Joint time+channel LayerNorm over ``[B, T, C]``.

    Equivalent to the reference's ``nn.LayerNorm([C, T])`` on ``[B, C, T]``
    input (ref ``clip_model.py:239``): statistics are computed per batch
    element over *both* trailing axes, with an elementwise affine.  The affine
    is stored ``[T, C]`` (transpose of the torch ``[C, T]`` parameters).
    """

    time_dim: int
    channel_dim: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale", nn.initializers.ones, (self.time_dim, self.channel_dim)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.time_dim, self.channel_dim)
        )
        xf = x.astype(jnp.float32)  # stats in f32 for low-precision inputs
        mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-2, -1), keepdims=True)
        y = ((xf - mean) * lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class BatchNorm1d(nn.Module):
    """torch-compatible BatchNorm over the channel axis of ``[B, T, C]``.

    torch ``nn.BatchNorm1d(C)`` on ``[B, C, T]`` normalizes each channel over
    (batch, time).  Training uses biased batch variance for normalization but
    updates ``running_var`` with the *unbiased* variance (torch semantics);
    running stats live in the ``batch_stats`` collection.
    """

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))  # all but channel
            n = x.size // c
            xf = x.astype(jnp.float32)  # stats in f32 for low-precision inputs
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)  # biased
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = ((x.astype(jnp.float32) - mean) * lax.rsqrt(var + self.epsilon)).astype(
            x.dtype
        )
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class Dropout(nn.Module):
    """Inverted dropout using the 'dropout' rng collection (torch-equivalent)."""

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Functional helpers
# ---------------------------------------------------------------------------


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch ``F.normalize(p=2)``: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
