"""Auxiliary baseline networks kept for experiment parity.

Ref: ``ClassificationHead`` clip_model.py:102-125, ``FCNN`` :1496-1522,
``CNN`` (EEGNet-style) :1525-1597.  These are not wired into the training
driver (same as the reference) but are part of the component inventory.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from transformer_clip_eeg_tpu.ops.layers import (
    BatchNorm1d,
    Dense,
    Dropout,
    elu,
    torch_uniform_init,
)

Array = jax.Array


class ClassificationHead(nn.Module):
    """Flatten → 2440→256→32→4 MLP; returns (flattened, logits).

    Ref clip_model.py:102-125 (the unused ``clshead`` branch is omitted —
    the reference never calls it)."""

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Tuple[Array, Array]:
        x = x.reshape(x.shape[0], -1)
        out = Dense(256, name="fc1")(x)
        out = elu(out)
        out = Dropout(0.5, name="drop1")(out, deterministic)
        out = Dense(32, name="fc2")(out)
        out = elu(out)
        out = Dropout(0.3, name="drop2")(out, deterministic)
        out = Dense(4, name="fc3")(out)
        return x, out


class SqueezeLayer(nn.Module):
    """Squeeze one axis (ref clip_model.py:127-133) — torch's module wrapper
    around ``squeeze``; kept for experiment-script parity."""

    axis: int

    def __call__(self, x: Array) -> Array:
        if x.shape[self.axis] != 1:
            return x  # torch.squeeze(dim=) is a no-op on non-unit dims
        return jnp.squeeze(x, axis=self.axis)


class ConvBlock(nn.Module):
    """Conv2d → BatchNorm2d → activation (ref clip_model.py:644-655).

    Torch ``[B, C, H, W]`` layout; unused by the training driver (same as
    the reference) but part of the component inventory."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    padding: str = "valid"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        x = _Conv2dTorch(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            padding=self.padding,
            name="conv",
        )(x)
        x = _BatchNorm2dTorch(name="batchnorm")(x, use_running_average)
        if self.activation == "relu":
            return jax.nn.relu(x)
        if self.activation == "elu":
            return elu(x)
        raise ValueError(f"unknown activation {self.activation!r}")


class FCNN(nn.Module):
    """Fully-connected ladder decoder (ref clip_model.py:1496-1522)."""

    num_hidden: int = 1
    dropout_rate: float = 0.3
    input_length: int = 50
    num_input_channels: int = 63

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        units = np.round(
            np.linspace(
                1, self.input_length * self.num_input_channels, self.num_hidden + 2
            )[::-1]
        ).astype(int)
        x = x.reshape(x.shape[0], -1)
        for i in range(len(units) - 2):
            x = Dense(int(units[i + 1]), name=f"fc_{i}")(x)
            x = jnp.tanh(x)
            x = Dropout(self.dropout_rate, name=f"drop_{i}")(x, deterministic)
        x = Dense(int(units[-1]), name=f"fc_{len(units) - 2}")(x)
        return x.reshape(-1)


class _Conv2dTorch(nn.Module):
    """Minimal torch-layout grouped Conv2d for the EEGNet-style CNN.

    Input/output ``[B, C, H, W]`` (torch layout — this net is only used for
    parity experiments, not on the hot path)."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    padding: str = "valid"  # 'same' | 'valid'
    groups: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        fan_in = (self.in_channels // self.groups) * kh * kw
        kernel = self.param(
            "kernel",
            torch_uniform_init(fan_in),
            (self.out_channels, self.in_channels // self.groups, kh, kw),
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.out_channels,))
        if self.padding == "same":
            pad = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
        else:
            pad = [(0, 0), (0, 0)]
        y = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
        )
        return y + bias[None, :, None, None].astype(x.dtype)


class _BatchNorm2dTorch(nn.Module):
    """torch BatchNorm2d over [B, C, H, W]."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        c = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = (0, 2, 3)
            n = x.size // c
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean[None, :, None, None]), axis=axes)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x - mean[None, :, None, None]) * lax.rsqrt(
            var[None, :, None, None] + self.epsilon
        )
        return y * scale[None, :, None, None] + bias[None, :, None, None]


class CNN(nn.Module):
    """EEGNet-style CNN decoder (ref clip_model.py:1525-1597).

    Input ``[B, C, T]`` (torch layout preserved — matches the reference's
    calling convention for this baseline)."""

    F1: int = 16
    D: int = 16
    F2: int = 16
    dropout_rate: float = 0.25
    input_length: int = 50
    num_input_channels: int = 63

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        tp1, tp2 = 2, 5
        x = x[:, None, :, :]  # [B, 1, C, T]
        out = _Conv2dTorch(1, self.F1, (1, 3), padding="same", name="conv1")(x)
        out = _BatchNorm2dTorch(name="bnorm1")(out, use_running_average=deterministic)
        out = _Conv2dTorch(
            self.F1,
            self.F1 * self.D,
            (self.num_input_channels, 1),
            padding="valid",
            groups=self.F1,
            name="conv2",
        )(out)
        out = _BatchNorm2dTorch(name="bnorm2")(out, use_running_average=deterministic)
        out = elu(out)
        out = nn.avg_pool(
            out.transpose(0, 2, 3, 1), (1, tp1), (1, tp1)
        ).transpose(0, 3, 1, 2)
        out = Dropout(self.dropout_rate, name="dropout1")(out, deterministic)
        out = _Conv2dTorch(
            self.F1 * self.D,
            self.F1 * self.D,
            (1, 3),
            padding="same",
            groups=self.F1 * self.D,
            name="conv3",
        )(out)
        out = _Conv2dTorch(self.F1 * self.D, self.F2, (1, 1), name="conv4")(out)
        out = _BatchNorm2dTorch(name="bnorm3")(out, use_running_average=deterministic)
        out = elu(out)
        out = nn.avg_pool(
            out.transpose(0, 2, 3, 1), (1, tp2), (1, tp2)
        ).transpose(0, 3, 1, 2)
        out = Dropout(self.dropout_rate, name="dropout2")(out, deterministic)
        out = out.reshape(out.shape[0], -1)
        out = Dense(1, name="linear")(out)
        return out.reshape(-1)
