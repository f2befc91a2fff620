"""VLAAI baseline EEG decoder, TPU-native ([B, T, C] layout).

Ref /root/reference/vlaai.py:
* ``Extractor`` (:5-46): 1×1 conv + 5× (same-pad Conv1d, joint-[C,T]
  LayerNorm, LeakyReLU) with channel ramp 256,256,256,128,128, k=64;
* ``OutputContext`` (:48-72): same-pad Conv1d k=64 + LayerNorm + LeakyReLU;
* ``VLAAI`` (:74-133): a single *shared* sequentialConvStack (Extractor →
  1×1 recombination 128→64 → OutputContext) applied ``nb_blocks`` times,
  with the raw (pre-1×1) input added as a skip for all middle blocks
  (ref :124-130), then a final 1×1 conv to ``output_dim``.
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import linen as nn

from transformer_clip_eeg_tpu.ops.layers import Conv1d, LayerNormTC, leaky_relu

Array = jax.Array


class Extractor(nn.Module):
    filters: Tuple[int, ...] = (256, 256, 256, 128, 128)
    kernels: Tuple[int, ...] = (64,) * 5
    dilation_rate: int = 1
    input_channels: int = 64
    time_dimension: int = 64 * 5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv1d(self.input_channels, 1, name="eeg")(x)
        for i, (f, k) in enumerate(zip(self.filters, self.kernels)):
            x = Conv1d(f, k, dilation=self.dilation_rate, name=f"conv_{i}")(x)
            x = LayerNormTC(self.time_dimension, f, name=f"norm_{i}")(x)
            x = leaky_relu(x)
        return x


class OutputContext(nn.Module):
    filter_: int = 64
    kernel: int = 64
    time_dimension: int = 64 * 5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv1d(self.filter_, self.kernel, name="conv1d")(x)
        x = LayerNormTC(self.time_dimension, self.filter_, name="normalization_fn")(x)
        return leaky_relu(x)


class VLAAI(nn.Module):
    nb_blocks: int = 4
    use_skip: bool = True
    input_channels: int = 64
    output_dim: int = 64
    time_dimension: int = 64 * 5

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.output_dim  # ref vlaai.py:106-107

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        skip = x  # raw input (pre 1×1), ref vlaai.py:114-118
        x = Conv1d(self.input_channels, 1, name="eeg")(x)
        # one shared stack applied nb_blocks times (weight sharing,
        # ref vlaai.py:101,124-130)
        stack_extractor = Extractor(
            input_channels=self.input_channels,
            time_dimension=self.time_dimension,
            name="extractor",
        )
        stack_recomb = Conv1d(self.input_channels, 1, name="linear_recombination")
        stack_out = OutputContext(
            filter_=self.input_channels,
            time_dimension=self.time_dimension,
            name="output_context",
        )

        def stack(v):
            return stack_out(stack_recomb(stack_extractor(v)))

        for idx in range(self.nb_blocks):
            if idx == 0 or idx == self.nb_blocks - 1 or not self.use_skip:
                x = stack(x)
            else:
                x = stack(x + skip)
        return Conv1d(self.output_dim, 1, name="final_linear")(x)
