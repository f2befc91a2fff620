"""EEG and speech encoders, re-designed TPU-first.

Every encoder consumes and produces ``[B, T, C]`` — the reference's permute
gymnastics between conv ``[B, C, T]`` and attention ``[B, T, C]`` layouts
(e.g. ref ``clip_model.py:445-472``) disappear because all ops here natively
use the time-major, feature-on-lanes layout.

Behavioral parity targets (reference file:line):

* ``BasicBlock``                 — clip_model.py:234-249
* ``EEGConvLSTM``                — clip_model.py:251-325  (default speech enc)
* ``EEGConformer``               — clip_model.py:327-398
* ``EEGConformerInterleaved``    — clip_model.py:400-474  (default EEG enc)
* ``EEGConvLSTMNew``             — clip_model.py:476-545
* ``EEGModel``                   — clip_model.py:547-581
* ``EEGLstm``                    — clip_model.py:583-613
* ``EEGExtended``                — clip_model.py:615-642
* ``MelModel``                   — clip_model.py:135-175
* ``Wav2vecSmallModel``          — clip_model.py:177-201
* ``SpeechSmallConv``            — clip_model.py:204-232

``get_output_dim(window)`` contracts are replicated verbatim, including the
reference's quirks (e.g. Wav2vecSmallModel reports ``window * filters`` even
though its stride-3 conv shrinks time — ref clip_model.py:190-192).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_clip_eeg_tpu.ops.attention import TransformerEncoder
from transformer_clip_eeg_tpu.ops.layers import (
    ACTIVATIONS,
    BatchNorm1d,
    Conv1d,
    Conv2dValidTime,
    Dense,
    Dropout,
    LayerNormTC,
    gelu_exact,
    leaky_relu,
    torch_uniform_init,
)
from transformer_clip_eeg_tpu.ops.lstm import LSTM

Array = jax.Array


class _Conv1dP(nn.Module):
    """Declare ``Conv1d``-shaped params (kernel + bias) without any compute.

    Same shim pattern as ``ops/attention._DenseP``: keeps checkpoints
    key-compatible with modules the reference constructs but never applies.
    """

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        fan_in = self.in_features * self.kernel_size
        return (
            self.param(
                "kernel",
                torch_uniform_init(fan_in),
                (self.kernel_size, self.in_features, self.features),
            ),
            self.param("bias", torch_uniform_init(fan_in), (self.features,)),
        )


class BasicBlock(nn.Module):
    """Conv1d(same) → Dropout → joint-[C,T] LayerNorm → exact GELU.

    Ref clip_model.py:234-249 (GELU since May 2024; LeakyReLU before).

    A fused Pallas implementation exists (``ops/pallas_conv.py``,
    ``use_pallas=True``; square channels, unit stride/dilation) but is OFF by
    default: XLA's native conv lowering beats the scratch-assembled im2col
    kernel at these shapes (measured 4.7 vs 6.2 ms fwd, 7.2 vs 17.3 ms
    fwd+bwd for the 10-block flagship stack at batch 128), so the kernel is
    kept as a verified alternative, not the default path.
    """

    out_channels: int
    kernel_size: int = 64
    time_dimension: int = 320
    dropout_rate: float = 0.2
    stride: int = 1
    dilation: int = 1
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        enabled = bool(self.use_pallas)  # default (None) = XLA path
        if (
            enabled
            and x.shape[-1] == self.out_channels
            and self.stride == 1
            and self.dilation == 1
        ):
            return self._pallas_path(x, deterministic)
        x = Conv1d(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding="same",
            dilation=self.dilation,
            name="conv",
        )(x)
        x = Dropout(self.dropout_rate, name="dropout")(x, deterministic)
        x = LayerNormTC(self.time_dimension, self.out_channels, name="normalization")(x)
        return gelu_exact(x)

    def _pallas_path(self, x: Array, deterministic: bool) -> Array:
        from transformer_clip_eeg_tpu.ops.pallas_conv import fused_basic_block

        c = self.out_channels
        fan_in = x.shape[-1] * self.kernel_size
        # declare params with the exact tree/init of the XLA path
        w, b = self._declare_conv(fan_in, c)
        scale, bias = self._declare_ln(c)
        training = (not deterministic) and self.dropout_rate > 0.0
        if training:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1
            ).astype(jnp.float32)
        else:
            seed = jnp.zeros((), jnp.float32)
        interpret = jax.default_backend() != "tpu"
        return fused_basic_block(
            x, w, b, scale, bias, seed, self.kernel_size,
            self.dropout_rate, training, interpret,
        )

    def _declare_conv(self, fan_in: int, c: int):
        class _ConvP(nn.Module):
            @nn.compact
            def __call__(slf):
                from transformer_clip_eeg_tpu.ops.layers import (
                    torch_uniform_init,
                )

                k = slf.param(
                    "kernel",
                    torch_uniform_init(fan_in),
                    (self.kernel_size, c, c),
                )
                b = slf.param("bias", torch_uniform_init(fan_in), (c,))
                return k, b

        return _ConvP(name="conv")()

    def _declare_ln(self, c: int):
        class _LNP(nn.Module):
            @nn.compact
            def __call__(slf):
                scale = slf.param(
                    "scale",
                    nn.initializers.ones,
                    (self.time_dimension, c),
                )
                bias = slf.param(
                    "bias",
                    nn.initializers.zeros,
                    (self.time_dimension, c),
                )
                return scale, bias

        return _LNP(name="normalization")()


class EEGConvLSTM(nn.Module):
    """Spatial 1×1 map → N BasicBlocks (input-skip except last) → 2 biLSTMs.

    Ref clip_model.py:251-325.  Default speech encoder (driver
    ``train_clip_final.py:117-128``: eeg_dim=speech_dim, filters=(64,)*n,
    kernels=(32,)*n, units_lstm=128, output_dim=latent_dim).
    """

    units_lstm: int = 128
    output_dim: int = 64
    dropout_rate: float = 0.2
    eeg_dim: int = 64
    filters: Tuple[int, ...] = (256, 256, 256, 128, 128)
    kernels: Tuple[int, ...] = (64,) * 5
    dilation_rate: int = 1
    time_dimension: int = 64 * 5

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.output_dim  # ref :298-299

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Conv1d(self.filters[0], 1, name="eeg_spatial_mapping")(x)
        skip = x
        n = len(self.filters)
        for i in range(n):
            block = BasicBlock(
                out_channels=self.filters[i],
                kernel_size=self.kernels[i],
                dilation=self.dilation_rate,
                time_dimension=self.time_dimension,
                dropout_rate=self.dropout_rate,
                name=f"conv_{i}",
            )
            # ref :311-319 — skip added before every block except the last
            x = block(x if i == n - 1 else x + skip, deterministic)
        x = LSTM(self.units_lstm, bidirectional=True, name="speech_lstm1")(x)
        x = LSTM(self.output_dim // 2, bidirectional=True, name="speech_lstm2")(x)
        return x


class EEGConformer(nn.Module):
    """N conv blocks (input-skip except last) → deep transformer → Dense.

    Ref clip_model.py:327-398.
    """

    output_dim: int = 8
    conformer_input_dim: int = 64
    dropout_rate: float = 0.2
    eeg_dim: int = 64
    filters: Tuple[int, ...] = (64,) * 2
    kernels: Tuple[int, ...] = (64,) * 2
    dilation_rate: int = 1
    time_dimension: int = 64 * 5
    depth: int = 2

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.output_dim

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Conv1d(self.filters[0], 1, name="eeg_spatial_mapping")(x)
        skip = x
        n = len(self.filters)
        for i in range(n):
            block = BasicBlock(
                out_channels=self.filters[i],
                kernel_size=self.kernels[i],
                dilation=self.dilation_rate,
                time_dimension=self.time_dimension,
                dropout_rate=self.dropout_rate,
                name=f"conv_{i}",
            )
            x = block(x if i == n - 1 else x + skip, deterministic)
        x = TransformerEncoder(
            self.depth, self.conformer_input_dim, name="transformerEncoder"
        )(x, deterministic)
        return Dense(self.output_dim, name="final_layer")(x)


class EEGConformerInterleaved(nn.Module):
    """``depth``× interleaved (conv BasicBlock + 1-layer transformer) stages.

    Ref clip_model.py:400-474 — the default EEG encoder
    (driver depth=attention_depth=10).  The spatially-mapped input is added
    as a skip before *every* conv stage and before every transformer stage
    except the last (ref :454-469).
    """

    output_dim: int = 8
    conformer_input_dim: int = 64
    dropout_rate: float = 0.2
    eeg_dim: int = 64
    filters: Tuple[int, ...] = (64,)
    kernels: Tuple[int, ...] = (64,)
    dilation_rate: int = 1
    time_dimension: int = 64 * 5
    depth: int = 4

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.output_dim

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Conv1d(self.filters[0], 1, name="eeg_spatial_mapping")(x)
        skip = x
        for i in range(self.depth):
            x = BasicBlock(
                out_channels=self.filters[0],
                kernel_size=self.kernels[0],
                dilation=self.dilation_rate,
                time_dimension=self.time_dimension,
                dropout_rate=self.dropout_rate,
                name=f"conv_{i}",
            )(x + skip, deterministic)
            conformer = TransformerEncoder(
                1, self.conformer_input_dim, name=f"conformer_{i}"
            )
            x = conformer(x if i == self.depth - 1 else x + skip, deterministic)
        return Dense(self.output_dim, name="final_layer")(x)


class EEGConvLSTMNew(nn.Module):
    """Conv blocks straight on the input (no spatial map in the datapath) →
    single biLSTM.  Ref clip_model.py:476-545.

    Note: the reference *creates* a 1×1 ``eeg_spatial_mapping`` conv but never
    applies it in ``forward`` (ref :526-545); we create the parameter too so
    checkpoints stay key-compatible, and likewise skip it.
    """

    output_dim: int = 128
    dropout_rate: float = 0.2
    eeg_dim: int = 64
    filters: Tuple[int, ...] = (256,) * 2
    kernels: Tuple[int, ...] = (64,) * 2
    dilation_rate: int = 1
    input_channels: int = 64
    time_dimension: int = 64 * 5

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.output_dim

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # parameter parity only — unused in the reference forward (ref :526)
        _Conv1dP(self.eeg_dim, 1, self.eeg_dim, name="eeg_spatial_mapping")()
        skip = x
        n = len(self.filters)
        for i in range(n):
            block = BasicBlock(
                out_channels=self.filters[i],
                kernel_size=self.kernels[i],
                dilation=self.dilation_rate,
                time_dimension=self.time_dimension,
                dropout_rate=self.dropout_rate,
                name=f"conv_{i}",
            )
            x = block(x if i == n - 1 else x + skip, deterministic)
        return LSTM(self.output_dim // 2, bidirectional=True, name="lstm")(x)


class EEGModel(nn.Module):
    """BN → 1×1 conv → BN → strided valid Conv2d → 2 time-distributed Denses.

    Ref clip_model.py:547-581 (driver 'lstm' EEG arch, LeakyReLU).
    """

    spatial_filters_eeg: int = 32
    filters_cnn_eeg: int = 16
    kernel_size_temporal: int = 9
    stride_temporal: int = 3
    units_hidden: int = 128
    units_lstm: int = 32
    activation: str = "relu"

    def get_output_dim(self, input_window_size: int) -> int:
        return (
            int(
                (input_window_size - self.kernel_size_temporal)
                / self.stride_temporal
                + 1
            )
            * self.units_lstm
        )  # ref :566-567

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.activation]
        x = BatchNorm1d(name="batchnorm")(x, use_running_average=deterministic)
        x = act(Conv1d(self.spatial_filters_eeg, 1, name="eeg_conv1d")(x))
        x = BatchNorm1d(name="batchnorm_eeg")(x, use_running_average=deterministic)
        x = act(
            Conv2dValidTime(
                self.filters_cnn_eeg,
                self.kernel_size_temporal,
                self.stride_temporal,
                name="eeg_conv2d",
            )(x)
        )
        x = act(Dense(self.units_hidden, name="eeg_td1")(x))
        x = act(Dense(self.units_lstm, name="eeg_td2")(x))
        return x


class EEGExtended(nn.Module):
    """Same stack as EEGModel (ref clip_model.py:615-642); kept distinct for
    checkpoint-name parity."""

    spatial_filters_eeg: int = 32
    filters_cnn_eeg: int = 16
    kernel_size_temporal: int = 9
    stride_temporal: int = 3
    units_hidden: int = 128
    units_lstm: int = 32
    activation: str = "relu"

    def get_output_dim(self, input_window_size: int) -> int:
        return (
            int(
                (input_window_size - self.kernel_size_temporal)
                / self.stride_temporal
                + 1
            )
            * self.units_lstm
        )

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.activation]
        x = BatchNorm1d(name="batchnorm")(x, use_running_average=deterministic)
        x = act(Conv1d(self.spatial_filters_eeg, 1, name="eeg_conv1d")(x))
        x = BatchNorm1d(name="batchnorm_eeg")(x, use_running_average=deterministic)
        x = act(
            Conv2dValidTime(
                self.filters_cnn_eeg,
                self.kernel_size_temporal,
                self.stride_temporal,
                name="eeg_conv2d",
            )(x)
        )
        x = act(Dense(self.units_hidden, name="eeg_td1")(x))
        x = act(Dense(self.units_lstm, name="eeg_td2")(x))
        return x


class EEGLstm(nn.Module):
    """BN → 1×1 conv → BN → 2 stacked unidirectional LSTMs.

    Ref clip_model.py:583-613 ('double_lstm' for both streams).
    """

    spatial_filters: int = 32
    units_lstm: int = 64
    speech_dim: int = 64
    activation: str = "leaky_relu"

    def get_output_dim(self, input_window_size: int) -> int:
        return input_window_size * self.units_lstm  # ref :599-600

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.activation]
        x = BatchNorm1d(name="batchnorm_mel1")(x, use_running_average=deterministic)
        x = act(Conv1d(self.spatial_filters, 1, name="speech_conv1d")(x))
        x = BatchNorm1d(name="batchnorm_mel2")(x, use_running_average=deterministic)
        x = LSTM(self.units_lstm, name="speech_lstm1")(x)
        x = LSTM(self.units_lstm, name="speech_lstm2")(x)
        return x


class MelModel(nn.Module):
    """BN → 1×1 conv → BN → strided valid Conv2d → LSTM.

    Ref clip_model.py:135-175 (driver 'lstm' speech arch).
    """

    spatial_filters: int = 8
    filters_cnn: int = 16
    kernel_size_temporal: int = 9
    stride_temporal: int = 3
    units_lstm: int = 32
    speech_dim: int = 28
    activation: str = "relu"

    def get_output_dim(self, input_window_size: int) -> int:
        # ref :156-160 (padding='valid' path; driver always passes valid)
        return (
            int(
                (input_window_size - self.kernel_size_temporal)
                / self.stride_temporal
                + 1
            )
            * self.units_lstm
        )

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.activation]
        x = BatchNorm1d(name="batchnorm_mel1")(x, use_running_average=deterministic)
        x = act(Conv1d(self.spatial_filters, 1, name="speech_conv1d")(x))
        x = BatchNorm1d(name="batchnorm_mel2")(x, use_running_average=deterministic)
        x = act(
            Conv2dValidTime(
                self.filters_cnn,
                self.kernel_size_temporal,
                self.stride_temporal,
                name="speech_conv2d",
            )(x)
        )
        x = LSTM(self.units_lstm, name="speech_lstm")(x)
        return x


class Wav2vecSmallModel(nn.Module):
    """BN → strided valid Conv1d → LeakyReLU.  Ref clip_model.py:177-201."""

    spatial_filters: int = 64
    kernel_size_temporal: int = 3
    stride_temporal: int = 3
    speech_dim: int = 1024

    def get_output_dim(self, input_window_size: int) -> int:
        # quirk replicated: ignores the stride-3 time shrink (ref :190-192)
        return int(input_window_size * self.spatial_filters)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = BatchNorm1d(name="batchnorm_mel1")(x, use_running_average=deterministic)
        x = Conv1d(
            self.spatial_filters,
            self.kernel_size_temporal,
            stride=self.stride_temporal,
            padding="valid",
            name="speech_conv1d",
        )(x)
        return leaky_relu(x)


class SpeechSmallConv(nn.Module):
    """Same-pad Conv1d → Dropout → joint-[C,T] LayerNorm → LeakyReLU.

    Ref clip_model.py:204-232 ('smallConv' speech arch).
    """

    output_dim: int = 64
    kernel_size_temporal: int = 20
    dropout_rate: float = 0.2
    speech_dim: int = 1024
    time_dimension: int = 64 * 5

    def get_output_dim(self, input_window_size: int) -> int:
        return int(input_window_size * self.output_dim)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Conv1d(
            self.output_dim, self.kernel_size_temporal, name="speech_spatial_mapping"
        )(x)
        x = Dropout(self.dropout_rate, name="dropout")(x, deterministic)
        x = LayerNormTC(self.time_dimension, self.output_dim, name="layernorm")(x)
        return leaky_relu(x)
