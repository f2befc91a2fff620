"""Encoder/head factories mirroring the reference driver's dispatch.

Ref ``train_clip_final.py:37-100`` (load_eeg_encoder), ``:102-130``
(load_speech_encoder), ``:367-396`` (memory-bank sizing + arch dispatch).
Flag values and defaults are preserved verbatim so configs written for the
reference drive this framework unchanged.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from transformer_clip_eeg_tpu.models.encoders import (
    EEGConformer,
    EEGConformerInterleaved,
    EEGConvLSTM,
    EEGConvLSTMNew,
    EEGLstm,
    EEGModel,
    MelModel,
    SpeechSmallConv,
    Wav2vecSmallModel,
)
from transformer_clip_eeg_tpu.models.heads import (
    CLIPKLDNoLatentProj,
    CLIPKLDWithLatentProj,
    CLIPNoContrastiveLearning,
    CLIPSim,
    CLIPSimMultiplePositives,
    CLIPSimNoLatentProj,
)
from transformer_clip_eeg_tpu.models.vlaai import VLAAI


def load_eeg_encoder(
    eeg_encoder: str,
    units_lstm: int,
    spatial_filters: int,
    number_conv_layers: int,
    window_length: int,
    latent_dim: int,
    attention_depth: int,
) -> nn.Module:
    """Ref train_clip_final.py:37-100."""
    if eeg_encoder == "lstm":
        return EEGModel(
            spatial_filters_eeg=32,
            filters_cnn_eeg=16,
            kernel_size_temporal=9,
            stride_temporal=3,
            units_hidden=128,
            units_lstm=units_lstm,
            activation="leaky_relu",
        )
    if eeg_encoder == "double_lstm":
        return EEGLstm(
            speech_dim=64, units_lstm=units_lstm, spatial_filters=spatial_filters
        )
    if eeg_encoder == "vlaai":
        # the reference instantiates VLAAI() with its 320-sample LayerNorms,
        # which only runs for 5 s windows; we wire the actual window length
        # so the encoder works for any window (numerically identical at 320)
        return VLAAI(time_dimension=window_length)
    if eeg_encoder == "convLSTM":
        return EEGConvLSTM(
            units_lstm=128,
            output_dim=latent_dim,
            dropout_rate=0.4,
            eeg_dim=64,
            filters=(64,) * number_conv_layers,
            kernels=(32,) * number_conv_layers,
            dilation_rate=1,
            time_dimension=window_length,
        )
    if eeg_encoder == "convLSTMnew":
        return EEGConvLSTMNew(
            output_dim=latent_dim,
            dropout_rate=0.4,
            eeg_dim=64,
            filters=(64,) * number_conv_layers,
            kernels=(64,) * number_conv_layers,
            dilation_rate=1,
            time_dimension=window_length,
        )
    if eeg_encoder == "conformer":
        return EEGConformer(
            output_dim=latent_dim,
            conformer_input_dim=64,
            dropout_rate=0.2,
            eeg_dim=64,
            filters=(64,) * number_conv_layers,
            kernels=(64,) * number_conv_layers,
            dilation_rate=1,
            time_dimension=window_length,
            depth=attention_depth,
        )
    if eeg_encoder == "EEGConformerInterleaved":
        return EEGConformerInterleaved(
            output_dim=latent_dim,
            conformer_input_dim=64,
            dropout_rate=0.2,
            eeg_dim=64,
            filters=(64,) * number_conv_layers,
            kernels=(64,) * number_conv_layers,
            dilation_rate=1,
            time_dimension=window_length,
            depth=attention_depth,
        )
    raise ValueError(f"unknown eeg_encoder {eeg_encoder!r}")


def load_speech_encoder(
    speech_encoder: str,
    units_lstm: int,
    spatial_filters: int,
    number_conv_layers: int,
    window_length: int,
    stride_temporal: int,
    speech_dimension: int,
    latent_dim: int,
) -> nn.Module:
    """Ref train_clip_final.py:102-130 (the reference's 'smallConv' and
    'convLSTM' branches read the module-global ``latent_dim``; here it is an
    explicit argument)."""
    if speech_encoder == "lstm":
        return MelModel(
            spatial_filters=spatial_filters,
            filters_cnn=16,
            kernel_size_temporal=9,
            stride_temporal=stride_temporal,
            units_lstm=units_lstm,
            speech_dim=speech_dimension,
            activation="leaky_relu",
        )
    if speech_encoder == "double_lstm":
        return EEGLstm(
            speech_dim=speech_dimension,
            units_lstm=units_lstm,
            spatial_filters=spatial_filters,
        )
    if speech_encoder == "Wav2vecSmallModel":
        return Wav2vecSmallModel(
            speech_dim=speech_dimension,
            spatial_filters=units_lstm,
            stride_temporal=stride_temporal,
        )
    if speech_encoder == "smallConv":
        return SpeechSmallConv(
            output_dim=latent_dim,
            kernel_size_temporal=16,
            dropout_rate=0.4,
            speech_dim=speech_dimension,
            time_dimension=window_length,
        )
    if speech_encoder == "convLSTM":
        return EEGConvLSTM(
            units_lstm=128,
            output_dim=latent_dim,
            dropout_rate=0.4,
            eeg_dim=speech_dimension,
            filters=(64,) * number_conv_layers,
            kernels=(32,) * number_conv_layers,
            dilation_rate=1,
            time_dimension=window_length,
        )
    raise ValueError(f"unknown speech_encoder {speech_encoder!r}")


def build_model(
    model_arch: str,
    eeg: nn.Module,
    speech: nn.Module,
    *,
    window_length: int,
    temperature: float,
    latent_dim: int,
    bank_size: int,
    lambda_clip_loss: float = 1.0,
    lambda_sim_loss: float = 0.0,
    momentum_membank: float = 0.90,
) -> nn.Module:
    """Arch dispatch (ref train_clip_final.py:367-396).

    For 'clip_sim_no_latent_proj' and 'clip_kld' the latent dimension is
    re-derived from the speech encoder's output dim (ref :367-368).
    """
    if model_arch in ("clip_sim_no_latent_proj", "clip_kld"):
        latent_dim = speech.get_output_dim(window_length)

    if model_arch == "clip_sim":
        return CLIPSim(
            eegModel=eeg,
            speechModel=speech,
            bank_size=bank_size,
            temperature=temperature,
            latent_dim=latent_dim,
            window_length=window_length,
            lambda_clip=lambda_clip_loss,
            lambda_average=lambda_sim_loss,
            momentum_membank=momentum_membank,
        )
    if model_arch == "clip_sim_no_latent_proj":
        return CLIPSimNoLatentProj(
            eegModel=eeg,
            speechModel=speech,
            bank_size=bank_size,
            latent_dim=latent_dim,
            temperature=temperature,
            window_length=window_length,
            lambda_clip=lambda_clip_loss,
            lambda_average=lambda_sim_loss,
            momentum_membank=momentum_membank,
        )
    if model_arch == "clip_mp":
        return CLIPSimMultiplePositives(
            eegModel=eeg,
            speechModel=speech,
            temperature=temperature,
            window_length=window_length,
            lambda_clip=lambda_clip_loss,
            lambda_average=lambda_sim_loss,
        )
    if model_arch == "clip_kld":
        return CLIPKLDNoLatentProj(
            eegModel=eeg,
            speechModel=speech,
            latent_dimension=latent_dim,
            number_of_classes=bank_size,
            temperature=temperature,
            window_length=window_length,
            lambda_clip=lambda_clip_loss,
            lambda_lower_bound=lambda_sim_loss,
            lambda_discriminative=lambda_sim_loss,
        )
    if model_arch == "clip_kld_latent_proj":
        return CLIPKLDWithLatentProj(
            eegModel=eeg,
            speechModel=speech,
            latent_dimension=latent_dim,
            number_of_classes=bank_size,
            temperature=temperature,
            window_length=window_length,
            lambda_clip=lambda_clip_loss,
            lambda_lower_bound=lambda_sim_loss,
            lambda_discriminative=lambda_sim_loss,
        )
    if model_arch == "no_contrastive_learning":
        return CLIPNoContrastiveLearning(
            eegModel=eeg, speechModel=speech, window_length=window_length
        )
    raise ValueError(f"unknown model_arch {model_arch!r}")
