"""Core tensor ops and layers (TPU-first, [B, T, C] canonical layout)."""

from transformer_clip_eeg_tpu.ops.layers import (
    Conv1d,
    Conv2dValidTime,
    Dense,
    BatchNorm1d,
    LayerNorm,
    LayerNormTC,
    Dropout,
    gelu_exact,
    leaky_relu,
    torch_uniform_init,
)
from transformer_clip_eeg_tpu.ops.attention import (
    MultiHeadAttention,
    FeedForwardBlock,
    TransformerEncoderBlock,
    TransformerEncoder,
)
from transformer_clip_eeg_tpu.ops.lstm import LSTM

__all__ = [
    "Conv1d",
    "Conv2dValidTime",
    "Dense",
    "BatchNorm1d",
    "LayerNorm",
    "LayerNormTC",
    "Dropout",
    "gelu_exact",
    "leaky_relu",
    "torch_uniform_init",
    "MultiHeadAttention",
    "FeedForwardBlock",
    "TransformerEncoderBlock",
    "TransformerEncoder",
    "LSTM",
]
