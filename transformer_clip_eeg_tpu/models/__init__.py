"""Model zoo: encoders, CLIP loss heads, memory bank, baselines, probes."""

from transformer_clip_eeg_tpu.models.encoders import (
    BasicBlock,
    EEGConformer,
    EEGConformerInterleaved,
    EEGConvLSTM,
    EEGConvLSTMNew,
    EEGExtended,
    EEGLstm,
    EEGModel,
    MelModel,
    SpeechSmallConv,
    Wav2vecSmallModel,
)
from transformer_clip_eeg_tpu.models.vlaai import VLAAI
from transformer_clip_eeg_tpu.models.heads import (
    CLIP,
    CLIPKLDNoLatentProj,
    CLIPKLDWithLatentProj,
    CLIPNoContrastiveLearning,
    CLIPSim,
    CLIPSimMultiplePositives,
    CLIPSimMultiplePositivesAdapted,
    CLIPSimNoLatentProj,
    BaseMatchMismatch,
    MemoryBank,
    ProjectionHead,
    ProjectionHeadLinear,
)
from transformer_clip_eeg_tpu.models.baselines import CNN, FCNN, ClassificationHead
from transformer_clip_eeg_tpu.models.regression import (
    PearsonLoss,
    PearsonLossMean,
    RegressionModel,
    pearson_loss,
)
from transformer_clip_eeg_tpu.models.registry import (
    load_eeg_encoder,
    load_speech_encoder,
    build_model,
)
from transformer_clip_eeg_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    convert_hf_wav2vec2,
)

__all__ = [
    "BasicBlock",
    "EEGConformer",
    "EEGConformerInterleaved",
    "EEGConvLSTM",
    "EEGConvLSTMNew",
    "EEGExtended",
    "EEGLstm",
    "EEGModel",
    "MelModel",
    "SpeechSmallConv",
    "Wav2vecSmallModel",
    "VLAAI",
    "CLIP",
    "CLIPKLDNoLatentProj",
    "CLIPKLDWithLatentProj",
    "CLIPNoContrastiveLearning",
    "CLIPSim",
    "CLIPSimMultiplePositives",
    "CLIPSimMultiplePositivesAdapted",
    "CLIPSimNoLatentProj",
    "BaseMatchMismatch",
    "MemoryBank",
    "ProjectionHead",
    "ProjectionHeadLinear",
    "CNN",
    "FCNN",
    "ClassificationHead",
    "PearsonLoss",
    "PearsonLossMean",
    "RegressionModel",
    "pearson_loss",
    "load_eeg_encoder",
    "load_speech_encoder",
    "build_model",
    "Wav2Vec2Config",
    "Wav2Vec2Model",
    "convert_hf_wav2vec2",
]
