"""Offline preprocessing: wav2vec2 stimulus feature extraction."""

from transformer_clip_eeg_tpu.preprocess.wav2vec import (
    Wav2Vec2FeatureExtractor,
    extract_stimulus_features,
    load_audio,
)

__all__ = [
    "Wav2Vec2FeatureExtractor",
    "extract_stimulus_features",
    "load_audio",
]
