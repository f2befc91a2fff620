"""SparrKULee data pipeline: discovery/splits, windowing dataset, fixtures."""

from transformer_clip_eeg_tpu.data.discovery import get_train_val_test_files_final
from transformer_clip_eeg_tpu.data.dataset import (
    EEGWindowDataset,
    EEGDatasetSimdata,
    batch_equalizer,
)

__all__ = [
    "get_train_val_test_files_final",
    "EEGWindowDataset",
    "EEGDatasetSimdata",
    "batch_equalizer",
]
