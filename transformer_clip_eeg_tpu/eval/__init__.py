"""Evaluation suite: match-mismatch challenge, regression probes, labels."""

from transformer_clip_eeg_tpu.eval.labels import (
    load_labels_match_mismatch_2023,
    load_labels_regression_2023,
)
from transformer_clip_eeg_tpu.eval.match_mismatch import (
    embed_in_chunks,
    evaluate_model_challenge_2023_mm,
)
from transformer_clip_eeg_tpu.eval.regression import (
    evaluate_model_challenge_2023_regression,
    evaluate_model_do_regression_sub_independent,
    evaluate_model_do_regression_sub_specific,
    hann_overlap_add,
    match_time_length,
    train_regression_probe,
)

__all__ = [
    "embed_in_chunks",
    "evaluate_model_challenge_2023_mm",
    "evaluate_model_challenge_2023_regression",
    "evaluate_model_do_regression_sub_independent",
    "evaluate_model_do_regression_sub_specific",
    "hann_overlap_add",
    "load_labels_match_mismatch_2023",
    "load_labels_regression_2023",
    "match_time_length",
    "train_regression_probe",
]
