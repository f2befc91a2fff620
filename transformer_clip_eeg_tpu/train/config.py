"""Typed training configuration with reference flag parity.

The reference configures a run through ~35 argparse flags
(ref ``train_clip_final.py:158-218``), persists ``args.__dict__`` as JSON to
``args.txt`` (ref ``:316-317``) and re-hydrates it in eval mode via ``exec``
(ref ``:274-285``).  Here the same flag names, defaults, and yes/no string
conventions live in a dataclass with a safe JSON round-trip — a config written
by the reference loads unchanged, and ``args.txt`` files we write are readable
by reference tooling.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def _yes(v: str) -> bool:
    return str(v).lower() == "yes"


@dataclass
class TrainConfig:
    """All reference flags, same names and defaults
    (ref train_clip_final.py:158-218, window math :150-155)."""

    debug: str = "no"
    only_evaluate: str = "no"
    results_folder: str = "results"
    run: int = 4

    lstm_units: int = 128
    lambda_sim_loss: float = 0.0
    warmup_epochs: int = 0
    momentum_membank: float = 0.90

    eeg_norm: str = "mvn"
    stimulus_features: str = "wav2vec_19"
    model_arch: str = "clip_sim_no_latent_proj"
    speech_encoder: str = "convLSTM"
    eeg_encoder: str = "EEGConformerInterleaved"
    attention_depth: int = 10
    load_pretrain: str = "no"

    shuffle: str = "yes"
    shuffle_percentage: float = 1.0
    addEEG: str = "no"
    data_augmentation: str = "no"
    data_augmentation_percentage: float = 0.5

    learning_rate: float = 1e-3
    beta1: float = 0.90
    beta2: float = 0.999
    use_amsgrad: str = "no"
    optimizer: str = "adamw"
    weight_decay: float = 0.01

    lr_scheduler: str = "step"
    step_size_scheduler: int = 10

    epochs: int = 500
    patience: int = 15
    batch_size: int = 128

    number_conv_layers: int = 1
    fun_act: str = "relu"
    temperature: float = 0.075
    subject_split: str = "icassp_testset"

    data_dir: str = ""
    number_of_training_subjects: int = 1000
    lambda_clip_loss: float = 1.0
    latent_dim: int = 8

    # window math (ref :150-155) — not argparse flags in the reference but
    # persisted here so a config is self-contained
    window_length_s: int = 3
    fs: int = 64

    # TPU-specific extensions (absent from the reference; defaults preserve
    # reference behavior)
    seed: int = 0
    dataset_split_stories: str = ""  # path to fold_split.json; defaults to
    # <data_dir>/fold_split.json when empty
    mesh_shape: Optional[List[int]] = None  # e.g. [8] for 8-way data parallel
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    speech_dim_override: Optional[int] = None  # test fixtures with small dims
    # batch assembly: 'host' gathers on host per batch (reference-style),
    # 'device' keeps story chunks device-resident and gathers inside the
    # jitted step (~8x less host->device traffic), 'auto' = device on TPU,
    # host otherwise
    data_mode: str = "auto"
    # device chunk-store storage dtype: 'bfloat16' halves the HBM working
    # set and upload bytes (gathers cast back to f32 in-step — input
    # rounding only).  Use when the corpus working set exceeds the HBM
    # budget (SCALE.md measured ~14 GB f32 at SparrKULee scale on a 16 GB
    # chip); 'float32' keeps chunk bytes bit-exact to the host path.
    chunk_store_dtype: str = "float32"
    # fraction of free HBM the chunk store may hold resident (auto budget)
    chunk_budget_frac: float = 0.75
    # 0 = single device; N = N-way data-parallel ('data') mesh.  Persisted
    # so --only_evaluate / cv reloads reconstruct the mesh the run used.
    n_data_shards: int = 0
    # memory-bank / class-count sizing the Trainer derived from the dataset
    # (ref train_clip_final.py:367-372); 0 = not yet derived.  Persisted so
    # serving can rebuild the exact head without the dataset (membank-free
    # archs leave no bank in the checkpoint to infer it from).
    bank_size: int = 0
    # write a jax.profiler trace of the first training epoch here
    profile_dir: str = ""
    # jax PRNG implementation for dropout/augmentation/init streams.
    # 'rbg' = threefry-quality key derivation + XLA RngBitGenerator bits:
    # +16-20% train-step throughput (dropout mask generation leaves the
    # critical path, PERF.md).  'threefry2x32' = jax's default, for
    # bit-reproducing runs recorded before this field existed.  Sampling
    # streams differ between impls (loss trajectories are statistically
    # equivalent, not bit-equal).  Default shared with the bench/profile
    # entry points via utils.platform.DEFAULT_PRNG_IMPL (kept a literal
    # here so the dataclass stays import-light; the coupling is pinned by
    # tests/test_prng_impl.py::test_default_prng_impl_is_shared).
    prng_impl: str = "rbg"
    # per-100-batch loss lines (ref :494-500): "epoch" (default) holds the
    # device loss scalars and writes identical lines once the epoch's
    # compute drains — no mid-epoch host↔device sync (over a tunneled link
    # those fetches serialized ~15 s of a ~12 s warm epoch, SCALE.md run B);
    # "batch" streams each line live for interactive debugging.
    loss_log_stream: str = "epoch"
    # persistent XLA compilation cache directory.  First compile of the
    # fused train step is ~20-40 s on TPU; with a cache dir every later
    # process (CLI restart, --only_evaluate, serving) deserializes the
    # executable instead of recompiling.  Safe to share between runs —
    # entries are keyed by program + device fingerprint.  "auto" (default,
    # VERDICT r4 #4a) = a ``jit_cache/`` sibling of the timestamped run
    # dir, shared across runs under the same results folder; "" = off;
    # a JAX_COMPILATION_CACHE_DIR env var wins over either.
    compile_cache_dir: str = "auto"

    # -- derived ------------------------------------------------------------

    @property
    def window_length(self) -> int:
        return self.window_length_s * self.fs

    @property
    def hop_length(self) -> int:
        return self.window_length

    @property
    def speech_dimension(self) -> int:
        """Stimulus feature → feature dim (ref train_clip_final.py:291-300)."""
        if self.speech_dim_override is not None:
            return self.speech_dim_override
        if "mel" in self.stimulus_features:
            return 28
        if "env" in self.stimulus_features:
            return 1
        return 1024  # wav2vec_*

    @property
    def spatial_filters(self) -> int:
        """Stimulus feature → spatial filters (ref train_clip_final.py:291-300)."""
        if "mel" in self.stimulus_features:
            return 64
        if "env" in self.stimulus_features:
            return 8
        return 128  # wav2vec_*

    @property
    def stride_temporal(self) -> int:
        return 3

    @property
    def fold_split_path(self) -> str:
        return self.dataset_split_stories or os.path.join(
            self.data_dir, "fold_split.json"
        )

    @property
    def is_debug(self) -> bool:
        return _yes(self.debug)

    @property
    def is_kld(self) -> bool:
        return self.model_arch in ("clip_kld", "clip_kld_latent_proj")

    @property
    def shuffle_b(self) -> bool:
        return _yes(self.shuffle)

    @property
    def addEEG_b(self) -> bool:
        return _yes(self.addEEG)

    @property
    def amsgrad_b(self) -> bool:
        return _yes(self.use_amsgrad)

    @property
    def augmentations(self) -> List[str]:
        return [] if self.data_augmentation == "no" else [self.data_augmentation]

    # -- persistence (args.txt compatible) ----------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        """Write the reference-style ``args.txt`` JSON (ref :316-317)."""
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        """Hydrate from a dict, ignoring unknown keys (so reference-written
        args.txt files load; the reference used ``exec`` for this, ref :284)."""
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def load(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def results_dir_name(self, timestamp: str) -> str:
        """Ref :303-310 naming convention."""
        return (
            f"results_{self.model_arch}_eeg_{self.eeg_encoder}"
            f"_speech_{self.speech_encoder}_date_{timestamp}"
        )
