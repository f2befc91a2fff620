"""Device-mesh construction and sharding helpers (ICI data + tensor
parallelism)."""

from transformer_clip_eeg_tpu.parallel.distributed import initialize_distributed
from transformer_clip_eeg_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from transformer_clip_eeg_tpu.parallel.tp import (
    shard_wav2vec2_variables,
    wav2vec2_tp_specs,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_wav2vec2_variables",
    "wav2vec2_tp_specs",
]
