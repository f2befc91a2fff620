"""Device-mesh construction and sharding helpers (ICI data parallelism)."""

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

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
