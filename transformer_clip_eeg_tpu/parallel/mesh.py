"""Device mesh construction and sharding rules.

The reference is strictly single-device (ref ``train_clip_final.py:134-138``
selects one cuda/cpu device; no distributed backend exists anywhere in the
repo).  Scale-out here is TPU-native: a ``jax.sharding.Mesh`` over ICI with
**batch-sharded data parallelism** — the one strategy this workload needs,
because InfoNCE quality scales with global batch (SURVEY §5.8).

Semantics: the jitted train step receives the batch sharded over the 'data'
axis and the state replicated.  XLA/GSPMD partitions the encoders batch-wise
with zero communication, then inserts exactly one all-gather of the
L2-normalized embeddings ahead of the global B×B similarity matmul, and a
reduce for the gradients — the same collective pattern one would write by
hand with ``shard_map`` + ``all_gather``/``psum``, derived automatically from
the sharding annotations.  The memory-bank scatter runs on replicated state
with globally-gathered (ids, values), so every device applies the identical
update and the bank stays consistent without extra collectives.

The 'model' axis tensor-shards the wav2vec2 feature-extraction model
(the only large model in the system — Megatron layout in
``parallel/tp.py``); the CLIP models (<10 M params) never need TP/PP.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh; defaults to all devices data-parallel."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch on the mesh, sharded over the 'data' axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))
