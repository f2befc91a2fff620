"""Tensor parallelism for the wav2vec2 feature-extraction model.

The CLIP-side models are <10 M params and never need TP (see
``parallel/mesh.py``); the wav2vec2 encoder (XLSR-53 large: 24 layers,
d=1024, ffn=4096, ~300 M params) is the one model in the system big
enough to shard, and offline feature extraction over it is the
FLOPs-heaviest stage of the whole pipeline (SURVEY §1 layer 1; ref
``preprocess_audio/create_wav2vec.py`` runs it per-chunk on one GPU).

TPU-native formulation: Megatron-style intra-layer sharding expressed as
GSPMD sharding *annotations*, not hand-written collectives —

* q/k/v projections: column-sharded ``[d, d/TP]`` → each device computes
  its slice of the attention heads (the ``[B,T,d] -> [B,T,H,hd]`` reshape
  keeps the head axis aligned with the shard boundary, so attention is
  fully local per device),
* attention out-projection: row-sharded ``[d/TP, d]`` — XLA inserts the
  one all-reduce per layer here,
* FFN: intermediate column-sharded ``[d, ffn/TP]`` (bias sharded with
  it), output row-sharded ``[ffn/TP, d]`` — the second all-reduce,
* conv feature encoder, positional conv, layer norms, final projections:
  replicated (<2% of params).

With the batch additionally sharded over the 'data' axis this yields the
standard DP×TP grid; collectives ride ICI within each TP group.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_clip_eeg_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: str, leaf) -> P:
    """Megatron partition rule for one wav2vec2 param, keyed on its flax
    module path (models/wav2vec2.py naming)."""
    col_sharded = ("q_proj", "k_proj", "v_proj", "intermediate_dense")
    row_sharded = ("out_proj", "output_dense")
    if any(f"/{name}/" in path for name in col_sharded):
        if path.endswith("kernel"):
            return P(None, MODEL_AXIS)
        return P(MODEL_AXIS)  # bias lives on the sharded output dim
    if any(f"/{name}/" in path for name in row_sharded):
        if path.endswith("kernel"):
            return P(MODEL_AXIS, None)
        return P()  # bias is added after the all-reduce; replicated
    return P()  # convs, layer norms, feature projection


def wav2vec2_tp_specs(variables: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``variables`` (Megatron layout)."""

    def spec(key_path, leaf):
        path = "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path
        )
        return _spec_for(path, leaf)

    return jax.tree_util.tree_map_with_path(spec, variables)


def validate_tp(config, n_model: int) -> None:
    """TP degree must align with the head and FFN dims so the sharded
    reshape to ``[B,T,H,hd]`` stays local."""
    if n_model <= 1:
        return
    if config.num_attention_heads % n_model:
        raise ValueError(
            f"TP degree {n_model} must divide num_attention_heads "
            f"{config.num_attention_heads}"
        )
    if config.intermediate_size % n_model:
        raise ValueError(
            f"TP degree {n_model} must divide intermediate_size "
            f"{config.intermediate_size}"
        )


def shard_wav2vec2_variables(
    mesh: Mesh, variables: Dict[str, Any], config: Optional[Any] = None
) -> Dict[str, Any]:
    """Place ``variables`` on ``mesh`` under the Megatron layout.

    Each param lands pre-sharded (column/row slices per TP rank,
    everything else replicated); jitted forwards then consume them
    without any resharding transfer.
    """
    if config is not None:
        validate_tp(config, mesh.shape.get(MODEL_AXIS, 1))
    specs = wav2vec2_tp_specs(variables)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(variables, shardings)
