"""Tensor-parallel wav2vec2 extraction: sharding rules + numeric identity.

The Megatron layout (parallel/tp.py) must produce bit-comparable features
to the single-device forward — GSPMD only changes *where* each matmul
slice runs and inserts the per-layer all-reduces; the math is identical
up to reduction order."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from transformer_clip_eeg_tpu.models.wav2vec2 import (  # noqa: E402
    Wav2Vec2Config,
    Wav2Vec2Model,
)
from transformer_clip_eeg_tpu.parallel import (  # noqa: E402
    MODEL_AXIS,
    make_mesh,
    wav2vec2_tp_specs,
)
from transformer_clip_eeg_tpu.parallel.tp import validate_tp  # noqa: E402
from transformer_clip_eeg_tpu.preprocess.wav2vec import (  # noqa: E402
    Wav2Vec2FeatureExtractor,
)

SR = 800
FRAMES_PER_S = 16


@pytest.fixture(scope="module")
def tiny():
    config = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_stride=(5, 10),  # total stride 50: 800 Hz audio -> 16 fps
        conv_kernel=(10, 12),
        num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=4,
    )
    model = Wav2Vec2Model(config)
    rng = jax.random.PRNGKey(0)
    audio0 = np.zeros((1, SR), np.float32)
    variables = model.init(rng, audio0)
    return config, model, variables


def test_tp_specs_megatron_layout(tiny):
    _, _, variables = tiny
    specs = wav2vec2_tp_specs(variables)
    layer = specs["params"]["encoder"]["layers_0"]
    P = jax.sharding.PartitionSpec
    assert layer["q_proj"]["kernel"] == P(None, MODEL_AXIS)
    assert layer["q_proj"]["bias"] == P(MODEL_AXIS)
    assert layer["out_proj"]["kernel"] == P(MODEL_AXIS, None)
    assert layer["out_proj"]["bias"] == P()
    assert layer["intermediate_dense"]["kernel"] == P(None, MODEL_AXIS)
    assert layer["intermediate_dense"]["bias"] == P(MODEL_AXIS)
    assert layer["output_dense"]["kernel"] == P(MODEL_AXIS, None)
    assert layer["output_dense"]["bias"] == P()
    # non-TP params replicated
    assert specs["params"]["feature_projection"]["projection"]["kernel"] == P()
    assert specs["params"]["encoder"]["pos_conv_embed"]["conv"]["kernel"] == P()
    # every leaf got a spec (same tree structure)
    assert jax.tree.structure(specs) == jax.tree.structure(variables)


def test_validate_tp_rejects_misaligned_degree(tiny):
    config, _, _ = tiny
    validate_tp(config, 2)  # 4 heads, ffn 64 -> fine
    with pytest.raises(ValueError):
        validate_tp(config, 3)


@pytest.mark.parametrize("grid", [(4, 2), (2, 4), (1, 2)])
def test_tp_extraction_matches_single_device(tiny, grid):
    """DPxTP extraction over the virtual mesh == single-device features."""
    _, model, variables = tiny
    n_data, n_model = grid
    if n_data * n_model > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=n_data, n_model=n_model)

    rng = np.random.default_rng(7)
    audio = rng.standard_normal(SR * 13).astype(np.float32) * 0.1

    kw = dict(sr=SR, frames_per_s=FRAMES_PER_S)
    base = Wav2Vec2FeatureExtractor(model, variables, [2, 3], **kw)
    tp = Wav2Vec2FeatureExtractor(model, variables, [2, 3], mesh=mesh, **kw)

    # 13 s / 4 s segments -> 3 full chunks (pads to n_data) + ragged tail
    out0 = base.get_hidden_output(audio, overlap=2, segment_length=4)
    out1 = tp.get_hidden_output(audio, overlap=2, segment_length=4)
    for layer in (2, 3):
        assert out1[layer].shape == out0[layer].shape
        np.testing.assert_allclose(
            out1[layer], out0[layer], rtol=0, atol=2e-5
        )


def test_tp_param_shards_land_on_model_axis(tiny):
    """The sharded placement actually splits the TP params across the
    'model' axis (not just annotates them)."""
    config, model, variables = tiny
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from transformer_clip_eeg_tpu.parallel.tp import shard_wav2vec2_variables

    mesh = make_mesh(n_data=2, n_model=2)
    sharded = shard_wav2vec2_variables(mesh, variables, config=config)
    k = sharded["params"]["encoder"]["layers_0"]["q_proj"]["kernel"]
    d = config.hidden_size
    assert k.shape == (d, d)
    # each device holds a [d, d/2] column slice
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(d, d // 2)}
    b = sharded["params"]["encoder"]["layers_0"]["output_dense"]["kernel"]
    assert {s.data.shape for s in b.addressable_shards} == {
        (config.intermediate_size // 2, d)
    }
