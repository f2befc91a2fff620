"""Parity tests: JAX wav2vec2 vs HuggingFace torch (random small config)."""

import numpy as np
import pytest

import jax

from transformer_clip_eeg_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    convert_hf_wav2vec2,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_stride=(5, 2),
        conv_kernel=(10, 3),
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    hf_model = HFModel(hf_cfg).eval()
    cfg = Wav2Vec2Config.from_hf(hf_cfg)
    model = Wav2Vec2Model(cfg)
    variables = convert_hf_wav2vec2(hf_model)
    return hf_model, model, variables


def test_full_forward_parity(hf_pair):
    import torch

    hf_model, model, variables = hf_pair
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 800)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(audio)).last_hidden_state.numpy()
    out = np.asarray(model.apply(variables, audio))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_tap_layer_parity(hf_pair):
    import torch

    hf_model, model, variables = hf_pair
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 640)).astype(np.float32)

    with torch.no_grad():
        hs = hf_model(
            torch.from_numpy(audio), output_hidden_states=True
        ).hidden_states
    for tap in (0, 1, 2, 3):
        ref = hs[tap].numpy()
        out = np.asarray(model.apply(variables, audio, tap_layer=tap))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3, err_msg=f"tap {tap}")


def test_num_output_frames(hf_pair):
    _, model, variables = hf_pair
    audio = np.zeros((1, 800), np.float32)
    out = model.apply(variables, audio, tap_layer=0)
    assert out.shape[1] == model.num_output_frames(800)
