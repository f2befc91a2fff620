"""Extraction-pipeline tests: chunked hidden-output parity + main-loop run."""

import gzip
import os

import numpy as np
import pytest

from transformer_clip_eeg_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    convert_hf_wav2vec2,
)
from transformer_clip_eeg_tpu.preprocess.wav2vec import (
    Wav2Vec2FeatureExtractor,
    extract_stimulus_features,
)

SR = 160  # scaled-down "16 kHz" so tiny-model chunks stay small
FRAMES_PER_S = 8  # with conv strides (5, 2, 2) → stride 20 = SR/8


@pytest.fixture(scope="module")
def tiny(hf_pair=None):
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        hidden_size=24,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=48,
        conv_dim=(12, 12, 12),
        conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3),
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
    model = Wav2Vec2Model(Wav2Vec2Config.from_hf(hf_cfg))
    variables = convert_hf_wav2vec2(hf_model)
    return hf_model, model, variables


def reference_get_hidden_output(hf_model, audio, layers, overlap, segment_length):
    """The reference's chunk loop (ref create_wav2vec.py:68-123) executed
    verbatim-semantics on the torch model, scaled to SR/FRAMES_PER_S."""
    import torch

    speech_array = np.expand_dims(audio, 0)
    seg = segment_length * SR
    wav_length = speech_array.size
    padded = np.concatenate(
        [np.zeros((1, int(overlap / 2) * SR), np.float32), speech_array], axis=1
    )
    outputs = {l: [] for l in layers}
    end_of_file = False
    for i in range(int(wav_length / seg) + 1):
        start = i * seg
        end = start + seg + overlap * SR
        if end < padded.size:
            seg_arr = padded[:, start:end]
        else:
            seg_arr = padded[:, start:]
            end_of_file = True
        with torch.no_grad():
            hs = hf_model(
                torch.from_numpy(seg_arr), output_hidden_states=True
            ).hidden_states
        for layer in layers:
            out = np.squeeze(hs[layer].numpy())
            cut = int(overlap / 2) * FRAMES_PER_S
            if end_of_file:
                out = out[cut:]
            else:
                out = out[cut : -cut + 1, :]
            outputs[layer].append(out)
        # NB: the reference loop has no break — later iterations append
        # further tail chunks once end_of_file triggers
    return {l: np.vstack(v) for l, v in outputs.items()}


@pytest.mark.parametrize(
    "n_samples",
    [
        SR * 7 + 37,  # ordinary ragged tail
        int(SR * 6.2),  # triggers the reference's duplicated-tail quirk
    ],
)
def test_chunked_extraction_parity(tiny, n_samples):
    hf_model, model, variables = tiny
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(n_samples).astype(np.float32)

    extractor = Wav2Vec2FeatureExtractor(
        model, variables, layers=(1, 3), sr=SR, frames_per_s=FRAMES_PER_S
    )
    ours = extractor.get_hidden_output(audio, overlap=2, segment_length=2)
    ref = reference_get_hidden_output(
        hf_model, audio, layers=(1, 3), overlap=2, segment_length=2
    )
    for layer in (1, 3):
        assert ours[layer].shape == ref[layer].shape
        np.testing.assert_allclose(ours[layer], ref[layer], atol=3e-4, rtol=1e-3)


def test_extract_stimulus_features_main_loop(tiny, tmp_path):
    _, model, variables = tiny
    stim_dir = tmp_path / "stimuli" / "eeg"
    save_dir = tmp_path / "derivatives" / "preprocessed_stimuli"
    os.makedirs(stim_dir)
    rng = np.random.default_rng(1)

    def write_npz_gz(name, seconds, fs=SR * 2):
        raw = tmp_path / f"{name}.npz"
        np.savez(raw, audio=rng.standard_normal(fs * seconds).astype(np.float32),
                 fs=fs)
        with open(raw, "rb") as f_in, gzip.open(
            stim_dir / f"{name}.npz.gz", "wb"
        ) as f_out:
            f_out.write(f_in.read())

    write_npz_gz("story_one", 5)
    write_npz_gz("noise_story", 5)  # must be skipped
    write_npz_gz("t_trigger", 5)  # must be skipped

    extractor = Wav2Vec2FeatureExtractor(
        model, variables, layers=(2,), sr=SR, frames_per_s=FRAMES_PER_S
    )
    saved = extract_stimulus_features(
        extractor, str(stim_dir), str(save_dir), overlap=2, segment_length=2,
        final_rate_hz=10,
    )
    assert len(saved) == 1
    out = np.load(saved[0])
    assert os.path.basename(saved[0]) == "story_one_-_wav2vec_2.npy"
    assert out.shape[1] == 24  # hidden size
    # 50→64-style resampling: frames * 10/8
    # (exact count depends on strip math; just check it's plausible)
    assert out.shape[0] > 0

    # idempotent second run
    saved2 = extract_stimulus_features(
        extractor, str(stim_dir), str(save_dir), overlap=2, segment_length=2,
        final_rate_hz=10,
    )
    assert saved2 == []


def test_kaiser_best_resampler_quality():
    """The .wav ingest resampler must be a near-ideal lowpass (the
    librosa-family kaiser_best filter): in-band tones preserved to ~1e-4,
    out-of-band tones rejected, DC gain exactly 1 both directions
    (VERDICT r1 missing #4)."""
    from transformer_clip_eeg_tpu.preprocess.wav2vec import (
        kaiser_best_resample,
    )

    sr_in, sr_out = 48000, 16000
    t_in = np.arange(sr_in) / sr_in
    t_out = np.arange(sr_out) / sr_out

    # in-band content (1 kHz + 5 kHz < 8 kHz Nyquist) survives intact
    x = np.sin(2 * np.pi * 1000 * t_in) + 0.5 * np.sin(2 * np.pi * 5000 * t_in)
    y = kaiser_best_resample(x.astype(np.float32), sr_out, sr_in)
    ideal = np.sin(2 * np.pi * 1000 * t_out) + 0.5 * np.sin(
        2 * np.pi * 5000 * t_out
    )
    core = slice(1000, sr_out - 1000)  # steady state, away from edges
    err = np.linalg.norm(y[core] - ideal[core]) / np.linalg.norm(ideal[core])
    assert err < 2e-4, err

    # above-Nyquist content (9 kHz > 8 kHz) is rejected, not aliased
    x_alias = np.sin(2 * np.pi * 9000 * t_in).astype(np.float32)
    y_alias = kaiser_best_resample(x_alias, sr_out, sr_in)
    assert np.abs(y_alias[core]).max() < 1e-4

    # unit DC gain in both directions
    const = np.ones(32000, np.float32)
    down = kaiser_best_resample(const, sr_out, sr_in)
    up = kaiser_best_resample(const, sr_in, sr_out)
    np.testing.assert_allclose(down[100:-100], 1.0, atol=1e-4)
    # upsampling carries the polyphase interpolation ripple of a finite
    # filter (~7e-4 here — same order as resampy's kaiser_best)
    np.testing.assert_allclose(up[100:-100], 1.0, atol=2e-3)


def test_load_audio_wav_librosa_semantics(tmp_path):
    """.wav ingest follows librosa.load semantics: int PCM scaled to
    [-1, 1], stereo averaged to mono, resampled to 16 kHz
    (ref create_wav2vec.py:74)."""
    from scipy.io import wavfile

    from transformer_clip_eeg_tpu.preprocess.wav2vec import load_audio

    sr_in = 32000
    t = np.arange(sr_in) / sr_in
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([left, right], axis=1)
    pcm = (stereo * 32767).astype(np.int16)
    path = str(tmp_path / "tone.wav")
    wavfile.write(path, sr_in, pcm)

    y = load_audio(path, sr=16000)
    assert y.shape[0] == 16000
    t16 = np.arange(16000) / 16000
    ideal = 0.375 * np.sin(2 * np.pi * 440 * t16)  # channel mean
    core = slice(500, 15500)
    err = np.linalg.norm(y[core] - ideal[core]) / np.linalg.norm(ideal[core])
    assert err < 1e-3, err


def test_bf16_extraction_close_to_f32(tiny):
    """--dtype bfloat16 extraction: features come back float32 and stay close
    to the f32 path (params stay f32; compute dtype only)."""
    import jax.numpy as jnp

    _, model, variables = tiny
    bf16_model = Wav2Vec2Model(model.config, dtype=jnp.bfloat16)

    rng = np.random.default_rng(5)
    audio = rng.standard_normal(SR * 7).astype(np.float32) * 0.1

    kw = dict(sr=SR, frames_per_s=FRAMES_PER_S)
    f32 = Wav2Vec2FeatureExtractor(model, variables, [2], **kw)
    bf16 = Wav2Vec2FeatureExtractor(bf16_model, variables, [2], **kw)

    out_f32 = f32.get_hidden_output(audio, overlap=2, segment_length=4)[2]
    out_bf16 = bf16.get_hidden_output(audio, overlap=2, segment_length=4)[2]
    assert out_bf16.dtype == np.float32
    assert out_bf16.shape == out_f32.shape
    scale = np.abs(out_f32).mean()
    assert np.abs(out_bf16 - out_f32).mean() < 0.05 * scale


def test_max_chunk_batch_slicing_exact(tiny):
    """Bounding the per-dispatch chunk batch (HBM guard for long stories,
    SCALE.md) must not change the features: a 10-chunk story extracted in
    padded slabs of 4 matches the unbounded single-batch path exactly."""
    _, model, variables = tiny
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(SR * 21 + 17).astype(np.float32)

    unbounded = Wav2Vec2FeatureExtractor(
        model, variables, layers=(1, 3), sr=SR, frames_per_s=FRAMES_PER_S,
        max_chunk_batch=None,
    )
    sliced = Wav2Vec2FeatureExtractor(
        model, variables, layers=(1, 3), sr=SR, frames_per_s=FRAMES_PER_S,
        max_chunk_batch=4,
    )
    ref = unbounded.get_hidden_output(audio, overlap=2, segment_length=2)
    got = sliced.get_hidden_output(audio, overlap=2, segment_length=2)
    for layer in (1, 3):
        assert got[layer].shape == ref[layer].shape
        np.testing.assert_allclose(got[layer], ref[layer], atol=1e-6)


def test_split_programs_extraction_exact(tiny):
    """split_programs=True (conv frontend + encoder as two jitted
    programs — for remote-compile services that cap program size) must
    produce byte-close features vs the fused forward, including the
    scanned-encoder production combination."""
    from transformer_clip_eeg_tpu.models.wav2vec2 import (
        Wav2Vec2Model as _M,
        stack_encoder_layers,
    )

    _, model, variables = tiny
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(SR * 5 + 11).astype(np.float32)

    fused = Wav2Vec2FeatureExtractor(
        model, variables, layers=(2,), sr=SR, frames_per_s=FRAMES_PER_S,
    )
    split = Wav2Vec2FeatureExtractor(
        model, variables, layers=(2,), sr=SR, frames_per_s=FRAMES_PER_S,
        split_programs=True,
    )
    # and the production combination: split + scanned encoder + sliced
    # stacked params
    scan_model = _M(model.config, scan_layers=True)
    scan_vars = stack_encoder_layers(
        variables, 2, model.config.num_hidden_layers
    )
    split_scan = Wav2Vec2FeatureExtractor(
        scan_model, scan_vars, layers=(2,), sr=SR,
        frames_per_s=FRAMES_PER_S, split_programs=True,
    )

    ref = fused.get_hidden_output(audio, overlap=2, segment_length=2)[2]
    for variant in (split, split_scan):
        got = variant.get_hidden_output(audio, overlap=2, segment_length=2)[2]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
