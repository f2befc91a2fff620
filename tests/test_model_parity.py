"""End-to-end numerical parity of encoders and CLIP heads vs the reference.

The reference package at /root/reference is imported (read-only) purely as a
test oracle: random torch weights are converted with
``utils.torch_import`` and outputs compared in eval mode.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn

sys.path.insert(0, "/root/reference")
import clip_model as ref_clip  # noqa: E402
import vlaai as ref_vlaai  # noqa: E402

from transformer_clip_eeg_tpu.models import (  # noqa: E402
    EEGConformer,
    EEGConformerInterleaved,
    EEGConvLSTM,
    EEGConvLSTMNew,
    EEGLstm,
    EEGModel,
    MelModel,
    SpeechSmallConv,
    VLAAI,
    Wav2vecSmallModel,
    CLIPSimNoLatentProj,
    CLIPSim,
    BaseMatchMismatch,
    CLIPNoContrastiveLearning,
    CLIPKLDNoLatentProj,
)
from transformer_clip_eeg_tpu.utils.torch_import import (  # noqa: E402
    convert_encoder,
    convert_head,
)

WL = 192  # 3 s × 64 Hz


def assert_close(a, b, atol=2e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def _run_pair(torch_enc, flax_enc, x, atol=2e-4):
    torch_enc.eval()
    with torch.no_grad():
        ref = torch_enc(torch.from_numpy(x)).numpy()
    variables = convert_encoder(torch_enc)
    variables = jax.tree.map(jnp.asarray, variables)
    out = flax_enc.apply(variables, jnp.asarray(x), True)
    assert_close(out, ref, atol=atol)
    return out, ref


def test_eeg_conformer_interleaved_parity(rng):
    depth = 3
    t_enc = ref_clip.EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, dropout_rate=0.2, eeg_dim=64,
        filters=(64,), kernels=(64,), time_dimension=WL, depth=depth,
    )
    j_enc = EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, dropout_rate=0.2, eeg_dim=64,
        filters=(64,), kernels=(64,), time_dimension=WL, depth=depth,
    )
    x = rng.standard_normal((2, WL, 64)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)
    assert j_enc.get_output_dim(WL) == t_enc.get_output_dim(WL) == WL * 8


def test_eeg_conformer_parity(rng):
    t_enc = ref_clip.EEGConformer(
        output_dim=8, conformer_input_dim=64, filters=(64,) * 2, kernels=(64,) * 2,
        time_dimension=WL, depth=2,
    )
    j_enc = EEGConformer(
        output_dim=8, conformer_input_dim=64, filters=(64,) * 2, kernels=(64,) * 2,
        time_dimension=WL, depth=2,
    )
    x = rng.standard_normal((2, WL, 64)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)


def test_eeg_convlstm_parity(rng):
    # default speech-encoder config (train_clip_final.py:117-128)
    t_enc = ref_clip.EEGConvLSTM(
        units_lstm=128, output_dim=8, dropout_rate=0.4, eeg_dim=1024,
        filters=(64,), kernels=(32,), input_channels=1024, time_dimension=WL,
    )
    j_enc = EEGConvLSTM(
        units_lstm=128, output_dim=8, dropout_rate=0.4, eeg_dim=1024,
        filters=(64,), kernels=(32,), time_dimension=WL,
    )
    x = rng.standard_normal((2, WL, 1024)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)
    assert j_enc.get_output_dim(WL) == t_enc.get_output_dim(WL) == WL * 8


def test_eeg_convlstm_new_parity(rng):
    t_enc = ref_clip.EEGConvLSTMNew(
        output_dim=8, eeg_dim=64, filters=(64,) * 2, kernels=(64,) * 2,
        input_channels=64, time_dimension=WL,
    )
    j_enc = EEGConvLSTMNew(
        output_dim=8, eeg_dim=64, filters=(64,) * 2, kernels=(64,) * 2,
        time_dimension=WL,
    )
    x = rng.standard_normal((2, WL, 64)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)


def test_eeg_model_parity(rng):
    t_enc = ref_clip.EEGModel(units_lstm=32, fun_act=tnn.LeakyReLU(), padding="valid")
    j_enc = EEGModel(units_lstm=32, activation="leaky_relu")
    x = rng.standard_normal((2, WL, 64)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)
    assert j_enc.get_output_dim(WL) == t_enc.get_output_dim(WL)


def test_eeg_lstm_parity(rng):
    t_enc = ref_clip.EEGLstm(speech_dim=64, units_lstm=64, spatial_filters=32)
    j_enc = EEGLstm(speech_dim=64, units_lstm=64, spatial_filters=32)
    x = rng.standard_normal((2, WL, 64)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)


def test_mel_model_parity(rng):
    t_enc = ref_clip.MelModel(
        spatial_filters=8, filters_cnn=16, kerSize_temporal=9, stride_temporal=3,
        units_lstm=32, padding="valid", activation=tnn.LeakyReLU(), speech_dim=28,
    )
    j_enc = MelModel(
        spatial_filters=8, filters_cnn=16, kernel_size_temporal=9, stride_temporal=3,
        units_lstm=32, speech_dim=28, activation="leaky_relu",
    )
    x = rng.standard_normal((2, WL, 28)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)
    assert j_enc.get_output_dim(WL) == t_enc.get_output_dim(WL)


def test_wav2vec_small_parity(rng):
    t_enc = ref_clip.Wav2vecSmallModel(spatial_filters=128, stride_temporal=3)
    j_enc = Wav2vecSmallModel(spatial_filters=128, stride_temporal=3)
    x = rng.standard_normal((2, WL, 1024)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)


def test_speech_small_conv_parity(rng):
    t_enc = ref_clip.SpeechSmallConv(
        output_dim=64, ks_temporal=16, dropout_rate=0.4, speech_dim=1024,
        time_dimension=WL,
    )
    j_enc = SpeechSmallConv(
        output_dim=64, kernel_size_temporal=16, dropout_rate=0.4, speech_dim=1024,
        time_dimension=WL,
    )
    x = rng.standard_normal((2, WL, 1024)).astype(np.float32)
    _run_pair(t_enc, j_enc, x)


def test_vlaai_parity(rng):
    t_enc = ref_vlaai.VLAAI()
    j_enc = VLAAI()  # default 320-sample time dim, same as torch default
    x = rng.standard_normal((2, 320, 64)).astype(np.float32)
    t_enc.eval()
    with torch.no_grad():
        ref = t_enc(torch.from_numpy(x)).numpy()  # [B, C, T] out
    variables = jax.tree.map(jnp.asarray, convert_encoder(t_enc))
    out = j_enc.apply(variables, jnp.asarray(x), True)  # [B, T, C] out
    assert_close(out, np.transpose(ref, (0, 2, 1)), atol=5e-4)


def _small_pair_encoders():
    """Small EEG + speech encoders (both torch and flax) for head tests."""
    t_eeg = ref_clip.EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, filters=(64,), kernels=(64,),
        time_dimension=WL, depth=1,
    )
    t_sp = ref_clip.EEGConvLSTM(
        units_lstm=16, output_dim=8, eeg_dim=40, filters=(64,), kernels=(32,),
        input_channels=40, time_dimension=WL,
    )
    j_eeg = EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, filters=(64,), kernels=(64,),
        time_dimension=WL, depth=1,
    )
    j_sp = EEGConvLSTM(
        units_lstm=16, output_dim=8, eeg_dim=40, filters=(64,), kernels=(32,),
        time_dimension=WL,
    )
    return t_eeg, t_sp, j_eeg, j_sp


def test_clip_sim_no_latent_proj_head_parity(rng):
    """Default arch end-to-end: losses AND memory-bank update must agree."""
    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    bank_size, latent_dim, bs = 40, WL * 8, 8
    t_bank = ref_clip.memoryBank(
        bank_size=bank_size, device=torch.device("cpu"), dim=latent_dim
    )
    t_head = ref_clip.CLIPSimNoLatentProj(
        t_eeg, t_sp, t_bank, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    ).eval()
    j_head = CLIPSimNoLatentProj(
        eegModel=j_eeg, speechModel=j_sp, bank_size=bank_size,
        latent_dim=latent_dim, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    )
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(bank_size, size=bs, replace=False).astype(np.int64)

    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref_ce, ref_avg, ref_total = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech), torch.from_numpy(ids)
        )
    (ce, avg, total), updates = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True, mutable=["membank"],
    )
    assert_close(ce, ref_ce.item(), atol=1e-4)
    assert_close(avg, ref_avg.item(), atol=5e-4)
    assert_close(total, ref_total.item(), atol=5e-4)
    # memory bank must have been EMA-updated identically (ref :731-745)
    assert_close(
        updates["membank"]["eegMemoryBank"]["memory"],
        t_bank.memory.numpy(),
        atol=1e-4,
    )


def test_clip_sim_head_parity(rng):
    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    bank_size, latent_dim, bs = 30, 16, 6
    t_bank = ref_clip.memoryBank(
        bank_size=bank_size, device=torch.device("cpu"), dim=latent_dim
    )
    t_head = ref_clip.CLIPSim(
        t_eeg, t_sp, t_bank, temperature=0.075, latent_dim=latent_dim,
        window_length=WL, lambda_clip=1.0, lambda_average=0.3,
    ).eval()
    j_head = CLIPSim(
        eegModel=j_eeg, speechModel=j_sp, bank_size=bank_size,
        temperature=0.075, latent_dim=latent_dim, window_length=WL,
        lambda_clip=1.0, lambda_average=0.3,
    )
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(bank_size, size=bs, replace=False).astype(np.int64)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref_ce, ref_avg, ref_total = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech), torch.from_numpy(ids)
        )
    (ce, avg, total), _ = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True, mutable=["membank"],
    )
    assert_close(ce, ref_ce.item(), atol=1e-4)
    assert_close(avg, ref_avg.item(), atol=1e-4)
    assert_close(total, ref_total.item(), atol=1e-4)


def test_base_match_mismatch_head_parity(rng):
    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    t_head = ref_clip.BaseMatchMismatch(t_eeg, t_sp, window_length=WL).eval()
    j_head = BaseMatchMismatch(eegModel=j_eeg, speechModel=j_sp, window_length=WL)
    bs = 6
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref_loss, ref_acc = t_head(torch.from_numpy(eeg), torch.from_numpy(speech))
    loss, acc = j_head.apply(variables, jnp.asarray(eeg), jnp.asarray(speech))
    assert_close(loss, ref_loss.item(), atol=1e-4)
    assert_close(acc, ref_acc.item(), atol=1e-6)


def test_no_contrastive_head_parity(rng):
    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    t_head = ref_clip.CLIPNoContrastiveLearning(t_eeg, t_sp, window_length=WL).eval()
    j_head = CLIPNoContrastiveLearning(
        eegModel=j_eeg, speechModel=j_sp, window_length=WL
    )
    bs = 6
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref = t_head(torch.from_numpy(eeg), torch.from_numpy(speech), None)
    out = j_head.apply(variables, jnp.asarray(eeg), jnp.asarray(speech))
    assert_close(out[0], ref[0].item(), atol=1e-4)


def test_clip_kld_head_parity(rng):
    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    n_classes, bs = 25, 6
    latent_dim = WL * 8
    t_head = ref_clip.CLIPKLDNoLatentProj(
        t_eeg, t_sp, latent_dimension=latent_dim, number_of_classes=n_classes,
        temperature=0.075, window_length=WL, lambda_clip=1.0,
        lambda_lower_bound=0.1,
    ).eval()
    j_head = CLIPKLDNoLatentProj(
        eegModel=j_eeg, speechModel=j_sp, latent_dimension=latent_dim,
        number_of_classes=n_classes, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_lower_bound=0.1,
    )
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(n_classes, size=bs, replace=False).astype(np.int64)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref_total, ref_ce, ref_pmu2, ref_kld = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech), torch.from_numpy(ids)
        )
    total, ce, pmu2, kldv = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids)
    )
    assert_close(total, ref_total.item(), atol=2e-4)
    assert_close(ce, ref_ce.item(), atol=1e-4)
    assert_close(pmu2, ref_pmu2.item(), atol=2e-4)
    assert_close(kldv, ref_kld.item(), atol=2e-4)


def test_clip_plain_head_parity(rng):
    """Plain symmetric InfoNCE head (ref clip_model.py:657-693)."""
    from transformer_clip_eeg_tpu.models import CLIP

    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    t_head = ref_clip.CLIP(t_eeg, t_sp, temperature=0.075).eval()
    j_head = CLIP(eegModel=j_eeg, speechModel=j_sp, temperature=0.075)
    bs = 6
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref_loss = t_head(torch.from_numpy(eeg), torch.from_numpy(speech))
    loss = j_head.apply(variables, jnp.asarray(eeg), jnp.asarray(speech))
    assert_close(loss, ref_loss.item(), atol=1e-4)


def test_clip_mp_head_parity(rng):
    """Multiple-positives head (ref clip_model.py:1000-1078): eeg batch is
    n_repeats x the speech batch."""
    from transformer_clip_eeg_tpu.models import CLIPSimMultiplePositives

    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    t_head = ref_clip.CLIPSimMultiplePositives(
        t_eeg, t_sp, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    ).eval()
    j_head = CLIPSimMultiplePositives(
        eegModel=j_eeg, speechModel=j_sp, temperature=0.075,
        window_length=WL, lambda_clip=1.0, lambda_average=0.5,
    )
    n_speech, n_repeats = 4, 2
    eeg = rng.standard_normal((n_speech * n_repeats, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((n_speech, WL, 40)).astype(np.float32)
    ids = np.arange(n_speech * n_repeats, dtype=np.int64)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech),
            torch.from_numpy(ids),
        )
    out = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True,
    )
    for a, b in zip(out, ref):
        assert_close(a, b.item(), atol=2e-4)


def test_clip_mp_adapted_head_parity(rng):
    from transformer_clip_eeg_tpu.models import CLIPSimMultiplePositivesAdapted

    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    t_head = ref_clip.CLIPSimMultiplePositivesAdapted(
        t_eeg, t_sp, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    ).eval()
    j_head = CLIPSimMultiplePositivesAdapted(
        eegModel=j_eeg, speechModel=j_sp, temperature=0.075,
        window_length=WL, lambda_clip=1.0, lambda_average=0.5,
    )
    n_speech, n_repeats = 4, 2
    eeg = rng.standard_normal((n_speech * n_repeats, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((n_speech, WL, 40)).astype(np.float32)
    ids = np.arange(n_speech * n_repeats, dtype=np.int64)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech),
            torch.from_numpy(ids),
        )
    out = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True,
    )
    for a, b in zip(out, ref):
        assert_close(a, b.item(), atol=2e-4)


def test_clip_kld_latent_proj_head_parity(rng):
    from transformer_clip_eeg_tpu.models import CLIPKLDWithLatentProj

    t_eeg, t_sp, j_eeg, j_sp = _small_pair_encoders()
    n_classes, latent = 30, 12
    t_head = ref_clip.CLIPKLDWithLatentProj(
        t_eeg, t_sp, latent_dimension=latent, number_of_classes=n_classes,
        temperature=0.075, window_length=WL, lambda_clip=1.0,
        lambda_lower_bound=0.5, lambda_discriminative=0.5,
        projection_head="linear",
    ).eval()
    j_head = CLIPKLDWithLatentProj(
        eegModel=j_eeg, speechModel=j_sp, latent_dimension=latent,
        number_of_classes=n_classes, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_lower_bound=0.5, lambda_discriminative=0.5,
        projection_head="linear",
    )
    bs = 6
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(n_classes, size=bs, replace=False).astype(np.int64)
    variables = jax.tree.map(jnp.asarray, convert_head(t_head))
    with torch.no_grad():
        ref = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech),
            torch.from_numpy(ids),
        )
    out = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True,
    )
    for a, b in zip(out, ref):
        assert_close(a, b.item(), atol=3e-4)


def test_memory_bank_multi_step_ema(rng):
    """Bank EMA over several steps with repeated ids must track torch."""
    from transformer_clip_eeg_tpu.models import MemoryBank

    bank_size, dim = 12, 6
    t_bank = ref_clip.memoryBank(
        bank_size=bank_size, device=torch.device("cpu"), dim=dim,
        momentum=0.8,
    )
    j_bank = MemoryBank(bank_size, dim, momentum=0.8)
    # .copy() is load-bearing: tensor.numpy() is a view and jnp.asarray can
    # be zero-copy on CPU — torch's in-place bank update would otherwise
    # mutate the jax array too
    variables = {
        "membank": {"memory": jnp.asarray(t_bank.memory.numpy().copy())},
        "params": {},
    }
    for step in range(4):
        ids = rng.choice(bank_size, size=5, replace=False).astype(np.int64)
        data = rng.standard_normal((5, dim)).astype(np.float32)
        with torch.no_grad():
            ref_avg = t_bank(torch.from_numpy(ids), torch.from_numpy(data))
        avg, updates = j_bank.apply(
            variables, jnp.asarray(ids), jnp.asarray(data),
            mutable=["membank"],
        )
        assert_close(avg, ref_avg.numpy(), atol=1e-5)
        variables = {"membank": updates["membank"], "params": {}}
    assert_close(
        variables["membank"]["memory"], t_bank.memory.numpy(), atol=1e-5
    )


def test_conv_block_parity(rng):
    """ConvBlock (Conv2d→BN2d→ReLU, ref clip_model.py:644-655)."""
    from transformer_clip_eeg_tpu.models import ConvBlock

    t_blk = ref_clip.ConvBlock(3, 8, kernel_size=(3, 3), stride=1, padding=0)
    t_blk.eval()
    x = rng.standard_normal((2, 3, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ref = t_blk(torch.from_numpy(x)).numpy()

    j_blk = ConvBlock(3, 8, (3, 3), padding="valid")
    variables = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(t_blk.conv.weight.detach().numpy()),
                "bias": jnp.asarray(t_blk.conv.bias.detach().numpy()),
            },
            "batchnorm": {
                "scale": jnp.asarray(t_blk.batchnorm.weight.detach().numpy()),
                "bias": jnp.asarray(t_blk.batchnorm.bias.detach().numpy()),
            },
        },
        "batch_stats": {
            "batchnorm": {
                "mean": jnp.asarray(t_blk.batchnorm.running_mean.numpy()),
                "var": jnp.asarray(t_blk.batchnorm.running_var.numpy()),
            }
        },
    }
    out = j_blk.apply(variables, jnp.asarray(x))
    assert_close(out, ref, atol=1e-5)


def test_squeeze_layer():
    """SqueezeLayer (ref clip_model.py:127-133): unit dims squeeze, others no-op."""
    from transformer_clip_eeg_tpu.models import SqueezeLayer

    x = jnp.zeros((4, 1, 7))
    assert SqueezeLayer(axis=1).apply({}, x).shape == (4, 7)
    assert SqueezeLayer(axis=2).apply({}, x).shape == (4, 1, 7)


def test_load_torch_checkpoint_roundtrip(rng, tmp_path):
    """A saved reference ``model.ckpt`` state_dict loads through
    ``load_torch_checkpoint`` and reproduces the torch losses
    (the 'checkpoint-loadable weights' parity contract,
    ref train_clip_final.py:443-449,531-540)."""
    from transformer_clip_eeg_tpu.utils.torch_import import load_torch_checkpoint

    bank_size, latent_dim, bs = 40, WL * 8, 8

    def factory():
        t_eeg, t_sp, _, _ = _small_pair_encoders()
        t_bank = ref_clip.memoryBank(
            bank_size=bank_size, device=torch.device("cpu"), dim=latent_dim
        )
        return ref_clip.CLIPSimNoLatentProj(
            t_eeg, t_sp, t_bank, temperature=0.075, window_length=WL,
            lambda_clip=1.0, lambda_average=0.5,
        )

    torch.manual_seed(7)
    t_head = factory()
    ckpt = str(tmp_path / "model.ckpt")
    torch.save(t_head.state_dict(), ckpt)

    torch.manual_seed(99)  # factory inside the loader starts from new inits
    variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(ckpt, factory))
    _, _, j_eeg, j_sp = _small_pair_encoders()
    j_head = CLIPSimNoLatentProj(
        eegModel=j_eeg, speechModel=j_sp, bank_size=bank_size,
        latent_dim=latent_dim, temperature=0.075, window_length=WL,
        lambda_clip=1.0, lambda_average=0.5,
    )
    eeg = rng.standard_normal((bs, WL, 64)).astype(np.float32)
    speech = rng.standard_normal((bs, WL, 40)).astype(np.float32)
    ids = rng.choice(bank_size, size=bs, replace=False).astype(np.int64)
    t_head.eval()
    with torch.no_grad():
        ref = t_head(
            torch.from_numpy(eeg), torch.from_numpy(speech), torch.from_numpy(ids)
        )
    out, _ = j_head.apply(
        variables, jnp.asarray(eeg), jnp.asarray(speech), jnp.asarray(ids),
        True, mutable=["membank"],
    )
    for a, b in zip(out, ref):
        assert_close(a, b.item(), atol=5e-4)
