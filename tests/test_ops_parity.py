"""Numerical parity of core ops against torch (CPU) references.

These tests construct small torch modules with random weights, copy the
weights into the flax modules, and assert agreement to float32 tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from transformer_clip_eeg_tpu.ops import (
    Conv1d,
    Conv2dValidTime,
    Dense,
    BatchNorm1d,
    LayerNorm,
    LayerNormTC,
    LSTM,
    MultiHeadAttention,
    TransformerEncoderBlock,
    gelu_exact,
)
from transformer_clip_eeg_tpu.ops.layers import l2_normalize


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def test_dense_matches_torch_linear(rng):
    x = rng.standard_normal((4, 7, 13)).astype(np.float32)
    lin = tnn.Linear(13, 5)
    params = {
        "params": {"kernel": t2j(lin.weight).T, "bias": t2j(lin.bias)}
    }
    out = Dense(5).apply(params, jnp.asarray(x))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    assert_close(out, ref)


@pytest.mark.parametrize("k,stride,pad,dil", [
    (64, 1, "same", 1),   # BasicBlock default (even kernel!)
    (32, 1, "same", 1),
    (9, 3, "valid", 1),
    (1, 1, "same", 1),    # spatial-mapping 1x1
    (3, 3, "valid", 1),   # Wav2vecSmallModel
    (5, 1, "same", 2),    # dilation
])
def test_conv1d_matches_torch(rng, k, stride, pad, dil):
    cin, cout, t = 6, 10, 100
    x = rng.standard_normal((2, t, cin)).astype(np.float32)
    conv = tnn.Conv1d(cin, cout, k, stride=stride, padding=pad, dilation=dil)
    params = {
        "params": {
            "kernel": t2j(conv.weight).transpose(2, 1, 0),
            "bias": t2j(conv.bias),
        }
    }
    out = Conv1d(cout, k, stride=stride, padding=pad, dilation=dil).apply(
        params, jnp.asarray(x)
    )
    # torch layout: [B, C, T]
    ref = conv(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy()
    assert_close(out, np.transpose(ref, (0, 2, 1)), atol=2e-5)


def test_conv2d_valid_time_matches_torch(rng):
    # reference pattern (clip_model.py:555-556, 574-578): Conv2d(1, F, (kT,1),
    # stride (sT,1), valid) on [B,1,T,S] then permute+reshape to [B,T',S*F]
    b, t, s, f, kt, st = 3, 192, 8, 16, 9, 3
    x = rng.standard_normal((b, t, s)).astype(np.float32)
    conv = tnn.Conv2d(1, f, (kt, 1), stride=(st, 1), padding="valid")
    params = {
        "params": {
            "kernel": t2j(conv.weight)[:, 0, :, 0].T[:, None, :],  # [kT,1,F]
            "bias": t2j(conv.bias),
        }
    }
    out = Conv2dValidTime(f, kt, st).apply(params, jnp.asarray(x))
    xt = torch.from_numpy(x)[:, None, :, :]  # [B,1,T,S]
    ref = conv(xt)  # [B,F,T',S]
    ref = ref.permute(0, 2, 1, 3).reshape(b, ref.shape[2], f * s).detach().numpy()
    assert_close(out, ref, atol=2e-5)


def test_layernorm_tc_matches_torch(rng):
    # nn.LayerNorm([C, T]) over [B, C, T] == LayerNormTC over [B, T, C]
    b, t, c = 4, 20, 6
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    ln = tnn.LayerNorm([c, t])
    with torch.no_grad():
        ln.weight.copy_(torch.randn(c, t))
        ln.bias.copy_(torch.randn(c, t))
    params = {
        "params": {"scale": t2j(ln.weight).T, "bias": t2j(ln.bias).T}
    }
    out = LayerNormTC(time_dim=t, channel_dim=c).apply(params, jnp.asarray(x))
    ref = ln(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy()
    assert_close(out, np.transpose(ref, (0, 2, 1)), atol=1e-5)


def test_batchnorm_train_and_eval_match_torch(rng):
    b, t, c = 8, 50, 7
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    bn = tnn.BatchNorm1d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.randn(c))
        bn.bias.copy_(torch.randn(c))
    variables = {
        "params": {"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
        "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
    }
    # train mode
    bn.train()
    ref = bn(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy()
    out, updated = BatchNorm1d().apply(
        variables, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"],
    )
    assert_close(out, np.transpose(ref, (0, 2, 1)), atol=1e-5)
    assert_close(updated["batch_stats"]["mean"], bn.running_mean.numpy(), atol=1e-5)
    assert_close(updated["batch_stats"]["var"], bn.running_var.numpy(), atol=1e-5)
    # eval mode with the updated stats
    bn.eval()
    ref_eval = bn(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy()
    out_eval = BatchNorm1d().apply(
        {"params": variables["params"], "batch_stats": updated["batch_stats"]},
        jnp.asarray(x), use_running_average=True,
    )
    assert_close(out_eval, np.transpose(ref_eval, (0, 2, 1)), atol=1e-5)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    assert_close(gelu_exact(jnp.asarray(x)), tF.gelu(torch.from_numpy(x)).numpy(),
                 atol=1e-6)


def test_l2_normalize_matches_torch(rng):
    x = rng.standard_normal((5, 17)).astype(np.float32)
    ref = tF.normalize(torch.from_numpy(x), p=2, dim=1).numpy()
    assert_close(l2_normalize(jnp.asarray(x), axis=1), ref, atol=1e-6)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(rng, bidirectional):
    b, t, cin, h = 3, 25, 12, 9
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    lstm = tnn.LSTM(cin, h, batch_first=True, bidirectional=bidirectional)
    p = {
        "kernel_ih": t2j(lstm.weight_ih_l0).T,
        "kernel_hh": t2j(lstm.weight_hh_l0).T,
        "bias_ih": t2j(lstm.bias_ih_l0),
        "bias_hh": t2j(lstm.bias_hh_l0),
    }
    if bidirectional:
        p.update({
            "kernel_ih_reverse": t2j(lstm.weight_ih_l0_reverse).T,
            "kernel_hh_reverse": t2j(lstm.weight_hh_l0_reverse).T,
            "bias_ih_reverse": t2j(lstm.bias_ih_l0_reverse),
            "bias_hh_reverse": t2j(lstm.bias_hh_l0_reverse),
        })
    out = LSTM(h, bidirectional=bidirectional).apply(
        {"params": p}, jnp.asarray(x)
    )
    ref, _ = lstm(torch.from_numpy(x))
    assert_close(out, ref.detach().numpy(), atol=2e-5)


def _import_reference_clip_model():
    import sys
    sys.path.insert(0, "/root/reference")
    import clip_model as ref_clip  # noqa
    return ref_clip


def _copy_mha_params(ref_mha):
    return {
        "queries": {"kernel": t2j(ref_mha.queries.weight).T,
                    "bias": t2j(ref_mha.queries.bias)},
        "keys": {"kernel": t2j(ref_mha.keys.weight).T,
                 "bias": t2j(ref_mha.keys.bias)},
        "values": {"kernel": t2j(ref_mha.values.weight).T,
                   "bias": t2j(ref_mha.values.bias)},
        "projection": {"kernel": t2j(ref_mha.projection.weight).T,
                       "bias": t2j(ref_mha.projection.bias)},
    }


def test_mha_matches_reference(rng):
    """Attention parity vs the reference implementation (eval mode),
    including the emb_size**0.5 scaling quirk (ref clip_model.py:39-40)."""
    ref_clip = _import_reference_clip_model()
    emb, heads = 64, 8
    ref_mha = ref_clip.MultiHeadAttention(emb, heads, dropout=0.0).eval()
    x = rng.standard_normal((2, 48, emb)).astype(np.float32)
    params = _copy_mha_params(ref_mha)
    out = MultiHeadAttention(emb, heads, 0.0).apply(
        {"params": params}, jnp.asarray(x)
    )
    with torch.no_grad():
        ref = ref_mha(torch.from_numpy(x)).numpy()
    assert_close(out, ref, atol=2e-5)


def test_transformer_block_matches_reference(rng):
    ref_clip = _import_reference_clip_model()
    emb = 64
    blk = ref_clip.TransformerEncoderBlock(emb).eval()
    # torch Sequential: [0]=ResidualAdd(LN, MHA, Drop), [1]=ResidualAdd(LN, FFN, Drop)
    ln1, mha = blk[0].fn[0], blk[0].fn[1]
    ln2, ffn = blk[1].fn[0], blk[1].fn[1]
    params = {
        "ln1": {"scale": t2j(ln1.weight), "bias": t2j(ln1.bias)},
        "attn": _copy_mha_params(mha),
        "ln2": {"scale": t2j(ln2.weight), "bias": t2j(ln2.bias)},
        "ffn": {
            "fc1": {"kernel": t2j(ffn[0].weight).T, "bias": t2j(ffn[0].bias)},
            "fc2": {"kernel": t2j(ffn[3].weight).T, "bias": t2j(ffn[3].bias)},
        },
    }
    x = rng.standard_normal((2, 48, emb)).astype(np.float32)
    out = TransformerEncoderBlock(emb).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = blk(torch.from_numpy(x)).numpy()
    assert_close(out, ref, atol=2e-5)
