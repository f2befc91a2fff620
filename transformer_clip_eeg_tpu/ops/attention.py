"""Transformer blocks replicating the reference's attention numerics.

Load-bearing quirk (ref ``clip_model.py:39-40``): attention logits are scaled
by ``emb_size ** 0.5`` — the *full* embedding size, not the per-head dim.
This must be replicated exactly for accuracy parity with reference
checkpoints.

Block structure (ref ``clip_model.py:75-99``): pre-LN residual blocks,
``x + Drop(MHA(LN(x)))`` then ``x + Drop(FFN(LN(x)))``, with default
``num_heads=8``, ``drop_p=0.5``, FFN expansion 4 and exact-erf GELU.

The sequence length here is tiny (192 tokens) and the embedding narrow (64),
so the win on TPU is fusing the whole block, not FlashAttention-style tiling;
a Pallas fused kernel lives in ``ops/pallas_attention.py`` and is used on TPU
backends when shapes allow, with this XLA path as the reference/fallback.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_clip_eeg_tpu.ops.layers import (
    Dense,
    Dropout,
    LayerNorm,
    gelu_exact,
    torch_uniform_init,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Parameter holders — declare exactly the param tree the XLA path creates
# (same names, shapes, inits) without running any compute, so the fused
# Pallas path shares checkpoints / torch imports with the XLA path.
# ---------------------------------------------------------------------------


class _DenseP(nn.Module):
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            torch_uniform_init(self.in_features),
            (self.in_features, self.features),
        )
        b = self.param(
            "bias", torch_uniform_init(self.in_features), (self.features,)
        )
        return k, b


class _LayerNormP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _MHAP(nn.Module):
    emb_size: int

    @nn.compact
    def __call__(self):
        e = self.emb_size
        return (
            _DenseP(e, e, name="queries")(),
            _DenseP(e, e, name="keys")(),
            _DenseP(e, e, name="values")(),
            _DenseP(e, e, name="projection")(),
        )


class _FFNP(nn.Module):
    emb_size: int
    expansion: int

    @nn.compact
    def __call__(self):
        e = self.emb_size
        return (
            _DenseP(e, self.expansion * e, name="fc1")(),
            _DenseP(self.expansion * e, e, name="fc2")(),
        )


def _pallas_default() -> bool:
    if os.environ.get("TCE_DISABLE_PALLAS", "") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


class MultiHeadAttention(nn.Module):
    """Self-attention with separate Q/K/V projections (ref clip_model.py:19-45)."""

    emb_size: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, t, e = x.shape
        h = self.num_heads
        d = e // h
        queries = Dense(e, name="queries")(x).reshape(b, t, h, d)
        keys = Dense(e, name="keys")(x).reshape(b, t, h, d)
        values = Dense(e, name="values")(x).reshape(b, t, h, d)
        # [B, H, Tq, Tk]
        energy = jnp.einsum(
            "bqhd,bkhd->bhqk", queries, keys, preferred_element_type=jnp.float32
        )
        # quirk replicated: scale by full emb_size**0.5, not per-head dim
        scaling = self.emb_size ** 0.5
        att = jax.nn.softmax(energy / scaling, axis=-1).astype(x.dtype)
        att = Dropout(self.dropout, name="att_drop")(att, deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, values).reshape(b, t, e)
        return Dense(e, name="projection")(out)


class FeedForwardBlock(nn.Module):
    """Dense(e→4e) → exact GELU → Dropout → Dense(4e→e) (ref clip_model.py:60-67)."""

    emb_size: int
    expansion: int = 4
    drop_p: float = 0.5

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Dense(self.expansion * self.emb_size, name="fc1")(x)
        x = gelu_exact(x)
        x = Dropout(self.drop_p, name="drop")(x, deterministic)
        x = Dense(self.emb_size, name="fc2")(x)
        return x


class TransformerEncoderBlock(nn.Module):
    """Pre-LN residual block (ref clip_model.py:75-94).

    On TPU the whole block runs as one fused Pallas program
    (``ops/pallas_block.py``): both LayerNorms, QKV, per-head attention,
    projection, FFN, residuals and all four dropouts in VMEM, with a
    hand-derived fused backward.  ``use_pallas=None`` auto-enables on TPU
    backends (set env ``TCE_DISABLE_PALLAS=1`` to force the XLA path);
    ``True`` forces it (interpret-mode off-TPU — for tests).  Both paths
    declare the identical parameter tree.
    """

    emb_size: int
    num_heads: int = 8
    drop_p: float = 0.5
    forward_expansion: int = 4
    forward_drop_p: float = 0.5
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        enabled = (
            _pallas_default() if self.use_pallas is None else self.use_pallas
        )
        b, t, e = x.shape
        if enabled and e % self.num_heads == 0:
            return self._pallas_path(x, deterministic)
        y = LayerNorm(name="ln1")(x)
        y = MultiHeadAttention(
            self.emb_size, self.num_heads, self.drop_p, name="attn"
        )(y, deterministic)
        y = Dropout(self.drop_p, name="drop1")(y, deterministic)
        x = x + y
        y = LayerNorm(name="ln2")(x)
        y = FeedForwardBlock(
            self.emb_size, self.forward_expansion, self.forward_drop_p, name="ffn"
        )(y, deterministic)
        y = Dropout(self.drop_p, name="drop2")(y, deterministic)
        return x + y

    def _pallas_path(self, x: Array, deterministic: bool) -> Array:
        from transformer_clip_eeg_tpu.ops.pallas_block import (
            fused_transformer_block,
        )

        e = self.emb_size
        g1, be1 = _LayerNormP(e, name="ln1")()
        (qk, qb), (kk, kb), (vk, vb), (ok, ob) = _MHAP(e, name="attn")()
        g2, be2 = _LayerNormP(e, name="ln2")()
        (w1, bb1), (w2, bb2) = _FFNP(e, self.forward_expansion, name="ffn")()
        params = (g1, be1, qk, kk, vk, qb, kb, vb, ok, ob,
                  g2, be2, w1, bb1, w2, bb2)
        training = (not deterministic) and (
            self.drop_p > 0.0 or self.forward_drop_p > 0.0
        )
        if training:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1
            ).astype(jnp.float32)
        else:
            # the seed is unused when not training, but it must CARRY THE
            # VMAP AXIS under fold-parallel eval: jax's pallas batching
            # rule only folds a vmap axis into the kernel grid when every
            # operand is batched — with a constant seed the fold-stacked
            # [F, E] params take a Squeezed block path that Mosaic rejects
            # ("last two dimensions ... divisible by 8 and 128"), observed
            # on TPU under make_fold_eval_scan_step.  Tying the zero to x
            # makes vmap batch the seed operand too.
            seed = x.reshape(-1)[0] * jnp.zeros((), jnp.float32)
        interpret = jax.default_backend() != "tpu"
        # bf16 activations (--compute_dtype bfloat16) select MXU-native
        # bf16 matmul operands inside the kernel (f32 accumulation); f32
        # activations keep the exact-f32 parity numerics
        mm_dtype = "bfloat16" if x.dtype == jnp.bfloat16 else None
        return fused_transformer_block(
            x,
            params,
            seed,
            self.drop_p,
            self.forward_drop_p,
            self.num_heads,
            self.emb_size ** 0.5,  # the reference's full-emb scaling quirk
            training,
            interpret,
            mm_dtype,
        )


class TransformerEncoder(nn.Module):
    """Stack of ``depth`` encoder blocks (ref clip_model.py:97-99)."""

    depth: int
    emb_size: int

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i in range(self.depth):
            x = TransformerEncoderBlock(self.emb_size, name=f"block_{i}")(
                x, deterministic
            )
        return x
