"""Fused transformer encoder block as Pallas TPU kernels (fwd + custom bwd).

The flagship EEG encoder runs 10 pre-LN blocks over tiny shapes
(T=192 tokens, E=64 features, 8 heads → head_dim 8; ref
``clip_model.py:75-99``).  At these sizes XLA spends most of the time on
layout changes and HBM round-trips between the many small ops — measured
~1.2 ms/block forward and ~3.5 ms/block backward at batch 128 on one chip.
This kernel computes the entire block — LN → QKV → per-head attention with
the reference's ``emb_size**0.5`` scaling quirk → projection → residual →
LN → FFN(×4, exact GELU) → residual — in one VMEM-resident program per batch
tile, with a hand-derived backward that recomputes activations in-kernel
(flash-style; only the block input is saved) and accumulates weight
gradients across the sequential grid.

Dropout (attention probs, attention output, FFN inner, FFN output — ref
``clip_model.py:30-45,60-67,75-94``) is generated with the in-kernel TPU
PRNG from a per-call seed; the backward reseeds identically and regenerates
the same masks, so no mask is ever materialized in HBM.

Numerics: all math in f32 in VMEM (inputs may be bf16).  Forward and
gradient parity vs the XLA path is verified in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# params tuple layout (16 arrays, all f32):
#   g1 [E], be1 [E],                      LN1 scale/bias
#   wq [E,E], wk [E,E], wv [E,E],         QKV projection weights
#   bq [E], bk [E], bv [E],               QKV biases
#   wo [E,E], bo [E],                     attention output projection
#   g2 [E], be2 [E],                      LN2 scale/bias
#   w1 [E,F], bb1 [F], w2 [F,E], bb2 [E]  FFN
N_PARAMS = 16


def _layernorm_fwd(x, g, b, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = lax.rsqrt(var + eps)
    y = (x - mean) * inv
    return y * g + b, y, inv


def _layernorm_bwd(dout, y, inv, g):
    gh = dout * g
    dx = (
        gh
        - jnp.mean(gh, axis=-1, keepdims=True)
        - y * jnp.mean(gh * y, axis=-1, keepdims=True)
    ) * inv
    dg = jnp.sum(dout * y, axis=tuple(range(dout.ndim - 1)))
    db = jnp.sum(dout, axis=tuple(range(dout.ndim - 1)))
    return dx, dg, db


def _erf(x):
    """erf with no Mosaic-unsupported primitives (Abramowitz–Stegun 7.1.26,
    |err| ≤ 1.5e-7 — below f32 resolution for GELU purposes)."""
    a1, a2, a3 = np.float32(0.254829592), np.float32(-0.284496736), np.float32(1.421413741)
    a4, a5, p = np.float32(-1.453152027), np.float32(1.061405429), np.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return s * y


def _gelu(x):
    # exact-erf GELU (jax.nn.gelu's erf/erfc paths have no Mosaic lowering)
    return x * 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _gelu_grad(x):
    cdf = 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * x * x) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return cdf + x * pdf


def _linear_index_u32(shape):
    """uint32 linear element index, any rank ≥ 2 (TPU needs ≥2-D iota)."""
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for dim in range(len(shape) - 1, -1, -1):
        idx = idx + lax.broadcasted_iota(jnp.uint32, shape, dim) * np.uint32(
            stride
        )
        stride *= shape[dim]
    return idx


def _dropout_mask(seed_base, mask_id, shape, drop_p, use_prng=True):
    """In-kernel dropout multiplier (0 or 1/keep).

    Every mask is seeded independently from (per-call seed, program id,
    mask id), so forward and backward regenerate identical masks on demand
    in any order without materializing anything in HBM.

    ``use_prng=False`` (interpret mode — the CPU interpreter's
    ``prng_random_bits`` returns zeros) derives bits from a murmur-style
    integer hash of the element index instead; identical in fwd/bwd by
    construction."""
    threshold = np.uint32(int(drop_p * (2 ** 32)))
    if use_prng:
        pltpu.prng_seed(seed_base + mask_id)
        bits = pltpu.prng_random_bits(shape)
    else:
        key = (seed_base + mask_id).astype(jnp.uint32)
        h = _linear_index_u32(shape) + key * np.uint32(0x9E3779B9)
        h = (h ^ (h >> 16)) * np.uint32(0x85EBCA6B)
        h = (h ^ (h >> 13)) * np.uint32(0xC2B2AE35)
        bits = h ^ (h >> 16)
    keep = bits >= threshold
    return jnp.where(keep, np.float32(1.0 / (1.0 - drop_p)), np.float32(0.0))


# mask ids: 0..h-1 = per-head attention, h = attn-out, h+1 = ffn-inner,
# h+2 = ffn-out
def _mask_cfg(seed_base, h, drop_p, ffn_drop_p, training, use_prng=True):
    if not training or (drop_p <= 0.0 and ffn_drop_p <= 0.0):
        return None
    return dict(
        seed_base=seed_base, h=h, drop_p=drop_p, ffn_drop_p=ffn_drop_p,
        use_prng=use_prng,
    )


def _mm(a, b, mm_dtype):
    """2-D matmul with operands cast to the compute dtype.

    ``mm_dtype='bfloat16'`` runs the MXU's native single-pass bf16 mode
    (f32 operands lower to multi-pass split-bf16); accumulation stays f32
    via ``preferred_element_type``.  ``None`` keeps exact-f32 operands —
    the parity-tested default."""
    if mm_dtype is not None:
        dt = jnp.dtype(mm_dtype)
        a, b = a.astype(dt), b.astype(dt)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_general(a, b, dims, mm_dtype):
    """dot_general twin of :func:`_mm`."""
    if mm_dtype is not None:
        dt = jnp.dtype(mm_dtype)
        a, b = a.astype(dt), b.astype(dt)
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _head_mask(e, num_heads, hh):
    """[1, 1, E] 0/1 mask selecting head ``hh``'s feature columns
    (``hh`` may be traced — used inside fori_loop).

    Heads are realized as full-width masked matmuls: with head_dim 8 the MXU
    would run at 8/128 contraction depth on sliced operands, and Mosaic has
    no lowering for the 4-D head reshape anyway — masking the unused columns
    keeps every tensor [TB, T, E]/[TB, T, T] and every contraction 64-deep,
    at identical MXU occupancy."""
    d = e // num_heads
    col = lax.broadcasted_iota(jnp.int32, (1, 1, e), 2)
    return jnp.where(
        (col >= hh * d) & (col < (hh + 1) * d), np.float32(1.0), np.float32(0.0)
    )


def _attn_probs(q, k, mh, scale, mm_dtype=None):
    """Clean (pre-dropout) attention probabilities for one head."""
    s = _mm_general(
        q * mh, k, (((2,), (2,)), ((0,), (0,))), mm_dtype
    ) * np.float32(1.0 / scale)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    es = jnp.exp(s)
    return es / jnp.sum(es, axis=-1, keepdims=True)


def _forward_core(x, params, masks, num_heads, scale, probs_scr=None,
                  mm_dtype=None):
    """Block forward; returns (out, residuals).

    Attention probabilities are not returned as residuals between the
    forward and backward *kernels* (8 heads of [B, T, T] in HBM per block
    would cost more bandwidth than the recompute).  Within the backward
    kernel, though, they are computed once here and — when ``probs_scr``
    (a VMEM scratch [H·TB, T, T]) is passed — stashed per head so the
    gradient head-loop reads them back instead of redoing the score matmul
    and softmax a second time."""
    (g1, be1, wq, wk, wv, bq, bk, bv, wo, bo,
     g2, be2, w1, bb1, w2, bb2) = params
    tb, t, e = x.shape
    h = num_heads

    y1a, y1, inv1 = _layernorm_fwd(x, g1, be1)
    y1f = y1a.reshape(tb * t, e)
    q = (_mm(y1f, wq, mm_dtype) + bq).reshape(tb, t, e)
    k = (_mm(y1f, wk, mm_dtype) + bk).reshape(tb, t, e)
    v = (_mm(y1f, wv, mm_dtype) + bv).reshape(tb, t, e)

    def head_body(hh, ctx):
        mh = _head_mask(e, h, hh)
        p = _attn_probs(q, k, mh, scale, mm_dtype)
        if probs_scr is not None:
            probs_scr[pl.ds(hh * tb, tb), :, :] = p
        if masks and masks["drop_p"] > 0.0:
            p = p * _dropout_mask(
                masks["seed_base"], hh, (tb, t, t), masks["drop_p"],
                masks["use_prng"],
            )
        return ctx + _mm_general(
            p, v * mh, (((2,), (1,)), ((0,), (0,))), mm_dtype
        )

    ctx = lax.fori_loop(0, h, head_body, jnp.zeros((tb, t, e), jnp.float32))
    ctx = ctx.reshape(tb * t, e)
    a = _mm(ctx, wo, mm_dtype) + bo
    if masks and masks["drop_p"] > 0.0:
        a = a * _dropout_mask(masks["seed_base"], h, (tb * t, e),
                              masks["drop_p"], masks["use_prng"])
    x1 = x + a.reshape(tb, t, e)

    y2a, y2, inv2 = _layernorm_fwd(x1, g2, be2)
    f1 = _mm(y2a.reshape(tb * t, e), w1, mm_dtype) + bb1
    gl = _gelu(f1)
    if masks and masks["ffn_drop_p"] > 0.0:
        gl_d = gl * _dropout_mask(
            masks["seed_base"], h + 1, gl.shape, masks["ffn_drop_p"],
            masks["use_prng"],
        )
    else:
        gl_d = gl
    f2 = _mm(gl_d, w2, mm_dtype) + bb2
    if masks and masks["drop_p"] > 0.0:
        f2 = f2 * _dropout_mask(masks["seed_base"], h + 2, (tb * t, e),
                                masks["drop_p"], masks["use_prng"])
    out = x1 + f2.reshape(tb, t, e)
    residuals = dict(
        y1=y1, inv1=inv1, y1a=y1a, q=q, k=k, v=v, ctx=ctx,
        y2=y2, inv2=inv2, y2a=y2a, f1=f1, gl_d=gl_d,
    )
    return out, residuals


def _fwd_kernel(seed_ref, x_ref, *refs,
                drop_p, ffn_drop_p, num_heads, scale, training, ffn_dim,
                use_prng, mm_dtype=None):
    param_refs = refs[:N_PARAMS]
    out_ref = refs[N_PARAMS]
    x = x_ref[:].astype(jnp.float32)
    params = tuple(r[:].astype(jnp.float32) for r in param_refs)
    seed_base = (seed_ref[0] + pl.program_id(0)) * np.int32(8191)
    masks = _mask_cfg(seed_base, num_heads, drop_p, ffn_drop_p, training,
                      use_prng)
    out, _ = _forward_core(x, params, masks, num_heads, scale,
                           mm_dtype=mm_dtype)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, *refs,
                drop_p, ffn_drop_p, num_heads, scale, training, ffn_dim,
                use_prng, mm_dtype=None):
    param_refs = refs[:N_PARAMS]
    g_ref = refs[N_PARAMS]
    dx_ref = refs[N_PARAMS + 1]
    dparam_refs = refs[N_PARAMS + 2:N_PARAMS + 2 + N_PARAMS]
    probs_scr = refs[N_PARAMS + 2 + N_PARAMS]
    i = pl.program_id(0)

    x = x_ref[:].astype(jnp.float32)
    params = tuple(r[:].astype(jnp.float32) for r in param_refs)
    (g1, be1, wq, wk, wv, bq, bk, bv, wo, bo,
     g2, be2, w1, bb1, w2, bb2) = params
    tb, t, e = x.shape
    h = num_heads

    seed_base = (seed_ref[0] + i) * np.int32(8191)  # identical to forward
    masks = _mask_cfg(seed_base, h, drop_p, ffn_drop_p, training, use_prng)
    _, res = _forward_core(x, params, masks, num_heads, scale, probs_scr,
                           mm_dtype=mm_dtype)
    g = g_ref[:].astype(jnp.float32)

    # ---- FFN branch:  out = x1 + drop2(W2 · dropf(gelu(W1 · LN2(x1))))
    dx1 = g
    df2 = g.reshape(tb * t, e)
    if masks and masks["drop_p"] > 0.0:
        df2 = df2 * _dropout_mask(seed_base, h + 2, (tb * t, e), drop_p,
                                  masks["use_prng"])
    dgl_d = _mm(df2, w2.T, mm_dtype)
    dw2 = _mm(res["gl_d"].T, df2, mm_dtype)
    dbb2 = jnp.sum(df2, axis=0)
    if masks and masks["ffn_drop_p"] > 0.0:
        dgl = dgl_d * _dropout_mask(
            seed_base, h + 1, dgl_d.shape, ffn_drop_p, masks["use_prng"]
        )
    else:
        dgl = dgl_d
    df1 = dgl * _gelu_grad(res["f1"])
    dy2a = _mm(df1, w1.T, mm_dtype)
    dw1 = _mm(res["y2a"].reshape(tb * t, e).T, df1, mm_dtype)
    dbb1 = jnp.sum(df1, axis=0)
    dx1_ln, dg2, dbe2 = _layernorm_bwd(
        dy2a.reshape(tb, t, e), res["y2"], res["inv2"], g2
    )
    dx1 = dx1 + dx1_ln

    # ---- attention branch:  x1 = x + drop1(Wo · attn)
    dx = dx1  # residual into x
    da = dx1.reshape(tb * t, e)
    if masks and masks["drop_p"] > 0.0:
        da = da * _dropout_mask(seed_base, h, (tb * t, e), drop_p,
                                masks["use_prng"])
    dctx = _mm(da, wo.T, mm_dtype)
    dwo = _mm(res["ctx"].T, da, mm_dtype)
    dbo = jnp.sum(da, axis=0)
    dctx3 = dctx.reshape(tb, t, e)

    # same head-masked full-width structure as forward:
    #   S_h = (Q⊙m_h) Kᵀ ;  C = Σ_h P̃_h (V⊙m_h)
    def bwd_head_body(hh, carry):
        dq3, dk3, dv3 = carry
        mh = _head_mask(e, h, hh)
        p_clean = probs_scr[pl.ds(hh * tb, tb), :, :]
        if masks and masks["drop_p"] > 0.0:
            mask_h = _dropout_mask(seed_base, hh, (tb, t, t), drop_p,
                                   masks["use_prng"])
            p_used = p_clean * mask_h
        else:
            mask_h = None
            p_used = p_clean
        dp = _mm_general(
            dctx3, res["v"] * mh, (((2,), (2,)), ((0,), (0,))), mm_dtype
        )
        dv3 = dv3 + mh * _mm_general(
            p_used, dctx3, (((1,), (1,)), ((0,), (0,))), mm_dtype
        )
        if mask_h is not None:
            dp = dp * mask_h
        ds = p_clean * (dp - jnp.sum(dp * p_clean, axis=-1, keepdims=True))
        ds = ds * np.float32(1.0 / scale)
        dq3 = dq3 + mh * _mm_general(
            ds, res["k"], (((2,), (1,)), ((0,), (0,))), mm_dtype
        )
        dk3 = dk3 + _mm_general(
            ds, res["q"] * mh, (((1,), (1,)), ((0,), (0,))), mm_dtype
        )
        return dq3, dk3, dv3

    zeros3 = jnp.zeros((tb, t, e), jnp.float32)
    dq3, dk3, dv3 = lax.fori_loop(
        0, h, bwd_head_body, (zeros3, zeros3, zeros3)
    )

    dqf = dq3.reshape(tb * t, e)
    dkf = dk3.reshape(tb * t, e)
    dvf = dv3.reshape(tb * t, e)
    y1af = res["y1a"].reshape(tb * t, e)
    dwq = _mm(y1af.T, dqf, mm_dtype)
    dwk = _mm(y1af.T, dkf, mm_dtype)
    dwv = _mm(y1af.T, dvf, mm_dtype)
    dbq = jnp.sum(dqf, axis=0)
    dbk = jnp.sum(dkf, axis=0)
    dbv = jnp.sum(dvf, axis=0)
    dy1a = (
        _mm(dqf, wq.T, mm_dtype)
        + _mm(dkf, wk.T, mm_dtype)
        + _mm(dvf, wv.T, mm_dtype)
    )
    dx_ln, dg1, dbe1 = _layernorm_bwd(
        dy1a.reshape(tb, t, e), res["y1"], res["inv1"], g1
    )
    dx = dx + dx_ln

    dx_ref[:] = dx.astype(dx_ref.dtype)
    dparams = (dg1, dbe1, dwq, dwk, dwv, dbq, dbk, dbv, dwo, dbo,
               dg2, dbe2, dw1, dbb1, dw2, dbb2)

    @pl.when(i == 0)
    def _init():
        for r, dp_ in zip(dparam_refs, dparams):
            r[...] = dp_

    @pl.when(i > 0)
    def _acc():
        for r, dp_ in zip(dparam_refs, dparams):
            r[...] = r[...] + dp_


def _pick_tile(b: int) -> int:
    # TB=8 measures fastest (TB=16 adds VMEM pressure and loses ~8%)
    for tb in (8, 4, 2):
        if b % tb == 0:
            return tb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_transformer_block(
    x: Array,
    params: Tuple[Array, ...],
    seed: Array,
    drop_p: float,
    ffn_drop_p: float,
    num_heads: int,
    scale: float,
    training: bool,
    interpret: bool = False,
    mm_dtype=None,
) -> Array:
    """Fused pre-LN transformer block.  ``x`` [B, T, E] → [B, T, E].

    ``params``: the 16-tuple documented at the top of this module.
    ``seed``: float32 scalar array — dropout stream id (cast to int32
    internally; ignored when ``training=False`` or both drop rates are 0).
    ``mm_dtype``: 'bfloat16' runs every matmul (fwd and bwd) on MXU-native
    bf16 operands with f32 accumulation — the --compute_dtype fast mode;
    None (default) keeps the exact-f32 parity numerics.
    """
    out, _ = _fused_block_fwd(
        x, params, seed, drop_p, ffn_drop_p, num_heads, scale, training,
        interpret, mm_dtype,
    )
    return out


def _block_grid_specs(params, tb, t, e):
    # index maps take the scalar-prefetch ref as a trailing argument
    x_spec = pl.BlockSpec((tb, t, e), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params]
    return x_spec, param_specs


def _fused_block_fwd(
    x, params, seed, drop_p, ffn_drop_p, num_heads, scale, training,
    interpret, mm_dtype=None,
):
    b, t, e = x.shape
    ffn_dim = params[13].shape[0]
    tb = _pick_tile(b)
    x_spec, param_specs = _block_grid_specs(params, tb, t, e)
    kernel = functools.partial(
        _fwd_kernel, drop_p=drop_p, ffn_drop_p=ffn_drop_p,
        num_heads=num_heads, scale=scale, training=training, ffn_dim=ffn_dim,
        use_prng=not interpret, mm_dtype=mm_dtype,
    )
    seed_i = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // tb,),
            in_specs=[x_spec, *param_specs],
            out_specs=x_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, e), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed_i, x, *params)
    return out, (x, params, seed_i)


def _fused_block_bwd(
    drop_p, ffn_drop_p, num_heads, scale, training, interpret, mm_dtype,
    residuals, g
):
    x, params, seed_i = residuals
    b, t, e = x.shape
    ffn_dim = params[13].shape[0]
    tb = _pick_tile(b)
    x_spec, param_specs = _block_grid_specs(params, tb, t, e)
    kernel = functools.partial(
        _bwd_kernel, drop_p=drop_p, ffn_drop_p=ffn_drop_p,
        num_heads=num_heads, scale=scale, training=training, ffn_dim=ffn_dim,
        use_prng=not interpret, mm_dtype=mm_dtype,
    )
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    dparam_specs = [
        pl.BlockSpec(
            p.shape,
            (lambda n: (lambda i, *_: (0,) * n))(p.ndim),
            memory_space=pltpu.VMEM,
        )
        for p in params
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // tb,),
            in_specs=[x_spec, *param_specs, x_spec],
            out_specs=[x_spec, *dparam_specs],
            # per-head probability stash: computed once in the in-kernel
            # recompute, read back by the gradient head-loop (9.4 MB at
            # TB=8/T=192/H=8 — cheaper than redoing 8 score matmuls
            # + softmaxes)
            scratch_shapes=[
                pltpu.VMEM((num_heads * tb, t, t), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, t, e), x.dtype), *dparam_shapes],
        # the recompute-everything backward peaks ~17 MB at TB=8 before the
        # probability stash; the default 16 MB scoped limit is conservative
        # for v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed_i, x, *params, g)
    dx = outs[0]
    dparams = tuple(
        dp.astype(p.dtype) for dp, p in zip(outs[1:], params)
    )
    return dx, dparams, jnp.zeros((), jnp.float32)


fused_transformer_block.defvjp(_fused_block_fwd, _fused_block_bwd)
