"""Fused BasicBlock (conv → dropout → joint-[T,C] LayerNorm → GELU) in Pallas.

The reference's conv building block (ref ``clip_model.py:234-249``) appears
in every conv encoder: a same-padded Conv1d(k=64) followed by dropout, a
LayerNorm over the joint (channel, time) axes, and exact GELU.  XLA runs the
conv well but round-trips HBM between the four ops; this kernel computes the
whole block per batch tile in VMEM.

The convolution is realized as **grouped shifted matmuls**: ``TAP_GROUP``
shifted input slices are written into a VMEM scratch side-by-side on the
lane axis (Mosaic cannot lower a lane-axis *concat* of shifted slices, but
lane-sliced *stores* are fine) and contracted against the matching
``[G·C, C]`` weight slab — every matmul is ``[TB·T, G·C] @ [G·C, C]`` with a
≥512-deep contraction: im2col without materializing the full ``[T, K·C]``
tensor.

Backward recomputes the forward in-kernel (only the block input is saved):
``dX`` is the correlation with the flipped kernel (same grouped structure
over the padded upstream gradient; the flipped/transposed weight is
prepared outside the kernel) and ``dW`` accumulates ``colsᵀ · dconv``
slab-by-slab straight into the output ref across the sequential grid.
Joint-[T,C] LayerNorm statistics reduce in two stages (lanes then sublanes)
— a direct two-axis reduction to ``[TB, 1, 1]`` crashes the Mosaic layout
pass.  Dropout masks use the same independently-seeded in-kernel PRNG scheme
as ``pallas_block``.
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

from transformer_clip_eeg_tpu.ops.pallas_block import (
    _dropout_mask,
    _gelu,
    _gelu_grad,
)

Array = jax.Array

TAP_GROUP = 8


def _same_pad(k: int) -> Tuple[int, int]:
    total = k - 1
    return total // 2, total - total // 2


def _conv_taps(u, w2, t, c, k, cols_scr):
    """Grouped shifted-matmul convolution via scratch-assembled im2col.

    ``u`` [TB, T+K-1, C] (already padded), ``w2`` [K·C, C] (tap-major),
    ``cols_scr`` VMEM scratch [TB, T, G·C] → conv output [TB, T, C]."""
    tb = u.shape[0]
    gc = TAP_GROUP * c
    acc = jnp.zeros((tb * t, c), jnp.float32)
    for g0 in range(0, k, TAP_GROUP):
        g = min(TAP_GROUP, k - g0)
        for j in range(g):
            cols_scr[:, :, j * c: (j + 1) * c] = u[:, g0 + j: g0 + j + t, :]
        for j in range(g, TAP_GROUP):  # ragged final group → zero lanes
            cols_scr[:, :, j * c: (j + 1) * c] = jnp.zeros(
                (tb, t, c), jnp.float32
            )
        cols = cols_scr[...].reshape(tb * t, gc)
        slab = w2[g0 * c: (g0 + g) * c]
        if g < TAP_GROUP:
            slab = jnp.pad(slab, ((0, (TAP_GROUP - g) * c), (0, 0)))
        acc = acc + jnp.dot(cols, slab, preferred_element_type=jnp.float32)
    return acc.reshape(tb, t, c)


def _conv_taps_direct(u, w2, t, c, k):
    """Direct tap-slice convolution: one [TB·T, C] @ [C, C] dot per tap.

    No scratch assembly — each shifted input window is sliced straight out
    of the padded input and contracted against its tap's [C, C] weight slab.
    Contractions are only C(=64)-deep (vs the grouped path's 512), but the
    per-group VPU slice-copies disappear.  ``w2`` is [K·C, C] tap-major,
    as in the grouped path."""
    tb = u.shape[0]
    acc = jnp.zeros((tb * t, c), jnp.float32)
    for kk in range(k):
        acc = acc + jnp.dot(
            u[:, kk: kk + t, :].reshape(tb * t, c),
            w2[kk * c: (kk + 1) * c],
            preferred_element_type=jnp.float32,
        )
    return acc.reshape(tb, t, c)


def _lntc_fwd(x, scale, bias, eps=1e-5):
    """LayerNorm over the joint (T, C) axes per sample, affine [T, C].

    Two-stage reductions (lanes → sublanes) keep every intermediate ≤2-D —
    a direct two-axis reduce crashes the Mosaic layout pass."""
    tb, t, c = x.shape
    n = t * c
    s1 = jnp.sum(x, axis=2)  # [TB, T]
    mean = (jnp.sum(s1, axis=1, keepdims=True) / n)[:, :, None]
    d = x - mean
    v1 = jnp.sum(d * d, axis=2)
    var = (jnp.sum(v1, axis=1, keepdims=True) / n)[:, :, None]
    inv = lax.rsqrt(var + eps)
    y = d * inv
    return y * scale + bias, y, inv


def _lntc_bwd(dout, y, inv, scale):
    n = dout.shape[1] * dout.shape[2]
    gh = dout * scale
    m1 = (jnp.sum(jnp.sum(gh, axis=2), axis=1, keepdims=True) / n)[:, :, None]
    m2 = (
        jnp.sum(jnp.sum(gh * y, axis=2), axis=1, keepdims=True) / n
    )[:, :, None]
    dx = (gh - m1 - y * m2) * inv
    dscale = jnp.sum(dout * y, axis=0)
    dbias = jnp.sum(dout, axis=0)
    return dx, dscale, dbias


def _forward_core(x, w2, b, scale, bias, masks, t, c, k, cols_scr):
    lo, hi = _same_pad(k)
    u = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    conv = _conv_taps(u, w2, t, c, k, cols_scr) + b
    if masks is not None:
        conv = conv * _dropout_mask(
            masks["seed_base"], 0, (x.shape[0], t, c), masks["drop_p"],
            masks["use_prng"],
        )
    ln_aff, y, inv = _lntc_fwd(conv, scale, bias)
    out = _gelu(ln_aff)
    return out, (u, conv, ln_aff, y, inv)


def _fwd_kernel(seed_ref, x_ref, w_ref, b_ref, scale_ref, bias_ref, out_ref,
                cols_scr, *, k, drop_p, training, use_prng):
    x = x_ref[:].astype(jnp.float32)
    tb, t, c = x.shape
    masks = None
    if training and drop_p > 0.0:
        masks = dict(
            seed_base=(seed_ref[0] + pl.program_id(0)) * np.int32(7577),
            drop_p=drop_p, use_prng=use_prng,
        )
    out, _ = _forward_core(
        x, w_ref[...].astype(jnp.float32), b_ref[...].astype(jnp.float32),
        scale_ref[...].astype(jnp.float32), bias_ref[...].astype(jnp.float32),
        masks, t, c, k, cols_scr,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, w_ref, wt_ref, b_ref, scale_ref, bias_ref, g_ref,
    dx_ref, dw_ref, db_ref, dscale_ref, dbias_ref, cols_scr,
    *, k, drop_p, training, use_prng,
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    tb, t, c = x.shape
    w2 = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)
    masks = None
    if training and drop_p > 0.0:
        masks = dict(
            seed_base=(seed_ref[0] + i) * np.int32(7577),
            drop_p=drop_p, use_prng=use_prng,
        )
    _, (u, conv, ln_aff, y, inv) = _forward_core(
        x, w2, b, scale, bias, masks, t, c, k, cols_scr
    )
    g = g_ref[:].astype(jnp.float32)

    dln_aff = g * _gelu_grad(ln_aff)
    dconv, dscale, dbias = _lntc_bwd(dln_aff, y, inv, scale)
    if masks is not None:
        dconv = dconv * _dropout_mask(
            masks["seed_base"], 0, (tb, t, c), masks["drop_p"],
            masks["use_prng"],
        )
    db = jnp.sum(dconv.reshape(tb * t, c), axis=0, keepdims=True)  # [1, C]

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # dW slabs: colsᵀ · dconv, accumulated straight into the output ref
    dconv_f = dconv.reshape(tb * t, c)
    lo, hi = _same_pad(k)
    for g0 in range(0, k, TAP_GROUP):
        gsz = min(TAP_GROUP, k - g0)
        for j in range(gsz):
            cols_scr[:, :, j * c: (j + 1) * c] = u[:, g0 + j: g0 + j + t, :]
        cols = cols_scr[...].reshape(tb * t, TAP_GROUP * c)
        dw_slab = jnp.dot(cols.T, dconv_f, preferred_element_type=jnp.float32)
        dw_ref[pl.ds(g0 * c, gsz * c), :] = (
            dw_ref[pl.ds(g0 * c, gsz * c), :] + dw_slab[: gsz * c]
        )

    db_ref[...] = db_ref[...] + db
    dscale_ref[...] = dscale_ref[...] + dscale
    dbias_ref[...] = dbias_ref[...] + dbias

    # dX: grouped-taps conv of the (hi, lo)-padded dconv against the
    # tap-reversed + transposed kernel (prepared outside, wt_ref)
    dpad = jnp.pad(dconv, ((0, 0), (hi, lo), (0, 0)))
    dx = _conv_taps(dpad, wt_ref[...].astype(jnp.float32), t, c, k, cols_scr)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_tile(bsz: int) -> int:
    for tb in (8, 4, 2):
        if bsz % tb == 0:
            return tb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_basic_block(
    x: Array,
    w: Array,
    b: Array,
    scale: Array,
    bias: Array,
    seed: Array,
    kernel_size: int,
    drop_p: float,
    training: bool,
    interpret: bool = False,
) -> Array:
    """Fused conv(k, same) → dropout → LayerNorm[T,C] → GELU.

    ``x`` [B, T, C]; ``w`` [K, C_in, C_out] (square C); ``scale``/``bias``
    [T, C]; ``seed`` f32 scalar (dropout stream)."""
    out, _ = _fbb_fwd(
        x, w, b, scale, bias, seed, kernel_size, drop_p, training, interpret
    )
    return out


def _fbb_fwd(x, w, b, scale, bias, seed, kernel_size, drop_p, training,
             interpret):
    bsz, t, c = x.shape
    w2 = w.reshape(kernel_size * c, c)
    tb = _pick_tile(bsz)
    kernel = functools.partial(
        _fwd_kernel, k=kernel_size, drop_p=drop_p, training=training,
        use_prng=not interpret,
    )
    x_spec = pl.BlockSpec((tb, t, c), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_i = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz // tb,),
            in_specs=[x_spec, full, full, full, full],
            out_specs=x_spec,
            scratch_shapes=[
                pltpu.VMEM((tb, t, TAP_GROUP * c), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed_i, x, w2, b.reshape(1, c), scale, bias)
    return out, (x, w, b, scale, bias, seed_i)


def _fbb_bwd(kernel_size, drop_p, training, interpret, residuals, g):
    x, w, b, scale, bias, seed_i = residuals
    bsz, t, c = x.shape
    k = kernel_size
    w2 = w.reshape(k * c, c)
    # tap-reversed + transposed kernel for dX, prepared in XLA
    wt = jnp.flip(w, axis=0).transpose(0, 2, 1).reshape(k * c, c)
    tb = _pick_tile(bsz)
    kernel = functools.partial(
        _bwd_kernel, k=k, drop_p=drop_p, training=training,
        use_prng=not interpret,
    )
    x_spec = pl.BlockSpec((tb, t, c), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec(w2.shape, lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    dsc_spec = pl.BlockSpec(scale.shape, lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz // tb,),
            in_specs=[x_spec, full, full, full, full, full, x_spec],
            out_specs=[x_spec, dw_spec, db_spec, dsc_spec, dsc_spec],
            scratch_shapes=[
                pltpu.VMEM((tb, t, TAP_GROUP * c), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct(scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed_i, x, w2, wt, b.reshape(1, c), scale, bias, g)
    dx, dw, db, dscale, dbias = outs
    return (
        dx,
        dw.reshape(w.shape).astype(w.dtype),
        db.reshape(b.shape).astype(b.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
        jnp.zeros((), jnp.float32),
    )


fused_basic_block.defvjp(_fbb_fwd, _fbb_bwd)
