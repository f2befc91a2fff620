"""LSTM recurrence as Pallas TPU kernels (fwd + hand-derived BPTT bwd).

The reference's default speech encoder runs two biLSTMs over 192 steps
(ref ``clip_model.py:267-268,322-324``).  Under XLA the recurrence lowers to
a ``lax.scan`` whose per-step overhead dominates — each step is one tiny
``[B, H] @ [H, 4H]`` matmul.  Here the whole recurrence runs inside Pallas:
the grid walks time chunks sequentially, the hidden/cell state lives in VMEM
scratch that persists across grid iterations, and each step is one MXU
matmul plus VPU gate math — no per-step dispatch, no HBM round-trips for
state.

The input projection ``x @ W_ih + b`` stays outside (one big MXU matmul over
all timesteps, see ``ops/lstm.py``); the kernel consumes the precomputed
gate inputs ``xw [T, D, B, 4H]`` where ``D`` packs several *independent
recurrences* (each with its own ``whh``) into one ``pallas_call`` on a
direction-major batch-tile grid axis.  NOTE: grid steps execute
sequentially on a TPU core, so D>1 saves kernel-launch overhead only, not
sequential recurrence steps — production callers (``ops/lstm.py``) use the
D=1 wrapper per direction, which measured fastest (see the block-diagonal
packing note there for the alternative that was tried and rejected).

Backward is textbook BPTT, also time-chunked in reverse: gate activations
are recomputed from (xw, h_prev) — only ``h`` and ``c`` sequences (the
forward outputs) are saved — with ``dWhh`` accumulated across the
sequential grid.  Gradient parity vs ``jax.vjp`` of the lax.scan path is
verified in tests.
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

CHUNK = 8  # timesteps per grid program
BATCH_TILE = 128  # cap on batch rows per grid program
_VMEM_BUDGET = 29 * 2**19  # 14.5 MiB headroom for the bwd kernel (16 MiB
                           # scoped limit minus pipeline overheads)


def _batch_tile(hidden: int) -> int:
    """Largest batch tile whose backward-kernel VMEM blocks fit the budget.

    Per grid step the bwd kernel holds ~13·hidden lanes per batch row per
    timestep (xw + dxw at 4H each, five state/grad blocks at H), double
    buffered, f32; plus the whh/dwhh weight blocks and h/c scratch."""
    per_row = CHUNK * hidden * 13 * 4 * 2
    weights = 2 * hidden * 4 * hidden * 4  # whh + dwhh, constant-resident
    bt = min(BATCH_TILE, max((_VMEM_BUDGET - weights) // per_row, 8))
    return (bt // 8) * 8 if bt >= 8 else bt


def _gates(pre, h):
    i = jax.nn.sigmoid(pre[:, :h])
    f = jax.nn.sigmoid(pre[:, h: 2 * h])
    g = jnp.tanh(pre[:, 2 * h: 3 * h])
    o = jax.nn.sigmoid(pre[:, 3 * h:])
    return i, f, g, o


def _fwd_kernel(xw_ref, whh_ref, h_out_ref, c_out_ref, h_scr, c_scr, *,
                hidden):
    gi = pl.program_id(1)  # time-chunk index (batch tile is the outer dim)

    @pl.when(gi == 0)
    def _init():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    whh = whh_ref[0]  # [H, 4H]: this batch tile's direction

    def step(t, _):
        pre = xw_ref[t] + jnp.dot(
            h_scr[...], whh, preferred_element_type=jnp.float32
        )
        i, f, g, o = _gates(pre, hidden)
        c = f * c_scr[...] + i * g
        h = o * jnp.tanh(c)
        h_scr[...] = h
        c_scr[...] = c
        h_out_ref[t] = h
        c_out_ref[t] = c
        return 0

    lax.fori_loop(0, xw_ref.shape[0], step, 0)


def _bwd_kernel(
    xw_ref, whh_ref, h_ref, c_ref, h_prev_ref, c_prev_ref, g_ref,
    dxw_ref, dwhh_ref, dh_scr, dc_scr, *, hidden, tiles_per_dir,
):
    bi = pl.program_id(0)  # direction-major batch tile (outer)
    gi = pl.program_id(1)  # reversed time chunk (inner)

    @pl.when(gi == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    # zero this direction's dwhh block at its first tile (tiles of one
    # direction are contiguous in bi, so the block stays VMEM-resident
    # across its accumulation window)
    @pl.when(jnp.logical_and(bi % tiles_per_dir == 0, gi == 0))
    def _init_dw():
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)

    whh = whh_ref[0]
    ch = xw_ref.shape[0]

    def step(j, _):
        t = ch - 1 - j  # reverse within the chunk
        h_prev = h_prev_ref[t]
        c_prev = c_prev_ref[t]
        pre = xw_ref[t] + jnp.dot(
            h_prev, whh, preferred_element_type=jnp.float32
        )
        i, f, g, o = _gates(pre, hidden)
        c = c_ref[t]
        tanh_c = jnp.tanh(c)
        dh = g_ref[t] + dh_scr[...]
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_scr[...]
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dc_prev = dc * f
        dpre = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dxw_ref[t] = dpre
        dwhh_ref[0] = dwhh_ref[0] + jnp.dot(
            h_prev.T, dpre, preferred_element_type=jnp.float32
        )
        dh_scr[...] = jnp.dot(
            dpre, whh.T, preferred_element_type=jnp.float32
        )
        dc_scr[...] = dc_prev
        return 0

    lax.fori_loop(0, ch, step, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lstm_scan_pallas_packed(
    xw: Array, whh: Array, hidden: int, interpret: bool = False
) -> Array:
    """Direction-packed Pallas LSTM recurrence.

    ``xw [T, D, B, 4H]`` (precomputed input projection incl. both biases;
    ``D`` independent recurrences — e.g. forward + time-flipped reverse of a
    bidirectional layer), ``whh [D, H, 4H]`` → hidden states ``[T, D, B, H]``
    (zero initial state, torch gate order i,f,g,o).  All ``D`` recurrences
    advance within one kernel launch."""
    h_out, _ = _lstm_fwd(xw, whh, hidden, interpret)
    return h_out


def lstm_scan_pallas(
    xw: Array, whh: Array, hidden: int, interpret: bool = False
) -> Array:
    """Single-recurrence convenience wrapper: ``xw [T, B, 4H]``,
    ``whh [H, 4H]`` → ``[T, B, H]``."""
    return lstm_scan_pallas_packed(
        xw[:, None], whh[None], hidden, interpret
    )[:, 0]


def _pad_time(xw):
    t = xw.shape[0]
    pad = (-t) % CHUNK
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((pad,) + xw.shape[1:], xw.dtype)], axis=0
        )
    return xw, t


def _pad_batch(x, hidden, axis=2):
    """Pad the batch axis to a multiple of the batch tile; returns
    (padded, real_b, tile). Batches ≤ the tile stay a single tile."""
    b = x.shape[axis]
    bt = min(b, _batch_tile(hidden))
    pad = (-b) % bt
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, b, bt


def _lstm_fwd(xw, whh, hidden, interpret):
    xw32 = xw.astype(jnp.float32)  # [T, D, B, 4H]
    whh32 = whh.astype(jnp.float32)  # [D, H, 4H]
    xw_p, t_real = _pad_time(xw32)
    xw_p, b_real, bt = _pad_batch(xw_p, hidden)
    t, d, bp, g4 = xw_p.shape
    tiles_per_dir = bp // bt
    xw_flat = xw_p.reshape(t, d * bp, g4)  # direction-major batch rows
    grid = (d * tiles_per_dir, t // CHUNK)  # tiles outer, time inner
    kernel = functools.partial(_fwd_kernel, hidden=hidden)
    whh_spec = pl.BlockSpec(
        (1, hidden, g4), lambda bi, ti: (bi // tiles_per_dir, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_all, c_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK, bt, g4), lambda bi, ti: (ti, bi, 0),
                         memory_space=pltpu.VMEM),
            whh_spec,
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, bt, hidden), lambda bi, ti: (ti, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, bt, hidden), lambda bi, ti: (ti, bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, d * bp, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, d * bp, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), jnp.float32),
            pltpu.VMEM((bt, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xw_flat, whh32)
    h_out = (
        h_all[:t_real]
        .reshape(t_real, d, bp, hidden)[:, :, :b_real]
        .astype(xw.dtype)
    )
    # zero-size dtype carriers: plain dtypes are not valid residual leaves
    dt_x = jnp.zeros((0,), xw.dtype)
    dt_w = jnp.zeros((0,), whh.dtype)
    return h_out, (xw32, whh32, h_all, c_all, t_real, dt_x, dt_w)


def _lstm_fwd_vjp(xw, whh, hidden, interpret):
    h_out, res = _lstm_fwd(xw, whh, hidden, interpret)
    return h_out, res


def _lstm_bwd(hidden, interpret, res, g):
    xw32, whh32, h_all, c_all, t_real, dt_x, dt_w = res
    xw_dtype, whh_dtype = dt_x.dtype, dt_w.dtype
    t = h_all.shape[0]
    d = whh32.shape[0]
    bp = h_all.shape[1] // d  # per-direction padded batch
    b_real = g.shape[2]
    g4 = xw32.shape[-1]
    g_p = jnp.zeros((t, d, bp, hidden), jnp.float32)
    g_p = g_p.at[:t_real, :, :b_real].set(g.astype(jnp.float32))
    g_p = g_p.reshape(t, d * bp, hidden)
    xw_p, _ = _pad_time(xw32)
    xw_p, _, bt = _pad_batch(xw_p, hidden)
    xw_flat = xw_p.reshape(t, d * bp, g4)
    tiles_per_dir = bp // bt
    # previous-step state sequences (zero at t=0)
    zeros1 = jnp.zeros((1, d * bp, hidden), jnp.float32)
    h_prev = jnp.concatenate([zeros1, h_all[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros1, c_all[:-1]], axis=0)

    n_chunks = t // CHUNK
    grid = (d * tiles_per_dir, n_chunks)
    rev = lambda bi, ti: (n_chunks - 1 - ti, bi, 0)  # chunks in reverse
    kernel = functools.partial(
        _bwd_kernel, hidden=hidden, tiles_per_dir=tiles_per_dir
    )
    blk = lambda w: pl.BlockSpec((CHUNK, bt, w), rev, memory_space=pltpu.VMEM)
    dir_spec = pl.BlockSpec(
        (1, hidden, g4), lambda bi, ti: (bi // tiles_per_dir, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dxw, dwhh = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk(g4),  # xw
            dir_spec,  # whh
            blk(hidden),  # h
            blk(hidden),  # c
            blk(hidden),  # h_prev
            blk(hidden),  # c_prev
            blk(hidden),  # g
        ],
        out_specs=[
            blk(g4),  # dxw
            dir_spec,  # dwhh (accumulated per direction)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, d * bp, g4), jnp.float32),
            jax.ShapeDtypeStruct((d, hidden, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), jnp.float32),
            pltpu.VMEM((bt, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xw_flat, whh32, h_all, c_all, h_prev, c_prev, g_p)
    dxw = dxw[:t_real].reshape(t_real, d, bp, g4)[:, :, :b_real]
    # custom_vjp requires cotangents to match the primal avals (dtype too):
    # bf16 primals must get bf16 cotangents even though BPTT runs in f32
    return dxw.astype(xw_dtype), dwhh.astype(whh_dtype)


lstm_scan_pallas_packed.defvjp(_lstm_fwd_vjp, _lstm_bwd)
