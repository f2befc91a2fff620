"""Micro-benchmark: per-head fori_loop attention vs head-packed batched
attention inside the fused Pallas transformer block (forward only).

The production kernel (`ops/pallas_block.py`) realizes the 8 heads as a
fori_loop of full-width masked matmuls.  PERF.md's roofline analysis says
the remaining block cost is small-op/loop overhead across the 8 iterations
(mask broadcasts, softmaxes, dropout PRNG, 2 matmuls per head), not MXU
time.  The previously-rejected "wide-scores" formulation packed heads into
the LANE dimension ([TB, T, H*T]) and lost to VMEM pressure + Mosaic's
inability to reshape-split the lane dim.  This experiment packs heads into
the BATCH (outermost) dimension instead: scores [H*TB, T, T] — the same
layout the backward's probability stash already uses — so every reduction
stays a plain last-axis rank-3 softmax and the 8 loop iterations collapse
into 2 batched matmuls + 1 softmax.

Usage: python scripts/bench_headpack.py [--batch 128] [--steps 20]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--emb", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tile", type=int, default=0, help="0 = try 8 and 4")
    args = ap.parse_args()
    tiles = [args.tile] if args.tile else [8, 4]
    for tb in tiles:
        if args.batch % tb:
            ap.error(f"--tile {tb} must divide --batch {args.batch} "
                     f"(the grid would drop {args.batch % tb} trailing rows)")

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from transformer_clip_eeg_tpu.ops.pallas_block import (
        N_PARAMS,
        _forward_core,
        _gelu,
        _layernorm_fwd,
    )

    b, t, e, h = args.batch, args.window, args.emb, args.heads
    scale = float(e) ** 0.5  # the reference's emb_size**0.5 quirk
    ffn = 4 * e
    rng = np.random.default_rng(0)

    def p(*shape):
        return jnp.asarray(
            rng.standard_normal(shape) / np.sqrt(shape[0]), jnp.float32
        )

    params = (
        jnp.ones((e,)), jnp.zeros((e,)),               # LN1
        p(e, e), p(e, e), p(e, e),                     # wq wk wv
        jnp.zeros((e,)), jnp.zeros((e,)), jnp.zeros((e,)),
        p(e, e), jnp.zeros((e,)),                      # wo bo
        jnp.ones((e,)), jnp.zeros((e,)),               # LN2
        p(e, ffn), jnp.zeros((ffn,)), p(ffn, e), jnp.zeros((e,)),
    )
    x = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)

    def packed_core(xx, prm):
        (g1, be1, wq, wk, wv, bq, bk, bv, wo, bo,
         g2, be2, w1, bb1, w2, bb2) = prm
        tb = xx.shape[0]
        d = e // h
        y1a, _, _ = _layernorm_fwd(xx, g1, be1)
        y1f = y1a.reshape(tb * t, e)
        q = (jnp.dot(y1f, wq, preferred_element_type=jnp.float32) + bq).reshape(tb, t, e)
        k = (jnp.dot(y1f, wk, preferred_element_type=jnp.float32) + bk).reshape(tb, t, e)
        v = (jnp.dot(y1f, wv, preferred_element_type=jnp.float32) + bv).reshape(tb, t, e)
        col = lax.broadcasted_iota(jnp.int32, (h, e), 1)
        hid = lax.broadcasted_iota(jnp.int32, (h, e), 0)
        mask = jnp.where(
            (col >= hid * d) & (col < (hid + 1) * d),
            np.float32(1.0), np.float32(0.0),
        )
        qp = (q[None] * mask[:, None, None, :]).reshape(h * tb, t, e)
        kp = jnp.broadcast_to(k[None], (h, tb, t, e)).reshape(h * tb, t, e)
        vp = (v[None] * mask[:, None, None, :]).reshape(h * tb, t, e)
        s = lax.dot_general(
            qp, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * np.float32(1.0 / scale)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        es = jnp.exp(s)
        pr = es / jnp.sum(es, axis=-1, keepdims=True)
        ctxp = lax.dot_general(
            pr, vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ctx = ctxp[:tb]
        for i in range(1, h):  # static slices; axis-0 rank-4 reduce may not lower
            ctx = ctx + ctxp[i * tb:(i + 1) * tb]
        ctx = ctx.reshape(tb * t, e)
        a = jnp.dot(ctx, wo, preferred_element_type=jnp.float32) + bo
        x1 = xx + a.reshape(tb, t, e)
        y2a, _, _ = _layernorm_fwd(x1, g2, be2)
        f1 = jnp.dot(
            y2a.reshape(tb * t, e), w1, preferred_element_type=jnp.float32
        ) + bb1
        gl = _gelu(f1)
        f2 = jnp.dot(gl, w2, preferred_element_type=jnp.float32) + bb2
        return x1 + f2.reshape(tb, t, e)

    def fwd_kernel_packed(x_ref, *refs):
        prm = tuple(r[:].astype(jnp.float32) for r in refs[:N_PARAMS])
        out_ref = refs[N_PARAMS]
        out_ref[:] = packed_core(x_ref[:].astype(jnp.float32), prm).astype(
            out_ref.dtype
        )

    def fwd_kernel_loop(x_ref, *refs):
        prm = tuple(r[:].astype(jnp.float32) for r in refs[:N_PARAMS])
        out_ref = refs[N_PARAMS]
        out, _ = _forward_core(
            x_ref[:].astype(jnp.float32), prm, None, h, scale
        )
        out_ref[:] = out.astype(out_ref.dtype)

    # off-TPU the kernels only run in interpret mode (same rule as the
    # production path, ops/attention.py)
    interpret = jax.default_backend() != "tpu"

    def make(kernel, tb):
        x_spec = pl.BlockSpec((tb, t, e), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params]
        pcall = pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[x_spec, *param_specs],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, t, e), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )
        return lambda xx: pcall(xx, *params)

    def timed(fn):
        @jax.jit
        def run_n(x0, salt):
            def body(carry, i):
                y = fn(carry + (i + salt) * 1e-9)
                return y, jnp.sum(y[-1, -1])

            return lax.scan(body, x0, jnp.arange(args.steps, dtype=jnp.float32))

        _, out = run_n(x, jnp.float32(0.0))
        float(out[-1])
        t0 = time.perf_counter()
        _, out = run_n(x, jnp.float32(1.0))
        float(out[-1])
        return (time.perf_counter() - t0) / args.steps * 1000

    def chain(fn, depth):
        def run(xx):
            for _ in range(depth):
                xx = fn(xx)
            return xx

        return run

    cases = [("noop_scale", lambda xx: xx * 1.0001, None)]
    for tb in tiles:
        cases.append((f"loop_tb{tb}", make(fwd_kernel_loop, tb), None))
        cases.append((f"loop_tb{tb}_x10", chain(make(fwd_kernel_loop, tb), 10), None))
        cases.append((f"packed_tb{tb}", make(fwd_kernel_packed, tb), None))
        cases.append((f"packed_tb{tb}_x10", chain(make(fwd_kernel_packed, tb), 10), None))

    for name, fn, _ in cases:
        try:
            ms = timed(fn)
            print(json.dumps({"algo": name, "ms_fwd": round(ms, 3)}), flush=True)
        except Exception as ex:  # noqa: BLE001 — record lowering failures
            print(json.dumps({"algo": name, "error": f"{type(ex).__name__}: "
                              f"{str(ex)[:200]}"}), flush=True)

    # parity — recorded like the timing failures, not a crash (the whole
    # point of the script is the record)
    try:
        ref = np.asarray(make(fwd_kernel_loop, tiles[0])(x))
        got = np.asarray(make(fwd_kernel_packed, tiles[0])(x))
        err = float(np.abs(got - ref).max())
        print(json.dumps({"max_err_packed_vs_loop": err}), flush=True)
    except Exception as ex:  # noqa: BLE001
        print(json.dumps({"max_err_packed_vs_loop": None,
                          "error": f"{type(ex).__name__}: {str(ex)[:200]}"}),
              flush=True)


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    main()
