"""Micro-benchmark: Pallas conv algorithms vs XLA conv, forward only.

Flagship BasicBlock conv shape (B=128, T=192, C=64, K=64, same padding).
Compares:
  - grouped:  scratch-assembled im2col, 512-deep contractions (current
              ``pallas_conv._conv_taps``)
  - direct:   one C-deep dot per tap straight off the padded input
              (``pallas_conv._conv_taps_direct``)
  - xla:      lax.conv_general_dilated (the production default)

Scan-chained timing per PERF.md methodology (the tunneled backend makes
python-loop timing unreliable).

Usage: python scripts/bench_conv_algo.py [--batch 128] [--steps 20]
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
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--kernel", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from transformer_clip_eeg_tpu.ops.pallas_conv import (
        TAP_GROUP,
        _conv_taps,
        _conv_taps_direct,
        _pick_tile,
        _same_pad,
    )

    b, t, c, k = args.batch, args.window, args.channels, args.kernel
    tb = _pick_tile(b)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((k, c, c)) / np.sqrt(k * c), jnp.float32
    )
    w2 = w.reshape(k * c, c)
    lo, hi = _same_pad(k)

    def kernel(x_ref, w_ref, out_ref, cols_scr, *, algo):
        xx = x_ref[:].astype(jnp.float32)
        u = jnp.pad(xx, ((0, 0), (lo, hi), (0, 0)))
        if algo == "grouped":
            out = _conv_taps(u, w_ref[...], t, c, k, cols_scr)
        else:
            out = _conv_taps_direct(u, w_ref[...], t, c, k)
        out_ref[:] = out.astype(out_ref.dtype)

    def make_pallas(algo):
        x_spec = pl.BlockSpec((tb, t, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        pcall = pl.pallas_call(
            functools.partial(kernel, algo=algo),
            grid=(b // tb,),
            in_specs=[x_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, t, c), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tb, t, TAP_GROUP * c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        return lambda xx: pcall(xx, w2)

    def xla_conv(xx):
        return lax.conv_general_dilated(
            xx, w, (1,), [(lo, hi)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def timed(fn):
        # timed dispatch differs from warm-up (salt) — the tunneled backend
        # deduplicates byte-identical repeated dispatches (PERF.md)
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

    results = {}
    for name, fn in [
        ("noop_scale", lambda xx: xx * 1.0001),  # scan-step overhead floor
        ("xla", xla_conv),
        ("xla_x10", chain(xla_conv, 10)),
        ("pallas_grouped", make_pallas("grouped")),
        ("pallas_grouped_x10", chain(make_pallas("grouped"), 10)),
        ("pallas_direct", make_pallas("direct")),
        ("pallas_direct_x10", chain(make_pallas("direct"), 10)),
    ]:
        ms = timed(fn)
        results[name] = round(ms, 3)
        print(json.dumps({"algo": name, "ms_fwd": results[name]}), flush=True)

    # parity spot-check
    ref = np.asarray(xla_conv(x))
    for name, fn in [("grouped", make_pallas("grouped")),
                     ("direct", make_pallas("direct"))]:
        got = np.asarray(fn(x))
        err = float(np.abs(got - ref).max())
        print(json.dumps({"algo": name, "max_err_vs_xla": err}), flush=True)
        assert err < 1e-3, (name, err)


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    main()
