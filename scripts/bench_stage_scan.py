"""Inter-stage experiment: lax.scan over the 10 interleaved encoder stages.

PERF.md's four structural attention experiments were all *intra-kernel*;
the untried inter-stage lever is collapsing the EEG encoder's python-level
stage loop (10× conv BasicBlock + 10× fused Pallas transformer block, ref
``clip_model.py:445-474``) into ONE ``lax.scan`` over stacked per-stage
params, so the whole encoder becomes a single fused region with no
per-stage dispatch/layout glue between stages (VERDICT r2 next #5).

Both variants here are built from the SAME functional primitives over the
SAME stacked parameter arrays — the unrolled python loop emits exactly the
ops the production ``EEGConformerInterleaved`` emits (conv → dropout →
joint-[T,C] LN → GELU → fused Pallas block, input-skip adds, last-stage
skip exception), so the measured difference isolates the stage-loop
structure.  Parity between the two is asserted before timing.

Timing methodology (PERF.md): N steps chained inside one jitted
``lax.scan`` with per-step-varying inputs, scalar fetched at the end.

Run on the real chip: ``python scripts/bench_stage_scan.py``
CPU smoke: ``JAX_PLATFORMS=cpu BENCH_SMOKE=1 python scripts/bench_stage_scan.py``
Prints one JSON line with fwd and fwd+bwd ms per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from transformer_clip_eeg_tpu.ops.layers import gelu_exact
from transformer_clip_eeg_tpu.ops.pallas_block import fused_transformer_block

SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"
if SMOKE:
    B, T, E, K, DEPTH, HEADS, STEPS = 8, 32, 16, 8, 3, 8, 2
else:
    B, T, E, K, DEPTH, HEADS, STEPS = 128, 192, 64, 64, 10, 8, 10
CONV_DROP, ATT_DROP = 0.2, 0.5
TRAINING = True


def init_stacks(rng: np.random.Generator):
    """Per-stage params stacked on a leading [DEPTH] axis.  Conv block:
    (kernel [K, E, E], bias [E], ln scale/bias [T, E]); transformer block:
    the 16-tuple ops/pallas_block documents, in order."""

    def u(shape, fan_in):
        b = 1.0 / np.sqrt(fan_in)
        return rng.uniform(-b, b, (DEPTH,) + shape).astype(np.float32)

    conv = dict(
        kernel=u((K, E, E), E * K),
        bias=u((E,), E * K),
        ln_scale=np.ones((DEPTH, T, E), np.float32),
        ln_bias=np.zeros((DEPTH, T, E), np.float32),
    )
    e = E
    block = (
        np.ones((DEPTH, e), np.float32), np.zeros((DEPTH, e), np.float32),
        u((e, e), e), u((e, e), e), u((e, e), e),
        u((e,), e), u((e,), e), u((e,), e),
        u((e, e), e), u((e,), e),
        np.ones((DEPTH, e), np.float32), np.zeros((DEPTH, e), np.float32),
        u((e, 4 * e), e), u((4 * e,), e),
        u((e, 4 * e), 4 * e).transpose(0, 2, 1).copy(), u((e,), 4 * e),
    )
    return jax.device_put(conv), jax.device_put(tuple(jnp.asarray(p) for p in block))


def conv_stage(x, kernel, bias, ln_scale, ln_bias, key):
    """BasicBlock numerics (encoders.py:98-118): conv(same) → dropout →
    joint-[T,C] LayerNorm → exact GELU."""
    pad_lo = (K - 1) // 2
    y = lax.conv_general_dilated(
        x, kernel, (1,), [(pad_lo, K - 1 - pad_lo)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    ) + bias
    if TRAINING and CONV_DROP > 0:
        keep = 1.0 - CONV_DROP
        mask = jax.random.bernoulli(key, p=keep, shape=y.shape)
        y = jnp.where(mask, y / keep, 0.0)
    mean = jnp.mean(y, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=(-2, -1), keepdims=True)
    y = (y - mean) * lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
    return gelu_exact(y)


def block_stage(x, params, seed):
    interpret = jax.default_backend() != "tpu"
    return fused_transformer_block(
        x, params, seed, ATT_DROP, ATT_DROP, HEADS, E ** 0.5, TRAINING,
        interpret, None,
    )


def encoder_unrolled(x, conv, block, seeds, keys):
    """Python stage loop — what the production encoder emits."""
    skip = x
    for i in range(DEPTH):
        x = conv_stage(
            x + skip, conv["kernel"][i], conv["bias"][i],
            conv["ln_scale"][i], conv["ln_bias"][i], keys[i],
        )
        t_in = x + skip if i < DEPTH - 1 else x
        x = block_stage(t_in, tuple(p[i] for p in block), seeds[i])
    return x


def encoder_scanned(x, conv, block, seeds, keys):
    """One lax.scan over the stacked stage axis; the last-stage skip
    exception becomes a per-stage 0/1 flag riding the scan xs."""
    skip = x
    flags = jnp.arange(DEPTH) < DEPTH - 1

    def body(carry, xs):
        conv_i, block_i, seed_i, key_i, flag_i = xs
        y = conv_stage(
            carry + skip, conv_i["kernel"], conv_i["bias"],
            conv_i["ln_scale"], conv_i["ln_bias"], key_i,
        )
        t_in = y + jnp.where(flag_i, 1.0, 0.0) * skip
        y = block_stage(t_in, block_i, seed_i)
        return y, ()

    out, _ = lax.scan(body, x, (conv, block, seeds, keys, flags))
    return out


def timed(fn, x, stacks, steps=STEPS):
    """Chain ``steps`` applications in one jitted scan, salted inputs.

    The stacks ride as explicit jit ARGUMENTS (closing over device arrays
    embeds them as constants, which XLA treats differently per variant —
    the first version of this harness did that and inflated the unrolled
    forward ~5x against its plain-jit time)."""

    @jax.jit
    def chained(x0, stacks, salts):
        def body(x, s):
            return fn(x + s, stacks), ()

        out, _ = lax.scan(body, x0, salts)
        return jnp.sum(out)

    salts = jnp.asarray(
        np.random.default_rng(3).standard_normal((steps, 1, 1, 1)) * 1e-3,
        jnp.float32,
    )
    t0 = time.time()
    float(chained(x, stacks, salts))  # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    r = float(chained(x, stacks, salts * 1.5))
    dt = (time.time() - t0) / steps * 1e3
    return dt, compile_s, r


def main() -> int:
    rng = np.random.default_rng(0)
    conv, block = init_stacks(rng)
    x = jax.device_put(rng.standard_normal((B, T, E)).astype(np.float32))
    seeds = jnp.arange(DEPTH, dtype=jnp.float32) + 11
    keys = jax.random.split(jax.random.PRNGKey(5), DEPTH)

    global TRAINING
    # parity check without dropout noise (same params, same math)
    TRAINING = False
    a = encoder_unrolled(x, conv, block, seeds, keys)
    b = encoder_scanned(x, conv, block, seeds, keys)
    # the two variants are the same math modulo lax.scan, but scan moves
    # XLA's fusion boundaries and f32 matmuls lower to split-bf16 MXU
    # passes, so rounding deltas compound over 10 stages + joint LayerNorms
    # — report the deviation and only fail on logic-level divergence
    a, b = np.asarray(a), np.asarray(b)
    max_abs = float(np.abs(a - b).max())
    denom = float(np.abs(a).mean())
    print(f"# parity: max|Δ|={max_abs:.2e} (mean|x|={denom:.2e})",
          file=sys.stderr)
    assert max_abs < 0.05 * max(denom, 1.0), (max_abs, denom)
    TRAINING = True

    def loss_unrolled(stacks, x, seeds, keys):
        conv_s, block_s = stacks
        return jnp.sum(encoder_unrolled(x, conv_s, block_s, seeds, keys))

    def loss_scanned(stacks, x, seeds, keys):
        conv_s, block_s = stacks
        return jnp.sum(encoder_scanned(x, conv_s, block_s, seeds, keys))

    out = {}
    for name, enc, loss in (
        ("unrolled", encoder_unrolled, loss_unrolled),
        ("scanned", encoder_scanned, loss_scanned),
    ):
        fwd_ms, fwd_compile_s, _ = timed(
            lambda xx, stacks: enc(xx, stacks[0], stacks[1], seeds, keys),
            x, (conv, block),
        )
        grad_fn = jax.grad(loss, argnums=0)

        @jax.jit
        def chained_bwd(x0, stacks, salts, _grad_fn=grad_fn):
            # every grad leaf is summed into the scan carry so XLA cannot
            # dead-code-eliminate the backward (the first version of this
            # harness folded the grads in with `* 0.0`, which XLA DCE'd —
            # it was timing an empty graph)
            def body(carry, s):
                x_c, acc = carry
                g = _grad_fn(stacks, x_c + s, seeds, keys)
                gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
                return (x_c, acc + gsum), ()

            (_, acc), _ = lax.scan(body, (x0, jnp.float32(0.0)), salts)
            return acc

        salts = jnp.asarray(
            np.random.default_rng(4).standard_normal((STEPS, 1, 1, 1)) * 1e-3,
            jnp.float32,
        )
        t0 = time.time()
        float(chained_bwd(x, (conv, block), salts))
        bwd_compile_s = time.time() - t0
        t0 = time.time()
        float(chained_bwd(x, (conv, block), salts * 2.0))
        bwd_ms = (time.time() - t0) / STEPS * 1e3
        out[name] = {
            "fwd_ms": round(fwd_ms, 3),
            "fwd_bwd_ms": round(bwd_ms, 3),
            "fwd_compile_s": round(fwd_compile_s, 2),
            "fwd_bwd_compile_s": round(bwd_compile_s, 2),
        }
        print(
            f"# {name}: fwd {fwd_ms:.2f} ms, fwd+bwd {bwd_ms:.2f} ms, "
            f"compile {fwd_compile_s:.1f}s/{bwd_compile_s:.1f}s",
            file=sys.stderr,
        )

    out["metric"] = "stage_scan_vs_unrolled"
    out["fwd_speedup"] = round(
        out["unrolled"]["fwd_ms"] / out["scanned"]["fwd_ms"], 3
    )
    out["fwd_bwd_speedup"] = round(
        out["unrolled"]["fwd_bwd_ms"] / out["scanned"]["fwd_bwd_ms"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.train.fold_parallel import (
        ensure_scoped_vmem_budget,
    )
    from transformer_clip_eeg_tpu.utils.platform import (
        DEFAULT_PRNG_IMPL,
        configure_prng_impl,
        honor_jax_platforms_env,
    )

    # the scanned variant's Pallas-block backward stages its stage-sliced
    # operands on the scoped-VMEM stack (25.4 MiB measured > the 16 MiB
    # default), exactly like the fold-vmapped backward
    ensure_scoped_vmem_budget()
    honor_jax_platforms_env()
    configure_prng_impl(DEFAULT_PRNG_IMPL)
    raise SystemExit(main())
