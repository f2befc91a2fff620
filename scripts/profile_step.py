"""Line-item breakdown of the flagship train step on the real TPU chip.

Closes the PERF.md "known remaining headroom" item: attributes the gap
between the encoder component sums and the full-step wall time to the
head / backward / optimizer / memory-bank scatter, and measures a conv
matmul-precision ladder (TPU f32 convs lower to multi-pass bf16; how many
passes is worth money on this model's conv-dominated FLOP mix).

Methodology identical to bench.py: N steps chained inside ONE jitted
``lax.scan`` with per-step-varying inputs, scalar fetched at the end
(python-loop timing over the tunneled backend over-reports badly).

Usage:  python scripts/profile_step.py [--batch 128] [--steps 20]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed_scan(make_body, state, batch, steps):
    """Compile + run a scan of `steps` chained bodies twice; return s/step."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(state, batch, key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            noise = jax.random.normal(k, (1, 1, 1)) * 1e-6
            b = dict(batch, eeg=batch["eeg"] + noise)
            return make_body(carry, b, k)

        state, out = jax.lax.scan(body, state, jnp.arange(steps))
        return state, out

    def fetch(out):
        # block_until_ready is unreliable over the tunneled backend
        # (PERF.md methodology) — fetch a scalar instead
        leaf = jax.tree.leaves(out)[-1]
        return float(leaf.reshape(-1)[-1])

    st, out = run_n(state, batch, jax.random.PRNGKey(1))
    fetch(out)
    t0 = time.perf_counter()
    st, out = run_n(state, batch, jax.random.PRNGKey(2))
    fetch(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--speech_dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_train_step

    model = _flagship(
        window_length=args.window, speech_dim=args.speech_dim,
        depth=args.depth, bank_size=4096,
    )
    rng = np.random.default_rng(0)
    batch = {
        "eeg": rng.standard_normal((args.batch, args.window, 64)).astype(
            np.float32
        ),
        "speech": rng.standard_normal(
            (args.batch, args.window, args.speech_dim)
        ).astype(np.float32),
        "ids": np.arange(1, args.batch + 1, dtype=np.int32),
    }
    tx = make_optimizer("adamw", 1e-3)
    state = init_train_state(
        model, jax.random.PRNGKey(0),
        (batch["eeg"], batch["speech"], batch["ids"]), tx,
    )
    batch = jax.device_put(batch)

    def report(name, seconds):
        print(json.dumps({
            "measurement": name,
            "ms_per_step": round(seconds * 1e3, 2),
            "pairs_per_s": round(args.batch / seconds, 1),
        }), flush=True)

    # -- 1. full train step (headline) --------------------------------------
    step = make_train_step("clip_sim_no_latent_proj", donate=False)

    def body_full(carry, b, k):
        st, losses = step(carry, b, k, warmup=False)
        return st, losses["loss_ce"]

    report("full_step", timed_scan(body_full, state, batch, args.steps))

    # -- 2. forward loss only (training mode: dropout + membank update) -----
    def make_loss_body(update_membank):
        def body(carry, b, k):
            outs, mutated = state.apply_fn(
                dict(carry.variables),
                b["eeg"], b["speech"], b["ids"],
                deterministic=False,
                update_membank=update_membank,
                mutable=["membank"],
                rngs={"dropout": k, "sample": k},
            )
            loss_ce, _, loss_total = outs
            new = carry.replace(
                membank=mutated.get("membank", carry.membank)
            )
            return new, loss_total

        return body

    report(
        "forward_only",
        timed_scan(make_loss_body(True), state, batch, args.steps),
    )
    report(
        "forward_no_membank",
        timed_scan(make_loss_body(False), state, batch, args.steps),
    )

    # -- 3. forward + backward, no optimizer update --------------------------
    def body_grad(carry, b, k):
        def loss_fn(params):
            variables = dict(carry.variables)
            variables["params"] = params
            outs, mutated = carry.apply_fn(
                variables, b["eeg"], b["speech"], b["ids"],
                deterministic=False, mutable=["membank"],
                rngs={"dropout": k, "sample": k},
            )
            return outs[2], mutated

        grads, mutated = jax.grad(loss_fn, has_aux=True)(carry.params)
        gsum = sum(
            jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)
        )
        new = carry.replace(membank=mutated.get("membank", carry.membank))
        return new, gsum

    report("forward_backward", timed_scan(body_grad, state, batch, args.steps))

    # -- 4. encoder-only fwd+bwd (where do the milliseconds live) -----------
    eeg_vars = {"params": state.params["eegModel"]}
    sp_vars = {"params": state.params["speechModel"]}

    def make_enc_body(module_name, inp_key, variables):
        def body(carry, b, k):
            def loss_fn(v):
                out = model.apply(
                    {"params": dict(state.params, **{module_name: v["params"]})},
                    b[inp_key],
                    deterministic=False,
                    method=getattr(
                        model,
                        "encode_eeg" if inp_key == "eeg" else "encode_speech",
                    ),
                    rngs={"dropout": k},
                )
                return jnp.sum(out * out)

            g = jax.grad(loss_fn)(variables)
            return carry, sum(
                jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)
            )

        return body

    report(
        "eeg_encoder_fwd_bwd",
        timed_scan(
            make_enc_body("eegModel", "eeg", eeg_vars), 0.0, batch, args.steps
        ),
    )
    report(
        "speech_encoder_fwd_bwd",
        timed_scan(
            make_enc_body("speechModel", "speech", sp_vars), 0.0, batch,
            args.steps,
        ),
    )

    # -- 5. conv-stack precision ladder --------------------------------------
    # The interleaved encoder's conv FLOPs dominate; TPU f32 convs lower to
    # multi-pass bf16 on the MXU.  Measured on the XLA conv stack alone
    # (default_matmul_precision cannot propagate into the Pallas attention
    # kernel: Mosaic rejects precision=HIGH dots).
    from flax import linen as nn

    from transformer_clip_eeg_tpu.models.encoders import BasicBlock

    class ConvStack(nn.Module):
        depth: int
        window: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.depth):
                x = BasicBlock(
                    64, 64, time_dimension=self.window, name=f"b{i}"
                )(x, True)
            return x

    stack = ConvStack(depth=args.depth, window=args.window)
    sv = stack.init(jax.random.PRNGKey(0), batch["eeg"][:1])

    for prec in ("default", "tensorfloat32", "highest"):
        def body_prec(carry, b, k, _p=prec):
            with jax.default_matmul_precision(_p):
                out = stack.apply(sv, b["eeg"])
            return carry, jnp.sum(out * out)

        report(
            f"conv_stack_fwd_precision_{prec}",
            timed_scan(body_prec, 0.0, batch, args.steps),
        )

    def body_conv_bf16(carry, b, k):
        out = stack.apply(sv, b["eeg"].astype(jnp.bfloat16))
        return carry, jnp.sum(out.astype(jnp.float32) ** 2)

    report(
        "conv_stack_fwd_bf16_inputs",
        timed_scan(body_conv_bf16, 0.0, batch, args.steps),
    )


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        DEFAULT_PRNG_IMPL,
        configure_prng_impl,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    # measure under the training default (JAX_DEFAULT_PRNG_IMPL env wins)
    configure_prng_impl(DEFAULT_PRNG_IMPL)
    main()
