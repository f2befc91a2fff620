"""Headline benchmark: flagship training throughput (EEG–speech pairs/sec).

Measures the full jitted training step — on-device gather-free batch,
forward (EEGConformerInterleaved depth 10 + convLSTM speech encoder),
InfoNCE, backward, AdamW update, memory-bank scatter — at the reference's
default configuration (batch 128, 192-sample windows, wav2vec-19 1024-dim
features; ref ``train_clip_final.py:150-218``).

The reference publishes no numbers (BASELINE.md), so the baseline is the
reference's own torch training step measured on this host (cached in
``BENCH_BASELINE.json`` after the first run).  Prints ONE JSON line:

    {"metric": "train_throughput", "value": N, "unit": "pairs/s",
     "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"  # tiny-shape CPU smoke run
BATCH = 8 if SMOKE else 128
WINDOW = 32 if SMOKE else 192
SPEECH_DIM = 16 if SMOKE else 1024
DEPTH = 2 if SMOKE else 10
TIMED_STEPS = 3 if SMOKE else 20


def measure_ours(compute_dtype=None) -> float:
    import jax

    sys.path.insert(0, REPO)
    from transformer_clip_eeg_tpu.utils.platform import (
        DEFAULT_PRNG_IMPL,
        configure_prng_impl,
    )

    # the training default: rbg dropout streams, +16-20% over
    # threefry2x32 (JAX_DEFAULT_PRNG_IMPL env still wins)
    configure_prng_impl(DEFAULT_PRNG_IMPL)
    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_train_step

    model = _flagship(
        window_length=WINDOW, speech_dim=SPEECH_DIM, depth=DEPTH,
        bank_size=4096,
    )
    rng = np.random.default_rng(0)
    batch = {
        "eeg": rng.standard_normal((BATCH, WINDOW, 64)).astype(np.float32),
        "speech": rng.standard_normal((BATCH, WINDOW, SPEECH_DIM)).astype(
            np.float32
        ),
        "ids": np.arange(1, BATCH + 1, dtype=np.int32),
    }
    tx = make_optimizer("adamw", 1e-3)
    state = init_train_state(
        model,
        jax.random.PRNGKey(0),
        (batch["eeg"], batch["speech"], batch["ids"]),
        tx,
    )
    import jax.numpy as jnp

    step = make_train_step(
        "clip_sim_no_latent_proj", compute_dtype=compute_dtype, donate=False
    )
    key = jax.random.PRNGKey(1)
    batch = jax.device_put(batch)

    # Methodology: N steps chained inside ONE jitted scan, with the input
    # perturbed per step, and a scalar fetched at the end.  On the tunneled
    # TPU backend, python-loop timing with block_until_ready over-reports
    # badly (repeated identical dispatches get deduplicated); in-jit
    # chaining is immune.
    @jax.jit
    def run_n(state, batch, key):
        def body(carry, i):
            state = carry
            k = jax.random.fold_in(key, i)
            noise = jax.random.normal(k, (1, 1, 1)) * 1e-6
            # perturb BOTH inputs: anything computed from a loop-invariant
            # input upstream of the first dropout would be hoisted out of
            # the scan and escape the measurement
            b = dict(
                batch,
                eeg=batch["eeg"] + noise,
                speech=batch["speech"] + noise,
            )
            state, losses = step(state, b, k, warmup=False)
            return state, losses["loss_ce"]

        state, losses = jax.lax.scan(body, state, jnp.arange(TIMED_STEPS))
        return state, losses[-1]

    state, loss = run_n(state, batch, key)  # compile + warmup
    float(loss)
    t0 = time.perf_counter()
    state, loss = run_n(state, batch, jax.random.PRNGKey(2))
    float(loss)
    dt = time.perf_counter() - t0
    return BATCH * TIMED_STEPS / dt


def measure_reference() -> float:
    """Time the reference's own train step (torch, this host's torch device)."""
    import torch

    sys.path.insert(0, "/root/reference")
    import clip_model as ref  # noqa: E402

    device = "cuda" if torch.cuda.is_available() else "cpu"
    torch.manual_seed(0)
    eeg_enc = ref.EEGConformerInterleaved(
        output_dim=8, conformer_input_dim=64, dropout_rate=0.2, eeg_dim=64,
        filters=[64], kernels=[64], dilation_rate=1, time_dimension=WINDOW,
        depth=DEPTH,
    )
    speech_enc = ref.EEGConvLSTM(
        units_lstm=128, output_dim=8, dropout_rate=0.4, eeg_dim=SPEECH_DIM,
        filters=[64], kernels=[32], dilation_rate=1, time_dimension=WINDOW,
    )
    latent = speech_enc.get_output_dim(WINDOW)
    bank = ref.memoryBank(bank_size=4096, device=device, dim=latent)
    model = ref.CLIPSimNoLatentProj(
        eegModel=eeg_enc, speechModel=speech_enc, eegMemoryBank=bank,
        temperature=0.075, window_length=WINDOW,
    ).to(device)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)

    g = torch.Generator().manual_seed(0)
    eeg = torch.randn((BATCH, WINDOW, 64), generator=g).to(device)
    speech = torch.randn((BATCH, WINDOW, SPEECH_DIM), generator=g).to(device)
    ids = torch.arange(1, BATCH + 1, dtype=torch.int64).to(device)

    model.train()
    n_steps = 3
    # warmup
    loss_ce, _, loss_total = model(eeg, speech, ids)
    opt.zero_grad(); loss_total.backward(); opt.step()

    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss_ce, _, loss_total = model(eeg, speech, ids)
        opt.zero_grad()
        loss_total.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return BATCH * n_steps / dt


def main():
    sys.path.insert(0, REPO)
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    # an explicit JAX_PLATFORMS=cpu must win over the sitecustomize-prepended
    # TPU platform, or the smoke run hangs on a dead tunnel
    honor_jax_platforms_env()
    ours = measure_ours()

    if SMOKE:
        print(json.dumps({
            "metric": "train_throughput", "value": round(ours, 2),
            "unit": "pairs/s", "vs_baseline": None, "smoke": True,
        }))
        return

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["reference_pairs_per_s"]
    else:
        try:
            baseline = measure_reference()
            with open(BASELINE_CACHE, "w") as f:
                json.dump(
                    {
                        "reference_pairs_per_s": baseline,
                        "note": "reference torch default-config train step, "
                        "measured on this host",
                    },
                    f,
                )
        except Exception as e:  # reference unavailable → no baseline ratio
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = None

    result = {
        "metric": "train_throughput",
        "value": round(ours, 2),
        "unit": "pairs/s",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
