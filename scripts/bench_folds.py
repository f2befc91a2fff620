"""Fold-parallel training throughput: aggregate pairs/s vs fold count.

Measures the fold-stacked chunk-scan step (``train/fold_parallel.py``) on
the flagship config (EEGConformerInterleaved depth 10 + convLSTM +
clip_sim_no_latent_proj, batch 128, wav2vec 1024-dim) at F = 1, 2, 4.
The per-fold model cannot saturate the chip alone (single-model throughput
is flat beyond batch 128 — PERF.md), so aggregate throughput should scale
superlinearly in utilization terms: the VERDICT r1 target is ≥1.8× at F=2+.

Methodology (PERF.md): inputs device_put up front, index matrices are
per-call-fresh jit arguments, sync by fetching a loss scalar (not
block_until_ready, unreliable over the tunneled link).

Run on the real chip: ``python scripts/bench_folds.py [--folds 1 2 4]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.models.registry import (
    build_model,
    load_eeg_encoder,
    load_speech_encoder,
)
from transformer_clip_eeg_tpu.train.fold_parallel import make_fold_scan_step
from transformer_clip_eeg_tpu.train.state import (
    init_train_state,
    make_optimizer,
)

WL, BS, SPEECH_DIM, N_ROWS = 192, 128, 1024, 8
N_WIN, N_SUBS = 192, 8  # device chunk: windows per chunk, subjects


def build_flagship(bank_size: int):
    eeg = load_eeg_encoder("EEGConformerInterleaved", 128, 128, 1, WL, 8, 10)
    speech = load_speech_encoder("convLSTM", 128, 128, 1, WL, 3, SPEECH_DIM, 8)
    return build_model(
        "clip_sim_no_latent_proj", eeg, speech, window_length=WL,
        temperature=0.075, latent_dim=8, bank_size=bank_size,
        lambda_clip_loss=1.0, lambda_sim_loss=0.0, momentum_membank=0.9,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--folds", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    eeg_c = jax.device_put(
        rng.standard_normal((N_SUBS, N_WIN, WL, 64)).astype(np.float32)
    )
    sp_c = jax.device_put(
        rng.standard_normal((N_WIN, WL, SPEECH_DIM)).astype(np.float32)
    )
    ids_c = jax.device_put(np.arange(1, N_WIN + 1, dtype=np.int32))

    model = build_flagship(bank_size=N_WIN)
    tx = make_optimizer("adamw", 1e-3)
    example = (
        np.asarray(eeg_c[0, :BS]), np.asarray(sp_c[:BS]),
        np.asarray(ids_c[:BS]),
    )
    state0 = init_train_state(model, jax.random.PRNGKey(0), example, tx)
    rng_key = jax.random.PRNGKey(7)

    results = {}
    for F in args.folds:
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (F,) + x.shape).copy(), state0
        )
        step = make_fold_scan_step("clip_sim_no_latent_proj", donate=True)

        def draw():
            idx = np.stack(
                [
                    np.stack([rng.choice(N_WIN, BS, False) for _ in range(F)])
                    for _ in range(N_ROWS)
                ]
            ).astype(np.int32)  # [n, F, bs]
            subs = rng.integers(0, N_SUBS, (N_ROWS, F, BS)).astype(np.int32)
            return idx, subs

        valid = np.ones((N_ROWS, F), bool)
        # warmup / compile
        for _ in range(2):
            idx, subs = draw()
            states, losses = step(
                states, eeg_c, sp_c, ids_c, idx, subs, subs, valid,
                rng_key, warmup=False,
            )
        float(jnp.sum(losses["loss_ce"]))  # sync

        t0 = time.time()
        for _ in range(args.iters):
            idx, subs = draw()
            states, losses = step(
                states, eeg_c, sp_c, ids_c, idx, subs, subs, valid,
                rng_key, warmup=False,
            )
        float(jnp.sum(losses["loss_ce"]))  # sync
        dt = time.time() - t0
        pairs = args.iters * N_ROWS * F * BS
        results[F] = pairs / dt
        print(f"F={F}: {pairs / dt:.1f} pairs/s aggregate "
              f"({dt / args.iters * 1e3:.1f} ms/chunk-call)")

    base = results[args.folds[0]]
    out = {
        "metric": "fold_parallel_aggregate_pairs_per_s",
        "per_fold_count": {str(k): v for k, v in results.items()},
        "speedup_vs_single": {
            str(k): v / base for k, v in results.items()
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.train.fold_parallel import (
        ensure_scoped_vmem_budget,
    )
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    ensure_scoped_vmem_budget()
    honor_jax_platforms_env()
    raise SystemExit(main())
