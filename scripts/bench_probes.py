"""Benchmark: batched (one-dispatch) vs sequential regression-probe training.

SparrKULee-scale synthetic data: 85 subjects, ~1000 train / 200 val windows
each, 192-sample windows, 8-dim frozen embeddings (the flagship latent).
The sequential path is timed on a subject subset and extrapolated linearly
(it is embarrassingly per-subject); the batched path trains all subjects in
one jitted while_loop program.

Usage: python scripts/bench_probes.py [--subjects 85] [--epochs 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=85)
    ap.add_argument("--seq_subjects", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n_train", type=int, default=1000)
    ap.add_argument("--n_val", type=int, default=200)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--dim", type=int, default=8)
    args = ap.parse_args()

    from transformer_clip_eeg_tpu.eval.regression import (
        train_regression_probe,
        train_regression_probes_batched,
    )

    rng = np.random.default_rng(0)

    def mk(n):
        emb = rng.standard_normal((n, args.window, args.dim)).astype(np.float32)
        env = (
            emb.sum(-1, keepdims=True) * 0.1
            + 0.3 * rng.standard_normal((n, args.window, 1))
        ).astype(np.float32)
        return emb, env

    subjects = [f"sub-{i:03d}" for i in range(args.subjects)]
    train_by = {s: mk(args.n_train) for s in subjects}
    val_by = {s: mk(args.n_val) for s in subjects}

    # batched: one compile + one dispatch for ALL subjects.  Warm with the
    # IDENTICAL static config (epochs/patience are baked into the while_loop
    # program — a different value is a different compile), then time the
    # second call so compile is excluded, matching the sequential measurement
    # below which also excludes its first-call compiles.
    train_regression_probes_batched(
        subjects, train_by, val_by, epochs=args.epochs, patience=args.epochs
    )
    t0 = time.perf_counter()
    train_regression_probes_batched(
        subjects, train_by, val_by, epochs=args.epochs, patience=args.epochs
    )
    t_batched = time.perf_counter() - t0

    # sequential: a subset, extrapolated
    seq_subs = subjects[: args.seq_subjects]
    train_regression_probe(
        *train_by[seq_subs[0]], *val_by[seq_subs[0]], epochs=1,
        patience=args.epochs,
    )
    t0 = time.perf_counter()
    for s in seq_subs:
        train_regression_probe(
            *train_by[s], *val_by[s], epochs=args.epochs, patience=args.epochs
        )
    t_seq = (time.perf_counter() - t0) * (args.subjects / len(seq_subs))

    print(json.dumps({
        "subjects": args.subjects,
        "epochs": args.epochs,
        "batched_s": round(t_batched, 2),
        "sequential_s_extrapolated": round(t_seq, 2),
        "speedup": round(t_seq / t_batched, 1),
    }))


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    main()
