"""Measure what --compile_cache_dir saves: time-to-first-train-step in a
fresh process, cold cache vs warm cache.

The persistent compilation cache (utils.platform.enable_compile_cache)
serializes XLA executables to disk; a later process deserializes instead
of recompiling.  This benchmark spawns two child processes against the
same (initially empty) cache dir and times each child's first flagship
train-step execution — the first child compiles and populates the cache,
the second deserializes.  Parity: the step result is fetched in both
children, so a warm "win" can't come from skipping execution.

Usage:  python scripts/bench_compile_cache.py [--batch 128] [--depth 10]
        (add JAX_PLATFORMS=cpu for a smoke run off the TPU)
Prints one JSON line: {"cold_s": ..., "warm_s": ..., "speedup": ...}.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(args) -> None:
    from transformer_clip_eeg_tpu.utils.platform import (
        enable_compile_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    # before ANY jit (init included) so every program rides the cache
    enable_compile_cache(args.cache_dir)

    import jax
    import numpy as np

    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_train_step

    t_start = time.perf_counter()
    model = _flagship(
        window_length=args.window, speech_dim=args.speech_dim,
        depth=args.depth, bank_size=4096,
    )
    rng = np.random.default_rng(0)
    batch = {
        "eeg": rng.standard_normal(
            (args.batch, args.window, 64)
        ).astype(np.float32),
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
    step = make_train_step("clip_sim_no_latent_proj", donate=False)
    t0 = time.perf_counter()
    _, losses = step(state, batch, jax.random.PRNGKey(1), warmup=False)
    loss = float(losses["loss_ce"])  # fetch → compile + execute completed
    t1 = time.perf_counter()
    print(json.dumps({
        "first_step_s": round(t1 - t0, 3),
        "init_plus_step_s": round(t1 - t_start, 3),
        "loss_ce": loss,
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--speech_dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--cache_dir", type=str, default="")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        child(args)
        return 0

    cache = args.cache_dir or tempfile.mkdtemp(prefix="xla_cache_bench_")
    runs = {}
    for label in ("cold", "warm"):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            "--cache_dir", cache,
            "--batch", str(args.batch), "--window", str(args.window),
            "--speech_dim", str(args.speech_dim),
            "--depth", str(args.depth),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            return out.returncode
        runs[label] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"# {label}: {runs[label]}", file=sys.stderr, flush=True)

    assert abs(runs["cold"]["loss_ce"] - runs["warm"]["loss_ce"]) < 1e-5, (
        "cached executable computed a different loss"
    )
    # first_step_s isolates the compile (what the cache actually saves);
    # startup_s additionally includes host-side model/optimizer init and
    # device_put, which the cache cannot help — reported separately so the
    # headline speedup isn't diluted (ADVICE r2)
    cold = runs["cold"]["first_step_s"]
    warm = runs["warm"]["first_step_s"]
    print(json.dumps({
        "metric": "first_train_step",
        "cold_s": cold,
        "warm_s": warm,
        "speedup": round(cold / warm, 2),
        "startup_cold_s": runs["cold"]["init_plus_step_s"],
        "startup_warm_s": runs["warm"]["init_plus_step_s"],
        "cache_entries": len(os.listdir(cache)),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
