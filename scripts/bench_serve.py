"""Serving throughput: flagship embedders, windows/second on one chip.

Measures InferenceSession's chunked embedding path at the flagship
configuration (EEGConformerInterleaved depth 10 / convLSTM on 1024-dim
wav2vec features, 192-sample windows), scan-chained per PERF.md
methodology.  Prints one JSON line per stream.

Usage: python scripts/bench_serve.py [--chunk 128] [--steps 20]
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
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--speech_dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.train.steps import make_embed_fns

    model = _flagship(
        window_length=args.window, speech_dim=args.speech_dim,
        depth=args.depth, bank_size=512,
    )
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((args.chunk, args.window, 64)).astype(np.float32)
    speech = rng.standard_normal(
        (args.chunk, args.window, args.speech_dim)
    ).astype(np.float32)
    ids = np.arange(1, args.chunk + 1, dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), eeg, speech, ids)
    embed_eeg, embed_speech = make_embed_fns(model)

    # device-resident inputs: numpy args re-upload on EVERY jitted call,
    # which over this session's tunneled link (~30 MB/s) costs seconds per
    # call and dwarfs the compute being measured (the 1024-dim speech chunk
    # is 100 MB).  Serving on a directly-attached host pays PCIe/ICI rates
    # instead; this benchmark reports the compute path.
    eeg, speech = jax.device_put(eeg), jax.device_put(speech)

    def timed(fn, x):
        # the timed dispatch must DIFFER from the warm-up dispatch — the
        # tunneled backend deduplicates repeated identical dispatches
        # (PERF.md methodology), so a byte-identical second call can be
        # served from cache and under-report
        @jax.jit
        def run_n(x0, salt):
            def body(carry, i):
                emb = fn(variables, x0 + (i + salt) * 1e-9)
                return carry + jnp.sum(emb[-1]), None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(args.steps, dtype=jnp.float32)
            )
            return out

        float(run_n(x, jnp.float32(0.0)))  # compile + warm
        t0 = time.perf_counter()
        float(run_n(x, jnp.float32(1.0)))
        dt = (time.perf_counter() - t0) / args.steps
        return dt

    for name, fn, x in [
        ("eeg", embed_eeg, eeg),
        ("speech", embed_speech, speech),
    ]:
        dt = timed(fn, x)
        print(json.dumps({
            "stream": name,
            "ms_per_chunk": round(dt * 1000, 2),
            "windows_per_s": round(args.chunk / dt, 1),
        }), flush=True)

    # -- per-request latency (p50/p99) -------------------------------------
    # One request = dispatch + fetch of a small (8-window) batch — the
    # interactive serving shape, vs the throughput numbers above.  On this
    # host every request pays the tunneled link's ~70 ms round-trip; on a
    # directly-attached host subtract that floor.

    def latency(fn, x_small, n=40):
        # pre-materialize salted request inputs so the timed loop measures
        # dispatch+fetch only (and no two requests are byte-identical —
        # identical dispatches get deduplicated, PERF.md)
        xs = [jax.block_until_ready(x_small + i * 1e-9) for i in range(n)]
        np.asarray(fn(variables, xs[0]))  # compile + warm
        lat = []
        for xi in xs:
            t0 = time.perf_counter()
            np.asarray(fn(variables, xi))
            lat.append(time.perf_counter() - t0)
        return (
            float(np.percentile(lat, 50) * 1e3),
            float(np.percentile(lat, 99) * 1e3),
        )

    req = 8
    for name, fn, x in [
        ("eeg", embed_eeg, eeg[:req]),
        ("speech", embed_speech, speech[:req]),
    ]:
        p50, p99 = latency(fn, x)
        print(json.dumps({
            "latency_stream": name, "request_windows": req,
            "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
        }), flush=True)

    # -- RetrievalIndex: incremental add + top-k query latency -------------
    from transformer_clip_eeg_tpu.serve import RetrievalIndex

    dim = int(np.asarray(embed_speech(variables, speech[:1])).shape[1])
    cand = rng.standard_normal((256, dim)).astype(np.float32)
    cand /= np.linalg.norm(cand, axis=1, keepdims=True)
    index = RetrievalIndex(dim, capacity=4096)
    index.add(cand[:64])  # warm the compiled update/topk paths
    index.topk(cand[:1], 10)

    lat_add, lat_topk = [], []
    for i in range(64, 192):
        t0 = time.perf_counter()
        index.add(cand[i : i + 1])
        lat_add.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        index.topk(cand[i : i + 1], 10)
        lat_topk.append(time.perf_counter() - t0)
    for name, lat in [("index_add_row", lat_add), ("index_topk_q1", lat_topk)]:
        print(json.dumps({
            "latency_stream": name,
            "p50_ms": round(float(np.percentile(lat, 50) * 1e3), 2),
            "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 2),
        }), flush=True)


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    main()
