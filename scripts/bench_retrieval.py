"""RetrievalIndex at realistic bank size (VERDICT r2 next #7).

SparrKULee's full stimulus set segments into ~O(100k) candidate windows
(85+ hours at 3 s hop), so the serving-path index must hold and search a
bank that size.  Flagship embedding dim = window_length x output_dim =
192 x 8 = 1536, so 100k rows = 614 MB f32 — comfortably resident on one
chip's HBM; this bench verifies that and measures the latency costs that
grow with bank size (the [Q, D] @ [D, N] similarity matmul and top-k).

Measures, at each --rows size:
  * bulk build time (host -> device upload dominated on tunneled links)
  * incremental add p50/p99 (1 row, the online-serving write path)
  * topk p50/p99 for Q=1 and Q=16, k=10 (includes one fetch round-trip)
  * device memory in use

Run on the real chip:  python scripts/bench_retrieval.py --rows 100000
CPU smoke (+ 8-device mesh path):
  JAX_PLATFORMS=cpu BENCH_SMOKE=1 python scripts/bench_retrieval.py
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"


def pcts(samples):
    a = np.asarray(samples) * 1e3
    return round(float(np.percentile(a, 50)), 2), round(
        float(np.percentile(a, 99)), 2
    )


def bench_one(rows: int, dim: int, mesh=None) -> dict:
    from transformer_clip_eeg_tpu.serve import RetrievalIndex

    rng = np.random.default_rng(0)
    out = {"rows": rows, "dim": dim}

    idx = RetrievalIndex(dim, capacity=rows + 64, mesh=mesh)
    t0 = time.time()
    chunk = 8192
    remaining = rows
    while remaining > 0:
        n = min(chunk, remaining)
        emb = rng.standard_normal((n, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        idx.add(emb)
        remaining -= n
    # force completion of the async updates before timing anything else
    np.asarray(idx._bank[0])
    out["bulk_build_s"] = round(time.time() - t0, 2)

    # online add: 1 row at a time (async dispatch — the serving write path)
    adds = []
    one = rng.standard_normal((1, dim)).astype(np.float32)
    one /= np.linalg.norm(one)
    for _ in range(8 if SMOKE else 50):
        t0 = time.time()
        idx.add(one * 1.0)
        adds.append(time.time() - t0)
        idx.size -= 1  # keep capacity headroom for the loop
    out["add_p50_ms"], out["add_p99_ms"] = pcts(adds)

    for q in (1, 16):
        queries = rng.standard_normal((q, dim)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        idx.topk(queries, k=10)  # compile
        lat = []
        for i in range(8 if SMOKE else 50):
            # salt the query so no RPC-level dedup can serve a cached reply
            qs = queries * (1.0 + 1e-6 * i)
            t0 = time.time()
            idx.topk(qs, k=10)
            lat.append(time.time() - t0)
        p50, p99 = pcts(lat)
        out[f"topk_q{q}_p50_ms"] = p50
        out[f"topk_q{q}_p99_ms"] = p99

    try:
        stats = jax.devices()[0].memory_stats()
        out["hbm_in_use_gb"] = round(stats["bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[4096, 1000] if SMOKE else [4096, 100_000])
    ap.add_argument("--dim", type=int, default=64 if SMOKE else 1536)
    args = ap.parse_args()

    results = [bench_one(r, args.dim) for r in args.rows]
    out = {"metric": "retrieval_index_scaling", "sizes": results}

    if SMOKE and len(jax.devices()) >= 8:
        # row-sharded bank over the virtual mesh: same top-k results
        from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

        out["mesh_smoke"] = bench_one(args.rows[-1], args.dim,
                                      mesh=make_mesh())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    raise SystemExit(main())
