"""Online-serving micro-batching: concurrent clients, with/without coalescing.

Simulates K concurrent clients each posting R sequential small embed
requests at the flagship configuration and measures aggregate requests/s
plus per-request p50/p99, with micro-batching off (every request is its
own device dispatch, serialized by the service lock) and on
(``MicroBatcher`` coalesces a linger window into one dispatch).

On the tunneled chip every dispatch costs ~70 ms round-trip, so the
expected win approaches K× for small requests.  Prints one JSON line per
scenario.

Usage: python scripts/bench_microbatch.py [--clients 8] [--requests 6]
       [--windows 8] [--window_ms 5]
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--windows", type=int, default=8,
                    help="EEG windows per request")
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--window", type=int, default=192)
    ap.add_argument("--speech_dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=128,
                    help="embedder compile batch")
    args = ap.parse_args()

    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    import jax

    from __graft_entry__ import _flagship
    from transformer_clip_eeg_tpu.serve import InferenceSession
    from transformer_clip_eeg_tpu.server import EmbeddingService

    model = _flagship(
        window_length=args.window, speech_dim=args.speech_dim,
        depth=args.depth, bank_size=512,
    )
    rng = np.random.default_rng(0)
    eeg0 = rng.standard_normal((2, args.window, 64)).astype(np.float32)
    sp0 = rng.standard_normal((2, args.window, args.speech_dim)).astype(
        np.float32
    )
    variables = model.init(
        jax.random.PRNGKey(0), eeg0, sp0, np.arange(1, 3, dtype=np.int32)
    )
    session = InferenceSession(model, variables, chunk=args.chunk)
    # compile both embed batch shapes up front (requests pad to chunk)
    session.embed_eeg(eeg0)

    # per-client request streams, pre-salted so no two requests are
    # byte-identical (the tunneled backend deduplicates identical
    # dispatches, PERF.md)
    reqs = [
        [
            rng.standard_normal(
                (args.windows, args.window, 64)
            ).astype(np.float32)
            for _ in range(args.requests)
        ]
        for _ in range(args.clients)
    ]

    def scenario(batch_window_ms: float) -> dict:
        service = EmbeddingService(
            session, batch_window_ms=batch_window_ms
        )
        lat = []
        lat_lock = threading.Lock()

        def client(streams):
            for arr in streams:
                t0 = time.perf_counter()
                service.embed_eeg({"windows": arr})
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)

        threads = [
            threading.Thread(target=client, args=(reqs[i],))
            for i in range(args.clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        n = args.clients * args.requests
        out = {
            "batch_window_ms": batch_window_ms,
            "clients": args.clients,
            "requests": n,
            "windows_per_request": args.windows,
            "requests_per_s": round(n / wall, 1),
            "p50_ms": round(float(np.percentile(lat, 50) * 1e3), 2),
            "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 2),
        }
        if service._eeg_batcher is not None:
            out["device_dispatches"] = service._eeg_batcher.dispatches
        service.close()
        return out

    scenario(0.0)  # warm both paths once more before timing
    for window_ms in (0.0, args.window_ms):
        print(json.dumps(scenario(window_ms)), flush=True)


if __name__ == "__main__":
    main()
