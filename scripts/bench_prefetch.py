"""Epoch wall-clock of the device-data path: prefetch + residency wins.

Measures what the training loop's *data path* costs end-to-end, the number
the per-step headline (bench.py) deliberately excludes:

* epoch 1, prefetch OFF — every chunk pad+uploads synchronously before its
  batches run (the round-1 behavior);
* epoch 1, prefetch ON  — the next chunk's upload overlaps the current
  chunk's chunk-scan dispatch (``DeviceChunkStore(prefetch=True)``,
  the default);
* epoch 2, warm         — all chunks resident under the HBM byte budget:
  zero host→device data traffic (uploads happened in epoch 1).

The gap between the OFF and ON rows is bounded by min(upload, compute) per
chunk; the warm row is the steady-state cost.  Over this session's tunneled
link (~30 MB/s) uploads dominate, so epoch 1 is transfer-bound either way
and the warm epoch shows the residency win directly.

Run on the real chip: ``python scripts/bench_prefetch.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WL, BS, SPEECH_DIM, DEPTH = 192, 32, 1024, 10


def build_flagship(bank_size: int):
    from transformer_clip_eeg_tpu.models.registry import (
        build_model,
        load_eeg_encoder,
        load_speech_encoder,
    )

    eeg = load_eeg_encoder("EEGConformerInterleaved", 128, 128, 1, WL, 8, DEPTH)
    speech = load_speech_encoder("convLSTM", 128, 128, 1, WL, 3, SPEECH_DIM, 8)
    return build_model(
        "clip_sim_no_latent_proj", eeg, speech, window_length=WL,
        temperature=0.075, latent_dim=8, bank_size=bank_size,
        lambda_clip_loss=1.0, lambda_sim_loss=0.0, momentum_membank=0.9,
    )


def run_epoch(store, step, state, rng_key):
    """One full epoch through epoch_chunk_batches + the chunk-scan step."""
    n_rows = None
    for item in store.epoch_chunk_batches(shuffle=False, add_eeg=False):
        eeg_c, sp_c, ids_c, idx_m, subs_m, partner_m, n = item
        if n_rows is None:
            n_rows = n
        assert n == n_rows, "benchmark assumes uniform chunks (one program)"
        valid = np.ones(n, bool)
        state, losses = step(
            state, eeg_c, sp_c, ids_c,
            idx_m.astype(np.int32), subs_m.astype(np.int32),
            partner_m.astype(np.int32), valid, rng_key, warmup=False,
        )
    float(jnp.sum(losses["loss_ce"]))  # sync: wait for the full epoch
    return state


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_subjects", type=int, default=16)
    ap.add_argument("--n_stories", type=int, default=3)
    ap.add_argument("--story_seconds", type=int, default=200)
    args = ap.parse_args()

    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.data.fixtures import make_fixture
    from transformer_clip_eeg_tpu.train.device_data import DeviceChunkStore
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )
    from transformer_clip_eeg_tpu.train.steps import make_chunk_scan_step

    root = tempfile.mkdtemp(prefix="bench_prefetch_")
    make_fixture(
        root, n_stories=args.n_stories, n_subjects=args.n_subjects,
        story_seconds=args.story_seconds, speech_dim=SPEECH_DIM,
    )

    def fresh_dataset():
        files = get_train_val_test_files_final(
            root, 0, "wav2vec_19", f"{root}/fold_split.json",
            args.n_subjects,
        )
        return EEGWindowDataset(
            files[0], files[4], WL, WL, batch_size=BS, seed=0
        )

    train = fresh_dataset()
    keys = [k for k in train.batches_keys if "eeg" in train.chunks[k]]
    chunk0 = train.chunks[keys[0]]
    chunk_mb = sum(
        chunk0[f].nbytes for f in ("eeg", train.features_to_load[0])
    ) / 2**20
    print(f"{len(keys)} chunks, ~{chunk_mb:.0f} MB each "
          f"({chunk0['eeg'].shape[0]} subjects -> batches/chunk)")

    bank = train.get_number_of_stimuli_segments()
    model = build_flagship(bank_size=bank)
    tx = make_optimizer("adamw", 1e-3)
    feature = train.features_to_load[0]
    example = (
        chunk0["eeg"][0, :BS].astype(np.float32),
        chunk0[feature][:BS].astype(np.float32),
        np.asarray(chunk0["identifiers"][:BS], np.int32),
    )
    state = init_train_state(model, jax.random.PRNGKey(0), example, tx)
    rng_key = jax.random.PRNGKey(7)
    step = make_chunk_scan_step("clip_sim_no_latent_proj", donate=True)

    # compile warmup on a throwaway store (donated state threads through)
    warm_store = DeviceChunkStore(fresh_dataset(), prefetch=False)
    state = run_epoch(warm_store, step, state, rng_key)
    del warm_store

    results = {}
    for label, prefetch in (("epoch1_off", False), ("epoch1_on", True)):
        store = DeviceChunkStore(fresh_dataset(), prefetch=prefetch)
        t0 = time.time()
        state = run_epoch(store, step, state, rng_key)
        results[label] = time.time() - t0
        if prefetch:  # warm epoch: everything resident, zero uploads
            t0 = time.time()
            state = run_epoch(store, step, state, rng_key)
            results["epoch2_warm"] = time.time() - t0
        print(f"{label}: {results[label]:.2f} s")
    print(f"epoch2_warm: {results['epoch2_warm']:.2f} s")

    out = {
        "metric": "device_data_epoch_seconds",
        "chunk_mb": round(chunk_mb, 1),
        "n_chunks": len(keys),
        **{k: round(v, 3) for k, v in results.items()},
        "prefetch_speedup_cold": round(
            results["epoch1_off"] / results["epoch1_on"], 3
        ),
        "residency_speedup_warm": round(
            results["epoch1_off"] / results["epoch2_warm"], 3
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    raise SystemExit(main())
