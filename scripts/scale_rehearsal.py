"""SparrKULee-scale dress rehearsal (VERDICT r2 next #1).

Generates a realistic-scale synthetic dataset (the real corpus shape: tens
of stories x ~10 min @64 Hz, ~85 train + 14 test subjects, 1024-dim
wav2vec features, each subject recording a subset of stories — ref
``dataset_loader.py:70-110`` eager ingest, ``helper:383-440`` splits) and
exercises every scale-sensitive path against it:

  gen     build the dataset on disk (idempotent; marker file)
  ingest  host-RAM high-water + wall-clock of the eager dataset ingest,
          for a single fold's train split AND the fold-parallel union
  train   full CLI train (+ optional eval suite) on the current backend;
          reads per-epoch wall-clock from loss.txt
  cv      fold-parallel CV training over the union dataset
  evict   DeviceChunkStore under a deliberately tiny byte budget: eviction
          correctness (loss parity with an ample budget) + thrash cost
          (upload counts, wall-clock)

Each stage runs in its own subprocess so ru_maxrss is per-stage.  Results
append to ``<out>/scale_results.jsonl``; SCALE.md distills them.

Full rehearsal:    python scripts/scale_rehearsal.py --root /data/scale
Small smoke (CI):  SCALE_SMOKE=1 python scripts/scale_rehearsal.py --root /tmp/s
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMOKE = os.environ.get("SCALE_SMOKE", "") == "1"
if SMOKE:
    # 90 s stories hold 30 windows, so smoke runs need --batch_size <= 30
    SHAPE = dict(n_stories=4, n_subjects=5, n_test_subjects=2,
                 story_seconds=90, speech_dim=32, stories_per_subject=3)
else:
    # the real SparrKULee shape (~12 GB on disk here)
    SHAPE = dict(n_stories=15, n_subjects=85, n_test_subjects=14,
                 story_seconds=600, speech_dim=1024, stories_per_subject=10)

# smoke runs shrink the model too — compiling the depth-10 flagship (and
# especially its fold-vmapped twin) on the CPU test backend takes tens of
# minutes, which defeats a smoke
MODEL_FLAGS = (
    ["--attention_depth", "2", "--lstm_units", "16", "--latent_dim", "4"]
    if SMOKE else []
)


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def _emit(out_dir: str, record: dict) -> None:
    record["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(os.path.join(out_dir, "scale_results.jsonl"), "a") as f:
        f.write(line + "\n")


# ---------------------------------------------------------------------------
# stages (each runs as `--stage <name>` in a fresh subprocess)
# ---------------------------------------------------------------------------


def stage_gen(args) -> dict:
    from transformer_clip_eeg_tpu.data.fixtures import (
        make_fixture,
        regen_icassp_testset,
    )

    marker = os.path.join(args.root, ".scale_generated.json")
    if os.path.exists(marker):
        # the corpus itself is expensive and idempotent — keep it.  But the
        # MM eval set regen exists precisely to RE-generate the eval tree
        # of an existing fixture (a new subject count / noise calibration),
        # so mm flags must not be silently ignored by the marker.
        if args.mm_subjects or args.mm_noise is not None:
            regen_icassp_testset(
                args.root, speech_dim=SHAPE["speech_dim"],
                n_subjects=args.mm_subjects or 14,
                noise=12.0 if args.mm_noise is None else args.mm_noise,
                trials=args.mm_trials, env_decodable=args.env_decodable,
                env_gain=args.env_gain,
            )
        with open(marker) as f:
            return {"stage": "gen", "skipped": True, **json.load(f)}
    t0 = time.time()
    shape = dict(SHAPE)
    if args.env_decodable:
        # positive-control corpus (VERDICT r4 #1b): the envelope is
        # linearly present in speech channel 0 AND the EEG mix, so the
        # regression suite must produce materially-positive Pearson
        shape["env_decodable"] = True
        shape["env_gain"] = args.env_gain
    make_fixture(args.root, **shape)
    if args.mm_subjects or args.mm_noise is not None:
        # non-saturating held-out MM eval set (round-4 recipe: 14 subjects,
        # noise std 12 against the unit-variance projected-speech signal,
        # 64 trials/subject — calibrated mid-range, SCALE.md).  noise is
        # compared against None, not truthiness: --mm_noise 0 is a valid
        # request for a noiseless positive-control set
        regen_icassp_testset(
            args.root, speech_dim=shape["speech_dim"],
            n_subjects=args.mm_subjects or 14,
            noise=12.0 if args.mm_noise is None else args.mm_noise,
            trials=args.mm_trials, env_decodable=args.env_decodable,
            env_gain=args.env_gain,
        )
    gen_s = time.time() - t0
    du = subprocess.run(
        ["du", "-sb", args.root], capture_output=True, text=True
    )
    disk_gb = int(du.stdout.split()[0]) / 2**30 if du.returncode == 0 else -1
    info = {"gen_s": round(gen_s, 1), "disk_gb": round(disk_gb, 2), **SHAPE}
    with open(marker, "w") as f:
        json.dump(info, f)
    return {"stage": "gen", **info}


def _discover(root, run, n_subs):
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )

    return get_train_val_test_files_final(
        root, run, "wav2vec_19", os.path.join(root, "fold_split.json"), n_subs
    )


def stage_ingest(args) -> dict:
    """Eager host ingest: single-fold train split, then the fold union."""
    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset

    files = _discover(args.root, 0, SHAPE["n_subjects"])
    out = {"stage": "ingest"}
    t0 = time.time()
    ds = EEGWindowDataset(files[0], files[4], 192, 192,
                          batch_size=args.batch_size)
    out["fold0_train_ingest_s"] = round(time.time() - t0, 1)
    out["fold0_train_rss_gb"] = round(_rss_gb(), 2)
    out["fold0_train_chunks"] = len(ds.batches_keys)
    out["fold0_train_segments"] = ds.get_number_of_stimuli_segments()
    chunk_bytes = sum(
        c["eeg"].nbytes + sum(
            c[k].nbytes for k in ds.features_to_load if k in c
        )
        for c in ds.chunks.values()
        if "eeg" in c
    )
    out["fold0_train_chunk_gb"] = round(chunk_bytes / 2**30, 2)
    del ds

    # the fold-parallel union holds every story of folds 0-8 at once — the
    # worst-case resident set (VERDICT r2 weak #1)
    t0 = time.time()
    union_f, union_a = files[0] + files[1], files[4] + files[5]
    union = EEGWindowDataset(union_f, union_a, 192, 192,
                             batch_size=args.batch_size)
    out["union_ingest_s"] = round(time.time() - t0, 1)
    out["union_rss_gb"] = round(_rss_gb(), 2)
    out["union_chunks"] = len(union.batches_keys)
    return out


def stage_train(args) -> dict:
    from transformer_clip_eeg_tpu.cli import main as cli_main

    results = os.path.join(args.out, "train_run")
    t0 = time.time()
    rc = cli_main([
        "--data_dir", args.root, "--results_folder", results,
        "--run", "0", "--epochs", str(args.epochs),
        "--number_of_training_subjects", str(args.train_subjects),
        "--skip_eval", "yes" if args.skip_eval else "no",
        "--batch_size", str(args.batch_size),
        "--patience", str(args.patience),
        "--chunk_store_dtype", args.chunk_store_dtype,
    ] + MODEL_FLAGS)
    total_s = time.time() - t0
    run_dirs = sorted(os.listdir(results)) if os.path.isdir(results) else []
    out = {
        "stage": "train", "rc": rc, "total_s": round(total_s, 1),
        "rss_gb": round(_rss_gb(), 2),
        "train_subjects": args.train_subjects, "epochs": args.epochs,
    }
    if run_dirs:
        loss_txt = os.path.join(results, run_dirs[-1], "loss.txt")
        if os.path.exists(loss_txt):
            with open(loss_txt) as f:
                epoch_lines = [
                    ln.strip() for ln in f if ln.startswith("epoch ")
                ]
            out["epoch_lines"] = epoch_lines[:12]
    return out


def stage_cv(args) -> dict:
    from transformer_clip_eeg_tpu.cv import main as cv_main

    results = os.path.join(args.out, "cv_run")
    t0 = time.time()
    rc = cv_main([
        "--folds", *[str(f) for f in args.folds], "--parallel", "yes",
        "--results_folder", results,
        "--data_dir", args.root, "--epochs", str(args.epochs),
        "--number_of_training_subjects", str(args.train_subjects),
        "--batch_size", str(args.batch_size),
        "--skip_eval", "yes" if args.skip_eval else "no",
        "--patience", str(args.patience),
        "--chunk_store_dtype", args.chunk_store_dtype,
    ] + MODEL_FLAGS)
    out = {
        "stage": "cv", "rc": rc, "total_s": round(time.time() - t0, 1),
        "rss_gb": round(_rss_gb(), 2), "folds": args.folds,
        "chunk_store_dtype": args.chunk_store_dtype,
        "eval": not args.skip_eval,
    }
    loss_txt = os.path.join(results, "loss.txt")
    if os.path.exists(loss_txt):
        with open(loss_txt) as f:
            out["epoch_lines"] = [
                ln.strip() for ln in f if ln.startswith("epoch ")
            ][:12]
    return out


def stage_evict(args) -> dict:
    """Chunk-store eviction under pressure: a byte budget that holds only
    ~2 chunks must produce the same training losses as an ample budget
    (correctness) while paying re-uploads (thrash cost measured)."""
    import numpy as np

    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.train import device_data as dd

    files = _discover(args.root, 0, min(8, SHAPE["n_subjects"]))
    ds = EEGWindowDataset(files[0], files[4], 192, 192,
                          batch_size=min(args.batch_size, 32), seed=0)

    uploads = {"n": 0, "bytes": 0}
    orig_insert = dd.DeviceChunkStore._insert

    def counting_insert(self, key):
        chunk = self.dataset.chunks[key]
        uploads["n"] += 1
        uploads["bytes"] += chunk["eeg"].nbytes
        return orig_insert(self, key)

    dd.DeviceChunkStore._insert = counting_insert
    out = {"stage": "evict"}
    try:
        runs = {}
        chunk_sizes = [
            ds.chunks[k]["eeg"].nbytes
            + ds.chunks[k][ds.features_to_load[0]].nbytes
            for k in ds.batches_keys
        ]
        tiny = int(2.5 * max(chunk_sizes))
        # warm the gather/stack jit programs once so the first timed leg
        # doesn't carry the compile cost (the legs' walk_s would otherwise
        # compare cold vs warm instead of ample vs tiny)
        from transformer_clip_eeg_tpu.train.device_data import gather_batch

        warm = dd.DeviceChunkStore(ds, max_resident=2)
        for i, (eeg_d, sp_d, ids_d, idx, subs, _p) in enumerate(
            warm.epoch_batches(rng=np.random.default_rng(0), shuffle=False)
        ):
            gather_batch(eeg_d, sp_d, ids_d, idx, subs)["eeg"].block_until_ready()
            if i >= 2:
                break
        del warm
        for label in ("ample", "tiny"):
            store = dd.DeviceChunkStore(ds, max_resident=2)
            # the auto HBM budget is unknowable through the tunneled
            # runtime (memory_stats() absent -> 2-chunk fallback), so both
            # legs pin their budget explicitly: ample = everything
            # resident, tiny = ~2.5 chunks (forced eviction every step)
            store.budget_bytes = (1 << 50) if label == "ample" else tiny
            store.max_resident = None
            uploads["n"] = uploads["bytes"] = 0
            sums = []
            t0 = time.time()
            # index sampling draws from the dataset's own rng — reset it so
            # both runs see identical batch contents
            ds.rng = np.random.default_rng(7)
            for epoch in range(2):
                rng = np.random.default_rng(123)  # same order both runs
                for (eeg_d, sp_d, ids_d, idx, subs, _p) in store.epoch_batches(
                    rng=rng, shuffle=True
                ):
                    from transformer_clip_eeg_tpu.train.device_data import (
                        gather_batch,
                    )

                    batch = gather_batch(eeg_d, sp_d, ids_d, idx, subs)
                    # full-byte digest of BOTH gathered tensors: a sum can
                    # pass with permuted/misplaced rows (ADVICE r3)
                    import hashlib

                    h = hashlib.sha1()
                    h.update(np.ascontiguousarray(batch["eeg"]).tobytes())
                    h.update(np.ascontiguousarray(batch["speech"]).tobytes())
                    h.update(np.ascontiguousarray(batch["ids"]).tobytes())
                    sums.append(h.hexdigest())
            runs[label] = {
                "sums": sums,
                "uploads": uploads["n"],
                "upload_gb": round(uploads["bytes"] / 2**30, 2),
                "walk_s": round(time.time() - t0, 1),
                "budget_gb": round(
                    (store.budget_bytes or 0) / 2**30, 3
                ),
            }
        assert runs["ample"]["sums"] == runs["tiny"]["sums"], (
            "eviction changed gathered batch contents"
        )
        out.update(
            correct=True,
            ample={k: v for k, v in runs["ample"].items() if k != "sums"},
            tiny={k: v for k, v in runs["tiny"].items() if k != "sums"},
            n_chunks=len(ds.batches_keys),
        )
    finally:
        dd.DeviceChunkStore._insert = orig_insert
    return out


STAGES = {
    "gen": stage_gen,
    "ingest": stage_ingest,
    "train": stage_train,
    "cv": stage_cv,
    "evict": stage_evict,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, required=True,
                    help="dataset root (created if absent)")
    ap.add_argument("--out", type=str, default="",
                    help="results dir (default <root>/_scale_out)")
    ap.add_argument("--stage", type=str, default="",
                    help="run ONE stage in-process (used by the driver)")
    ap.add_argument("--stages", type=str, nargs="+",
                    default=["gen", "ingest", "train", "cv", "evict"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--train_subjects", type=int, default=0,
                    help="0 = the dataset's n_subjects")
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--patience", type=int, default=50)
    ap.add_argument("--chunk_store_dtype", type=str, default="float32")
    ap.add_argument("--env_decodable", action="store_true",
                    help="generate the envelope-decodable positive-control "
                         "corpus (VERDICT r4 #1b)")
    ap.add_argument("--env_gain", type=float, default=4.0,
                    help="per-channel strength of the envelope direction "
                         "in the EEG mix (4.0 ≈ 20%% of per-channel "
                         "variance at the 1024-dim scale shape — strong "
                         "enough that an 8-dim contrastive embedding "
                         "retains it)")
    ap.add_argument("--mm_subjects", type=int, default=0,
                    help="regenerate the held-out ICASSP MM set with this "
                         "many subjects (0 = keep make_fixture's default)")
    ap.add_argument("--mm_noise", type=float, default=None,
                    help="EEG noise std for the regenerated MM set "
                         "(round-4 calibration: 12; 0 = noiseless "
                         "positive control; omitted = no regen unless "
                         "--mm_subjects is set)")
    ap.add_argument("--mm_trials", type=int, default=64)
    ap.add_argument("--folds", type=int, nargs="+", default=[0, 1],
                    help="folds for the cv stage")
    # shape overrides: stages that only touch a slice of the corpus (evict
    # ingests <=8 subjects) can run against a right-sized gen — full-size
    # stories/features/chunks without paying the 85-subject EEG volume
    for key, dflt in SHAPE.items():
        ap.add_argument(f"--{key}", type=int, default=dflt)
    args = ap.parse_args()
    for key in SHAPE:
        SHAPE[key] = getattr(args, key)
    args.train_subjects = args.train_subjects or SHAPE["n_subjects"]
    args.out = args.out or os.path.join(args.root, "_scale_out")
    os.makedirs(args.out, exist_ok=True)

    if args.stage:
        rec = STAGES[args.stage](args)
        _emit(args.out, rec)
        return 0

    for stage in args.stages:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--root", args.root, "--out", args.out, "--stage", stage,
               "--epochs", str(args.epochs),
               "--batch_size", str(args.batch_size),
               "--train_subjects", str(args.train_subjects),
               "--patience", str(args.patience),
               "--chunk_store_dtype", args.chunk_store_dtype,
               "--folds", *[str(f) for f in args.folds]]
        for key in SHAPE:
            cmd += [f"--{key}", str(SHAPE[key])]
        if args.skip_eval:
            cmd.append("--skip_eval")
        if args.env_decodable:
            cmd += ["--env_decodable", "--env_gain", str(args.env_gain)]
        if args.mm_subjects or args.mm_noise is not None:
            cmd += ["--mm_subjects", str(args.mm_subjects),
                    "--mm_trials", str(args.mm_trials)]
            if args.mm_noise is not None:
                cmd += ["--mm_noise", str(args.mm_noise)]
        print(f"=== stage {stage} ===", flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc != 0:
            print(f"stage {stage} FAILED rc={rc}")
            return rc
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    raise SystemExit(main())
