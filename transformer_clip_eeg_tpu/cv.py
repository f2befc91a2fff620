"""5-fold cross-validation driver (BASELINE config 5).

The reference trains one fold per invocation (``--run`` selects the
validation fold, ref ``train_clip_final.py:168``); sweeping folds is manual.
This driver runs the full train+eval workflow for each requested fold and
aggregates the per-fold evaluation JSONs into ``cv_summary.json``.

Run: ``python -m transformer_clip_eeg_tpu.cv --data_dir <sparrkulee>
--folds 0 1 2 3 4 [any train_clip flags]``

``--parallel yes`` trains ALL requested folds concurrently in one vmapped
program (``train/fold_parallel.py``) — the per-fold model is far too small
to saturate a chip alone, so fold-parallelism multiplies aggregate
throughput — then runs the per-fold eval suites sequentially.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Dict, List

from transformer_clip_eeg_tpu.utils.platform import trim_host_heap


def _run_parallel(folds: List[int], results_folder: str, passthrough,
                  fold_group_size=None) -> Dict[int, str]:
    """Train all folds concurrently; returns {fold: run_dir}."""
    import dataclasses
    import types

    from transformer_clip_eeg_tpu.cli import build_arg_parser, run_eval_suite
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.train.config import TrainConfig
    from transformer_clip_eeg_tpu.train.fold_parallel import (
        FoldParallelTrainer,
    )

    targs = build_arg_parser().parse_args(list(passthrough))
    if targs.compile_cache_dir is None:
        targs.compile_cache_dir = "auto"  # flag omitted → config default
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    cfg = TrainConfig(
        **{k: v for k, v in vars(targs).items() if k in known}
    )
    cfg.results_folder = results_folder

    files0 = get_train_val_test_files_final(
        cfg.data_dir, folds[0], cfg.stimulus_features, cfg.fold_split_path,
        cfg.number_of_training_subjects, debug=cfg.is_debug,
    )
    union_f, union_a = files0[0] + files0[1], files0[4] + files0[5]
    mesh = None
    if cfg.n_data_shards and cfg.n_data_shards > 1:
        # in fold-parallel mode the 'data' mesh axis shards the FOLD axis
        # (folds are independent — zero-collective scale-out), not the batch
        from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.n_data_shards)
    trainer = FoldParallelTrainer(
        cfg, folds, union_f, union_a, results_folder, mesh=mesh,
        fold_group_size=fold_group_size,
    )
    out = trainer.fit()
    print(
        f"fold-parallel training done: best val loss_ce {out['best_loss']}"
    )

    # free chunk-store HBM and the ~18 GB union dataset's host arrays for
    # the eval suites (each fold re-ingests its own splits; keeping the
    # union resident under nine suites OOM-killed the 2026-08-21 full-scale
    # run on a 125 GB host)
    trainer.release_host_data()
    # per-fold eval suites re-ingest overlapping train/val/test splits —
    # memoize raw file reads across folds (9 x ~8 GB of np.load otherwise)
    from transformer_clip_eeg_tpu.data.dataset import set_ingest_file_cache

    ingest_cache: Dict[str, object] = {}
    set_ingest_file_cache(ingest_cache)
    fold_dirs: Dict[int, str] = {}
    # try/finally: a raising eval suite must not leave the unbounded
    # whole-corpus cache installed in dataset._FILE_CACHE (GBs pinned) or
    # skip the trailing heap trim (ADVICE r4)
    try:
        for fold, d in zip(folds, out["fold_dirs"]):
            fold_dirs[fold] = d
            if targs.skip_eval == "yes":
                continue
            files = get_train_val_test_files_final(
                cfg.data_dir, fold, cfg.stimulus_features,
                cfg.fold_split_path,
                cfg.number_of_training_subjects, debug=cfg.is_debug,
            )
            shim = types.SimpleNamespace(
                model=trainer.model, state=trainer.fold_state(fold),
                mesh=trainer.mesh,
            )
            fold_cfg = TrainConfig(**{**cfg.to_dict(), "run": fold})
            run_eval_suite(
                shim, fold_cfg, d,
                files[0], files[1], files[2], files[4], files[5], files[6],
            )
            # bound the retained heap across the 9-suite loop: when
            # residency crosses half the host, release the cached probe
            # programs + every jitted executable and trim again (costs the
            # next suite a re-trace — seconds against a suite's minutes;
            # without a bound the per-suite retention stacked to an OOM
            # kill at fold 5 on the 20 GB corpus, SCALE.md r4)
            from transformer_clip_eeg_tpu.eval.regression import (
                release_probe_programs,
            )
            from transformer_clip_eeg_tpu.utils.platform import (
                host_mem_total_gb, host_rss_gb,
            )

            rss, total = host_rss_gb(), host_mem_total_gb()
            if total and rss > 0.5 * total:
                print(
                    f"cv eval loop: host RSS {rss:.1f} GB > 50% of "
                    f"{total:.1f} GB — releasing cached programs",
                    flush=True,
                )
                release_probe_programs()
                trim_host_heap()
                print(
                    f"cv eval loop: RSS after release {host_rss_gb():.1f} "
                    "GB", flush=True,
                )
    finally:
        set_ingest_file_cache(None)
        ingest_cache.clear()
        trim_host_heap()
    return fold_dirs


def main(argv=None) -> int:
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    from transformer_clip_eeg_tpu.cli import main as train_main

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    parser.add_argument("--results_folder", type=str, default="results")
    parser.add_argument("--parallel", type=str, default="no",
                        choices=["yes", "no"])
    parser.add_argument(
        "--fold_group_size", type=str, default="",
        help="with --parallel yes: folds per dispatch — an integer divisor "
             "of the fold count, 'auto' (largest divisor that fits HBM), or "
             "empty for all folds at once",
    )
    args, passthrough = parser.parse_known_args(argv)
    fold_group_size = None
    if args.fold_group_size:
        fold_group_size = (
            "auto" if args.fold_group_size == "auto"
            else int(args.fold_group_size)
        )

    if args.parallel == "yes":
        from transformer_clip_eeg_tpu.train.fold_parallel import (
            ensure_scoped_vmem_budget,
        )

        ensure_scoped_vmem_budget()

    fold_dirs: Dict[int, str] = {}
    if args.parallel == "yes":
        fold_dirs = _run_parallel(
            args.folds, args.results_folder, passthrough,
            fold_group_size=fold_group_size,
        )
    else:
        for fold in args.folds:
            print(f"=== fold {fold} ===")
            before = set(glob.glob(os.path.join(args.results_folder, "results_*")))
            rc = train_main(
                ["--run", str(fold), "--results_folder", args.results_folder]
                + list(passthrough)
            )
            if rc != 0:
                print(f"fold {fold} failed with code {rc}")
                return rc
            after = set(glob.glob(os.path.join(args.results_folder, "results_*")))
            new = sorted(after - before)
            if new:
                fold_dirs[fold] = new[-1]

    summary: Dict[str, Dict] = {}
    for fold, rd in fold_dirs.items():
        fold_summary: Dict[str, object] = {"results_dir": rd}
        mm_path = os.path.join(rd, "evaluation_challenge_set_2023_mm.json")
        if os.path.exists(mm_path):
            with open(mm_path) as f:
                mm = json.load(f)
            if mm:
                fold_summary["mm_accuracy_mean"] = sum(mm.values()) / len(mm)
        reg_path = os.path.join(rd, "evaluation_regression_general_model_env.json")
        if os.path.exists(reg_path):
            with open(reg_path) as f:
                reg = json.load(f)
            if reg:
                fold_summary["regression_loss_mean"] = sum(reg.values()) / len(
                    reg
                )
        summary[str(fold)] = fold_summary

    accs: List[float] = [
        s["mm_accuracy_mean"]
        for s in summary.values()
        if "mm_accuracy_mean" in s
    ]
    out = {
        "folds": summary,
        "mm_accuracy_mean_over_folds": sum(accs) / len(accs) if accs else None,
    }
    out_path = os.path.join(args.results_folder, "cv_summary.json")
    os.makedirs(args.results_folder, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
