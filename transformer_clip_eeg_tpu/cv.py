"""5-fold cross-validation driver (BASELINE config 5).

The reference trains one fold per invocation (``--run`` selects the
validation fold, ref ``train_clip_final.py:168``); sweeping folds is manual.
This driver runs the full train+eval workflow for each requested fold and
aggregates the per-fold evaluation JSONs into ``cv_summary.json``.

Run: ``python -m transformer_clip_eeg_tpu.cv --data_dir <sparrkulee>
--folds 0 1 2 3 4 [any train_clip flags]``
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Dict, List


def main(argv=None) -> int:
    from transformer_clip_eeg_tpu.cli import main as train_main

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    parser.add_argument("--results_folder", type=str, default="results")
    args, passthrough = parser.parse_known_args(argv)

    fold_dirs: Dict[int, str] = {}
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
