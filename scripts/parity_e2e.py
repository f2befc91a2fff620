"""Cross-framework end-to-end training-quality parity experiment.

Trains the reference torch implementation (`/root/reference`, run as-is in
an isolated rig directory) and this framework on the SAME synthetic
SparrKULee fixture with the SAME CLI flags, then compares the downstream
eval metrics both drivers write (match-mismatch accuracy + top-X
retrieval, ref ``train_clip_final.py:558-575``; regression Pearson JSONs,
ref ``:577-601``).

This is the framework-level answer to "module numerics at 2e-4 is not
end-to-end training-quality parity": identical data, identical
architecture/optimizer/schedule flags, independently-seeded training, and
the comparison happens on the reference's own output artifacts.

The reference is executed untouched: its ``.py`` files are symlinked into
a scratch rig dir so its ``__file__``-relative writes (``results/``,
``fold_split.json`` lookup) land in writable scratch instead of the
read-only checkout, and a no-op ``braindecode.augmentation`` shim (the
augmentation flags stay ``no``, so the classes are imported but never
instantiated) satisfies its import. No reference code is copied or edited.

Usage (CPU, ~10-30 min dominated by the reference's torch loop):

    python scripts/parity_e2e.py --workdir /tmp/parity
    python scripts/parity_e2e.py --workdir /tmp/parity --skip_reference yes
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)  # script may be launched from anywhere

BRAINDECODE_SHIM = '''\
"""Import shim so the reference's dataset_loader imports resolve.

braindecode is not installed in this environment.  GaussianNoise — the one
transform the parity configs exercise (--config env_aug) — is reimplemented
here with braindecode's documented semantics (per-example application with
``probability``, additive N(0, std) noise), operating on the reference's
actual batch layout (dataset_loader.py:431 calls ``aug(eeg_batch)`` on a
[bs, wl, 64] tensor).  Every other class stays un-instantiable so an
unexpected use fails loudly rather than silently diverging.
"""

import torch


class GaussianNoise:
    def __init__(self, probability, std=0.16):
        self.probability = probability
        self.std = std

    def __call__(self, X):
        t = X if torch.is_tensor(X) else torch.as_tensor(X)
        mask = torch.rand(t.shape[0]) < self.probability
        noise = torch.randn_like(t) * self.std
        out = torch.where(
            mask.view(-1, *([1] * (t.dim() - 1))), t + noise, t
        )
        return out if torch.is_tensor(X) else out.numpy()


class _NeverInstantiated:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "braindecode shim: only GaussianNoise is implemented for the "
            "parity experiment"
        )


SignFlip = FTSurrogate = FrequencyShift = BandstopFilter = _NeverInstantiated
SmoothTimeMask = _NeverInstantiated
ChannelsDropout = ChannelsShuffle = _NeverInstantiated
'''

# experiment configurations (VERDICT r2 next #2: default + mel + an
# env-stimulus run exercising mixup and on-the-fly augmentation)
CONFIGS = {
    "wav2vec": [],
    "mel": ["--stimulus_features", "mel"],
    "env_aug": ["--stimulus_features", "env", "--addEEG", "yes",
                "--data_augmentation", "GaussianNoise"],
}


def build_fixture(data_dir: str, args) -> None:
    sys.path.insert(0, REPO)
    from transformer_clip_eeg_tpu.data.fixtures import make_fixture

    make_fixture(
        data_dir,
        n_stories=args.stories,
        n_subjects=args.subjects,
        story_seconds=args.story_seconds,
        speech_dim=1024,  # the reference hardcodes wav2vec -> 1024
        seed=args.fixture_seed,
    )
    # the reference resolves the challenge sets at
    # dirname(data_dir)/ICASSP-2023-eeg-decoding-challenge-dataset/TEST_*
    # (train_clip_final.py:560,595); the fixture writes them under
    # data_dir/icassp/ -- bridge with a symlink
    link = os.path.join(
        os.path.dirname(data_dir), "ICASSP-2023-eeg-decoding-challenge-dataset"
    )
    if not os.path.exists(link):
        os.symlink(os.path.join(data_dir, "icassp"), link)


def build_rig(rig_dir: str, data_dir: str) -> None:
    os.makedirs(rig_dir, exist_ok=True)
    for name in os.listdir(REFERENCE):
        if name.endswith(".py"):
            dst = os.path.join(rig_dir, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(REFERENCE, name), dst)
    shutil.copy(
        os.path.join(data_dir, "fold_split.json"),
        os.path.join(rig_dir, "fold_split.json"),
    )
    shim = os.path.join(rig_dir, "braindecode")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(shim, "augmentation.py"), "w") as f:
        f.write(BRAINDECODE_SHIM)


def shared_flags(args, data_dir: str):
    """One flag list both drivers accept (our CLI mirrors the reference's)."""
    return [
        "--data_dir", data_dir,
        "--run", "0",
        "--epochs", str(args.epochs),
        "--patience", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--attention_depth", str(args.depth),
        "--lstm_units", str(args.lstm_units),
        "--latent_dim", str(args.latent_dim),
        "--lr_scheduler", "no",
        "--shuffle", "yes",
        "--shuffle_percentage", "1.0",
        "--data_augmentation", "no",
    ] + (
        ["--number_of_training_subjects", str(args.n_train_subjects)]
        if args.n_train_subjects else []
    ) + CONFIGS[args.config]


def run_reference(rig_dir: str, data_dir: str, args, log_path: str) -> str:
    """Run the untouched reference driver; returns its results dir."""
    results_root = os.path.join(rig_dir, "results")
    before = set(os.listdir(results_root)) if os.path.isdir(results_root) else set()
    # CPython resolves script symlinks when computing sys.path[0], which
    # would make the rig's braindecode shim invisible and point __file__'s
    # results/ dir at the read-only checkout -- bootstrap through runpy
    # with the rig dir pinned instead
    script = os.path.join(rig_dir, "train_clip_final.py")
    bootstrap = (
        "import sys, runpy; "
        f"sys.path.insert(0, {rig_dir!r}); "
        f"sys.argv = [{script!r}] + sys.argv[1:]; "
        f"runpy.run_path({script!r}, run_name='__main__')"
    )
    cmd = [sys.executable, "-c", bootstrap] + shared_flags(args, data_dir)
    env = dict(os.environ, CUDA_VISIBLE_DEVICES="", OMP_NUM_THREADS="1")
    with open(log_path, "w") as log:
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=rig_dir, stdout=log, stderr=subprocess.STDOUT, env=env)
        dt = time.time() - t0
    new = sorted(set(os.listdir(results_root)) - before)
    if not new:
        raise RuntimeError(f"reference produced no results dir (rc={rc}), see {log_path}")
    out = os.path.join(results_root, new[-1])
    if rc != 0:
        # the reference's sub-independent regression eval crashes on its own
        # loader/eval batch mismatch (train_clip_helper_functions.py:508-519
        # skips every batch -> torch.cat([]) at :948); the MM eval JSONs are
        # written before that point, so a nonzero rc with MM artifacts
        # present is the reference's expected behavior, not a rig failure
        if not os.path.exists(
            os.path.join(out, "evaluation_challenge_set_2023_mm.json")
        ):
            raise RuntimeError(
                f"reference driver failed before the MM eval rc={rc}, "
                f"see {log_path}"
            )
        print(f"reference rc={rc} (known sub-independent eval crash, "
              "MM artifacts written)")
    print(f"reference done in {dt:.0f}s -> {new[-1]}")
    return out


METRICS = (
    "mm_mean_accuracy", "mm_top1_retrieval",
    "regression_general_mean_pearson",
)


def _stats(values):
    """mean, 95% t-CI half-width, n."""
    import numpy as np

    v = np.asarray([x for x in values if x is not None], float)
    if v.size == 0:
        return None
    if v.size == 1:
        return {"mean": float(v[0]), "ci95": None, "n": 1}
    try:
        from scipy import stats as st

        hw = float(
            st.t.ppf(0.975, v.size - 1) * v.std(ddof=1) / np.sqrt(v.size)
        )
    except Exception:
        hw = float(1.96 * v.std(ddof=1) / np.sqrt(v.size))
    return {"mean": float(v.mean()), "ci95": hw, "n": int(v.size)}


def _welch(a, b):
    """Welch's two-sample t-test p-value (None when either side is thin)."""
    import numpy as np

    a = np.asarray([x for x in a if x is not None], float)
    b = np.asarray([x for x in b if x is not None], float)
    if a.size < 2 or b.size < 2:
        return None
    try:
        from scipy import stats as st

        return float(st.ttest_ind(a, b, equal_var=False).pvalue)
    except Exception:
        return None


def run_ours(workdir: str, data_dir: str, args, log_path: str) -> str:
    results_root = os.path.join(workdir, "ours_results")
    os.makedirs(results_root, exist_ok=True)
    before = set(os.listdir(results_root))
    if args.ours_platform == "cpu":
        # force CPU (env JAX_PLATFORMS is not honored on this host; config)
        snippet = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from transformer_clip_eeg_tpu.cli import main; "
            "sys.exit(main())"
        )
    else:  # the ambient platform (the real chip on this host)
        snippet = (
            "import sys; from transformer_clip_eeg_tpu.cli import main; "
            "sys.exit(main())"
        )
    cmd = [sys.executable, "-c", snippet] + shared_flags(args, data_dir) + [
        "--results_folder", results_root,
        # ours-only: the reference has no seed flag (it runs unseeded, so
        # its spread comes for free; ours needs explicit seeds)
        "--seed", str(args.ours_seed),
    ]
    # the CLI makes env JAX_PLATFORMS authoritative (utils/platform.py), so
    # the inherited axon preset must be overridden here too
    env = dict(os.environ)
    if args.ours_platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    with open(log_path, "w") as log:
        t0 = time.time()
        rc = subprocess.call(
            cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT, env=env
        )
        dt = time.time() - t0
    if rc != 0:
        raise RuntimeError(f"our driver failed rc={rc}, see {log_path}")
    new = sorted(set(os.listdir(results_root)) - before)
    print(f"ours done in {dt:.0f}s -> {new[-1]}")
    return os.path.join(results_root, new[-1])


def collect(results_dir: str) -> dict:
    out = {"results_dir": results_dir}
    # loss-descent trajectory: both drivers write the identical
    # 'validation epoch E: mean loss ce : V, ...' lines to loss.txt
    # (ref train_clip_final.py:529 / train/loop.py:531)
    loss_txt = os.path.join(results_dir, "loss.txt")
    if os.path.exists(loss_txt):
        val_ce = []
        with open(loss_txt) as f:
            for line in f:
                if line.startswith("validation epoch"):
                    try:
                        val_ce.append(
                            float(line.split("mean loss ce :")[1]
                                  .split(",")[0])
                        )
                    except (IndexError, ValueError):
                        pass
        if val_ce:
            out["val_ce_per_epoch"] = val_ce
    mm = os.path.join(results_dir, "evaluation_challenge_set_2023_mm.json")
    if os.path.exists(mm):
        with open(mm) as f:
            accs = list(json.load(f).values())
        if accs:
            out["mm_mean_accuracy"] = sum(accs) / len(accs)
            out["mm_n_subjects"] = len(accs)
    topx = os.path.join(results_dir, "evaluation_challenge_set_2023_mm_top_x.json")
    if os.path.exists(topx):
        with open(topx) as f:
            per_sub = json.load(f).values()
        tops = [c[0] for c in per_sub]
        if tops:
            out["mm_top1_retrieval"] = sum(tops) / len(tops)
    reg = os.path.join(
        results_dir, "evaluation_regression_general_model_env.json"
    )
    if os.path.exists(reg):
        with open(reg) as f:
            vals = [v for v in json.load(f).values()
                    if isinstance(v, (int, float))]
        if vals:
            out["regression_general_mean_pearson"] = sum(vals) / len(vals)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/parity")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--lstm_units", type=int, default=16)
    ap.add_argument("--latent_dim", type=int, default=4)
    ap.add_argument("--stories", type=int, default=4)
    ap.add_argument("--subjects", type=int, default=3)
    ap.add_argument("--story_seconds", type=int, default=90)
    ap.add_argument("--fixture_seed", type=int, default=3)
    ap.add_argument("--ours_seed", type=int, default=0,
                    help="base seed; run i uses ours_seed + i")
    ap.add_argument("--runs", type=int, default=1,
                    help="independent training runs per side (>=10 for the "
                         "CI-grade comparison; the reference is unseeded so "
                         "its spread comes for free, ours varies --seed)")
    ap.add_argument("--config", default="wav2vec", choices=sorted(CONFIGS))
    ap.add_argument("--skip_reference", default="no", choices=["yes", "no"])
    ap.add_argument("--skip_ours", default="no", choices=["yes", "no"])
    ap.add_argument("--data_dir", default="",
                    help="use an existing corpus root (e.g. the 20 GB scale "
                         "rehearsal corpus) instead of generating a fixture "
                         "— the flagship-shape parity run (VERDICT r3 #5)")
    ap.add_argument("--n_train_subjects", type=int, default=0,
                    help="pass --number_of_training_subjects to BOTH "
                         "drivers: slices the corpus to the first N train "
                         "subjects so the reference's eager CPU ingest and "
                         "epoch stay tractable at flagship shape")
    ap.add_argument("--ours_platform", default="cpu",
                    choices=["cpu", "ambient"],
                    help="'ambient' runs our side on the host's default "
                         "platform (the real TPU here) instead of CPU")
    ap.add_argument("--tag", default="",
                    help="suffix for the summary file so shape variants "
                         "(e.g. flagship) don't merge into the depth-2 "
                         "summaries")
    args = ap.parse_args(argv)

    workdir = args.workdir
    data_dir = args.data_dir or os.path.join(workdir, "data")
    rig_dir = os.path.join(workdir, "rig")
    os.makedirs(workdir, exist_ok=True)

    if args.data_dir:
        # existing corpus: just make sure the reference can resolve the
        # challenge sets next to it (train_clip_final.py:560,595)
        link = os.path.join(
            os.path.dirname(data_dir),
            "ICASSP-2023-eeg-decoding-challenge-dataset",
        )
        if not os.path.exists(link):
            os.symlink(os.path.join(data_dir, "icassp"), link)
    elif not os.path.exists(os.path.join(data_dir, "fold_split.json")):
        print("building fixture ...")
        build_fixture(data_dir, args)
    build_rig(rig_dir, data_dir)

    tag = f"_{args.tag}" if args.tag else ""
    summary_path = os.path.join(workdir, f"summary_{args.config}{tag}.json")
    summary = {"config": args.config}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    summary.setdefault("reference_runs", [])
    summary.setdefault("ours_runs", [])

    for i in range(args.runs):
        if args.skip_reference != "yes":
            ref_dir = run_reference(
                rig_dir, data_dir, args,
                os.path.join(workdir, f"reference_{args.config}_{i}.log"),
            )
            summary["reference_runs"].append(collect(ref_dir))
        if args.skip_ours != "yes":
            base = args.ours_seed
            args.ours_seed = base + i
            ours_dir = run_ours(
                workdir, data_dir, args,
                os.path.join(workdir, f"ours_{args.config}_{i}.log"),
            )
            args.ours_seed = base
            summary["ours_runs"].append(collect(ours_dir))
        # persist incrementally so a killed sweep keeps finished runs
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=2)

    summary["stats"] = {}
    for m in METRICS:
        ref_vals = [r.get(m) for r in summary["reference_runs"]]
        our_vals = [r.get(m) for r in summary["ours_runs"]]
        summary["stats"][m] = {
            "reference": _stats(ref_vals),
            "ours": _stats(our_vals),
            "welch_p": _welch(ref_vals, our_vals),
        }
    summary["flags"] = shared_flags(args, data_dir)
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["stats"], indent=2))
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    raise SystemExit(main())
