"""wav2vec2 extraction dress rehearsal (VERDICT r2 next #8).

Builds a synthetic full-size stimulus set (default 50 stories x 15 min of
48 kHz audio in the reference's ``stimuli/eeg/*.npz.gz`` layout, ref
``create_wav2vec.py:128-158``), then runs the real extraction CLI
(``python -m transformer_clip_eeg_tpu.preprocess.wav2vec``) against it
with the FULL XLSR-53 architecture (randomly initialized — the trained
checkpoint is not downloadable in this environment; throughput and memory
are weight-independent).  Exercises and records:

  * end-to-end wall-clock minutes and audio-seconds/s for the whole set
  * idempotent mid-run resume: the first pass is killed after --kill_after
    seconds; the second pass must skip completed stories and finish
  * the bf16 feature delta at full scale (one story re-extracted in
    bfloat16 and compared)

Run on the real chip:
    python scripts/wav2vec_rehearsal.py --root /tmp/w2v_scale
CPU smoke:
    W2V_SMOKE=1 python scripts/wav2vec_rehearsal.py --root /tmp/w2v_smoke
Appends JSON records to <root>/rehearsal.jsonl.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMOKE = os.environ.get("W2V_SMOKE", "") == "1"
SR = 48000  # the reference stimuli are 48 kHz (resampled to 16 k on load)

if SMOKE:
    N_STORIES, STORY_MIN = 3, 0.1
    HF_KW = dict(  # tiny transformer
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2,
        vocab_size=32, do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    LAYERS = [1]
else:
    # story count overridable (W2V_STORIES) so a time-boxed session can
    # still run the FULL XLSR-53 architecture at full story length on a
    # smaller set; audio-s/s and the resume/bf16 checks are story-count
    # independent
    N_STORIES = int(os.environ.get("W2V_STORIES", "50"))
    STORY_MIN = 15.0
    HF_KW = None  # full XLSR-53 shape from the default HF config below
    LAYERS = [19]


def build_model_dir(path: str) -> str:
    """A local HF checkpoint dir with the XLSR-53 architecture (random
    init — weights are not downloadable here; speed is weight-independent)."""
    if os.path.exists(os.path.join(path, "config.json")):
        return path
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    if HF_KW is not None:
        cfg = Wav2Vec2Config(**HF_KW)
    else:
        # XLSR-53 large: 24 layers, 1024 hidden, 16 heads, 4096 FFN,
        # layer-norm-first (do_stable_layer_norm) with layer feat norm
        cfg = Wav2Vec2Config(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, do_stable_layer_norm=True,
            feat_extract_norm="layer", vocab_size=48,
        )
    torch.manual_seed(0)
    model = Wav2Vec2ForCTC(cfg)
    model.save_pretrained(path)
    return path


def build_stimuli(root: str) -> dict:
    """The reference download-tree layout: stimuli/eeg/*.npz.gz with an
    'audio' array + 'fs' (ref create_wav2vec.py:154-155, load path :66-73)."""
    import numpy as np

    stim_dir = os.path.join(root, "stimuli", "eeg")
    os.makedirs(stim_dir, exist_ok=True)
    n_samples = int(STORY_MIN * 60 * SR)
    t0 = time.time()
    made = 0
    rng = np.random.default_rng(0)
    for i in range(N_STORIES):
        out = os.path.join(stim_dir, f"rehearsal_story_{i:03d}.npz.gz")
        if os.path.exists(out):
            continue
        audio = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
        tmp = out[:-3]
        np.savez(tmp[:-4] + ".npz", audio=audio, fs=SR)
        with open(tmp, "rb") as f_in, gzip.open(
            out, "wb", compresslevel=1
        ) as f_out:
            shutil.copyfileobj(f_in, f_out)
        os.remove(tmp)
        made += 1
    return {
        "stories": N_STORIES, "story_min": STORY_MIN, "generated": made,
        "gen_s": round(time.time() - t0, 1),
    }


def run_cli(root: str, model_dir: str, dtype: str, timeout_s=None) -> dict:
    cmd = [
        sys.executable, "-m", "transformer_clip_eeg_tpu.preprocess.wav2vec",
        "--dataset_root", root, "--model_path", model_dir,
        "--layers", *[str(x) for x in LAYERS], "--dtype", dtype,
        # split the forward into frontend + encoder programs: this
        # session's remote-compile service compiles each half (~210 s /
        # ~60 s) but hangs >20 min on the fused program (both unrolled
        # AND scanned variants — measured round 5); numerics identical
        # (tests/test_wav2vec_extraction.py::test_split_programs_*)
        "--split_programs", "yes",
    ]
    # persistent compile cache shared between the killed first pass and the
    # resume pass: a production operator restarting extraction would have
    # one, and without it the resume pays the full XLSR trace+compile again
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(root, "jit_cache"))
    t0 = time.time()
    # stream CLI output to a file (not PIPE) so long passes can be monitored
    # and a wedged pass is distinguishable from a slow one
    log_path = os.path.join(root, f"cli_{dtype}.log")
    try:
        with open(log_path, "a") as log_f:
            proc = subprocess.run(
                cmd, cwd=REPO, timeout=timeout_s, stdout=log_f,
                stderr=subprocess.STDOUT, text=True, env=env,
            )
        rc, killed = proc.returncode, False
    except subprocess.TimeoutExpired:
        rc, killed = -1, True
    with open(log_path) as f:
        tail = f.read()[-800:]
    done = len(glob.glob(os.path.join(
        root, "derivatives", "preprocessed_stimuli",
        f"*_-_wav2vec_{LAYERS[0]}.npy",
    )))
    return {
        "rc": rc, "killed": killed, "wall_s": round(time.time() - t0, 1),
        "stories_done": done, "tail": tail if rc not in (0, -1) else "",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--kill_after", type=float,
                    default=20 if SMOKE else 180,
                    help="seconds before the first pass is killed (resume "
                         "rehearsal); 0 = single uninterrupted pass")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    results_path = os.path.join(args.root, "rehearsal.jsonl")

    def emit(rec):
        rec["ts"] = time.strftime("%H:%M:%S")
        print(json.dumps(rec), flush=True)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    emit({"stage": "gen", **build_stimuli(args.root)})
    model_dir = build_model_dir(os.path.join(args.root, "hf_model"))

    total_audio_s = N_STORIES * STORY_MIN * 60
    if args.kill_after:
        first = run_cli(args.root, model_dir, "float32",
                        timeout_s=args.kill_after)
        emit({"stage": "first_pass_killed", **first})
        assert first["killed"] or first["rc"] == 0
    resume = run_cli(args.root, model_dir, "float32")
    emit({
        "stage": "resume_to_completion", **resume,
        "audio_s_per_s_incl_startup": round(
            total_audio_s / max(resume["wall_s"], 1e-9), 1
        ),
    })
    assert resume["rc"] == 0 and resume["stories_done"] == N_STORIES, resume

    # bf16 delta at full scale: re-extract ONE story in bf16 and compare
    import numpy as np

    feat_dir = os.path.join(args.root, "derivatives", "preprocessed_stimuli")
    story = sorted(glob.glob(os.path.join(
        feat_dir, f"*_-_wav2vec_{LAYERS[0]}.npy"
    )))[0]
    f32 = np.load(story)
    bf_root = os.path.join(args.root, "bf16_check")
    os.makedirs(os.path.join(bf_root, "stimuli", "eeg"), exist_ok=True)
    src = sorted(glob.glob(os.path.join(
        args.root, "stimuli", "eeg", "*.npz.gz"
    )))[0]
    shutil.copy(src, os.path.join(bf_root, "stimuli", "eeg",
                                  os.path.basename(src)))
    bf_run = run_cli(bf_root, model_dir, "bfloat16")
    bf16 = np.load(os.path.join(
        bf_root, "derivatives", "preprocessed_stimuli",
        os.path.basename(story),
    ))
    denom = max(float(np.abs(f32).mean()), 1e-9)
    emit({
        "stage": "bf16_delta", "bf16_wall_s": bf_run["wall_s"],
        "mean_abs_delta": float(np.abs(f32 - bf16).mean()),
        "rel_to_mean_abs": round(
            float(np.abs(f32 - bf16).mean()) / denom, 4
        ),
    })
    return 0


if __name__ == "__main__":
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    raise SystemExit(main())
