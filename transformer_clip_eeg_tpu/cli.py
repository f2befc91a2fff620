"""CLI driver — the reference ``train_clip_final.py`` workflow end-to-end.

Same flags, same defaults (ref ``train_clip_final.py:158-218``), same outputs:
a timestamped results directory with ``args.txt``, ``loss.txt``,
``checkpoints/``, and the four post-training evaluation JSON sets
(ref ``:558-601``).  ``--only_evaluate yes`` reloads the saved config from
``--results_folder`` and re-runs the eval suite against the checkpoint
(ref ``:274-285,541-556`` — minus the ``exec``-based rehydration).

Run: ``python -m transformer_clip_eeg_tpu.cli --data_dir <sparrkulee> ...``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Optional

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    """Ref train_clip_final.py:158-218 — flags, defaults, choices verbatim
    (plus TPU extensions at the end)."""
    p = argparse.ArgumentParser(description="Train CLIP model.")
    p.add_argument("--debug", type=str, default="no", choices=["yes", "no"])
    p.add_argument("--only_evaluate", type=str, default="no", choices=["yes", "no"])
    p.add_argument("--results_folder", type=str, default="results")
    p.add_argument("--run", type=int, default=4)
    p.add_argument("--lstm_units", type=int, default=128)
    p.add_argument("--lambda_sim_loss", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--momentum_membank", type=float, default=0.90)
    p.add_argument("--eeg_norm", type=str, default="mvn", choices=["mvn"])
    p.add_argument("--stimulus_features", type=str, default="wav2vec_19")
    p.add_argument(
        "--model_arch",
        type=str,
        default="clip_sim_no_latent_proj",
        choices=[
            "no_contrastive_learning",
            "clip_kld",
            "clip_kld_latent_proj",
            "clip_mp",
            "clip_sim",
            "clip_sim_no_latent_proj",
        ],
    )
    p.add_argument(
        "--speech_encoder",
        type=str,
        default="convLSTM",
        choices=[
            "conformer", "smallConv", "lstm", "convLSTM", "no",
            "double_lstm", "Wav2vecSmallModel",
        ],
    )
    p.add_argument(
        "--eeg_encoder",
        type=str,
        default="EEGConformerInterleaved",
        choices=[
            "EEGConformerInterleaved", "conformer", "convLSTMnew", "convLSTM",
            "vlaai", "lstm", "double_lstm",
        ],
    )
    p.add_argument("--attention_depth", type=int, default=10)
    p.add_argument("--load_pretrain", type=str, default="no", choices=["yes", "no"])
    p.add_argument("--shuffle", type=str, default="yes", choices=["yes", "no"])
    p.add_argument("--shuffle_percentage", type=float, default=1.0)
    p.add_argument("--addEEG", type=str, default="no", choices=["yes", "no"])
    p.add_argument(
        "--data_augmentation",
        type=str,
        default="no",
        choices=[
            "no", "SignFlip", "FTSurrogate", "FrequencyShift",
            "BandstopFilter", "GaussianNoise", "SmoothTimeMask",
            "ChannelsDropout", "ChannelsShuffle",
        ],
    )
    p.add_argument("--data_augmentation_percentage", type=float, default=0.5)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--beta1", type=float, default=0.90)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--use_amsgrad", type=str, default="no", choices=["yes", "no"])
    p.add_argument("--optimizer", type=str, default="adamw", choices=["adam", "adamw"])
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument(
        "--lr_scheduler",
        type=str,
        default="step",
        choices=["no", "plateau", "step", "cosine", "cosine_warmup"],
    )
    p.add_argument("--step_size_scheduler", type=int, default=10)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--number_conv_layers", type=int, default=1)
    p.add_argument("--fun_act", type=str, default="relu")
    p.add_argument("--temperature", type=float, default=0.075)
    p.add_argument(
        "--subject_split",
        type=str,
        default="icassp_testset",
        choices=["within", "heldout", "icassp_testset"],
    )
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--number_of_training_subjects", type=int, default=1000)
    p.add_argument("--lambda_clip_loss", type=float, default=1.0)
    p.add_argument("--latent_dim", type=int, default=8)
    # TPU extensions
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset_split_stories", type=str, default="")
    p.add_argument("--n_data_shards", type=int, default=0,
                   help="0 = single device; N = N-way data-parallel mesh")
    p.add_argument("--speech_dim_override", type=int, default=None)
    p.add_argument("--skip_eval", type=str, default="no", choices=["yes", "no"])
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--data_mode", type=str, default="auto",
                   choices=["auto", "host", "device"],
                   help="batch assembly: device-resident chunk store vs "
                        "host per-batch gathers (auto = device on TPU)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="encoder compute dtype (params/loss stay float32)")
    p.add_argument("--chunk_store_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="device chunk-store storage dtype; bfloat16 halves "
                        "HBM residency + upload bytes (inputs rounded, "
                        "compute stays f32)")
    p.add_argument("--chunk_budget_frac", type=float, default=0.75,
                   help="fraction of free HBM the chunk store may keep "
                        "resident (auto budget)")
    p.add_argument("--prng_impl", type=str, default="rbg",
                   choices=["rbg", "threefry2x32", "unsafe_rbg"],
                   help="jax PRNG for dropout/augmentation streams; rbg is "
                        "+16-20%% step throughput, threefry2x32 restores "
                        "jax-default bit-reproducibility")
    p.add_argument("--loss_log_stream", type=str, default="epoch",
                   choices=["epoch", "batch"],
                   help="per-100-batch loss lines: 'epoch' defers the "
                        "device fetch to end of epoch (no mid-epoch sync; "
                        "default), 'batch' streams live")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache; restarts / "
                        "--only_evaluate / serving deserialize compiled "
                        "programs instead of recompiling (~20-40s saved "
                        "per process on TPU).  'auto' (the default when "
                        "the flag is omitted) = a jit_cache/ sibling of "
                        "the run dir; '' disables.  Under --only_evaluate "
                        "an omitted flag keeps the run's persisted value")
    return p


def find_icassp_folder(data_dir: str, task: str) -> Optional[str]:
    """The reference expects the challenge set next to the data dir
    (ref :561-562); fixtures put it under ``<data_dir>/icassp``.  The
    dataset-local tree wins: a stray sibling
    ``ICASSP-2023-eeg-decoding-challenge-dataset`` from another corpus
    (e.g. two fixtures sharing /tmp) must not shadow the fixture's own
    eval set — its feature dims may not even match the trained model."""
    candidates = [
        os.path.join(data_dir, "icassp", task),
        os.path.join(
            os.path.dirname(data_dir),
            "ICASSP-2023-eeg-decoding-challenge-dataset",
            task,
        ),
    ]
    for c in candidates:
        if os.path.isdir(c):
            return c
    return None


def main(argv=None) -> int:
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
    from transformer_clip_eeg_tpu.data.discovery import (
        get_train_val_test_files_final,
    )
    from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib
    from transformer_clip_eeg_tpu.train.config import TrainConfig
    from transformer_clip_eeg_tpu.train.loop import Trainer, printf

    args = build_arg_parser().parse_args(argv)

    if args.only_evaluate == "yes":
        # reload saved config; args.txt lives in the given results folder
        # (ref :274-285)
        cfg = TrainConfig.load(os.path.join(args.results_folder, "args.txt"))
        results_dir = args.results_folder
        # the eval reload runs in a fresh process and benefits from the
        # persistent compile cache just like a restart — honor a cache dir
        # passed on THIS command line even when the original run saved none
        # (an explicit flag beats the persisted value; ADVICE r2).  The
        # flag default is None = "not passed", so an omitted flag keeps
        # the run's persisted value and an explicit '' disables the cache
        # (a truthiness test could not tell those apart)
        if args.compile_cache_dir is not None:
            cfg.compile_cache_dir = args.compile_cache_dir
    else:
        if args.compile_cache_dir is None:
            args.compile_cache_dir = "auto"  # the TrainConfig default
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        cfg = TrainConfig(
            **{k: v for k, v in vars(args).items() if k in known}
        )
        results_dir = os.path.join(
            cfg.results_folder,
            cfg.results_dir_name(time.strftime("%Y_%m_%d_%H_%M_%S")),
        )

    debug = cfg.is_debug

    (
        train_files, val_files, test_files, test_files_heldout,
        train_audio, val_audio, test_audio, test_audio_heldout,
    ) = get_train_val_test_files_final(
        cfg.data_dir,
        cfg.run,
        cfg.stimulus_features,
        cfg.fold_split_path,
        cfg.number_of_training_subjects,
        debug=debug,
    )
    print(
        f"train files: {len(train_files)}, val: {len(val_files)}, "
        f"test: {len(test_files)}, heldout: {len(test_files_heldout)}"
    )
    if args.only_evaluate != "yes":
        # fail with the real cause up front: on small datasets a fold may
        # contain no stories, and the downstream "no stimulus features"
        # error from the empty dataset misleads (it suggests a feature-name
        # mismatch).  The reference crashes on this too (ZeroDivision in
        # its val-loss average) — just later and less legibly.
        if not val_files:
            raise SystemExit(
                f"validation split is empty: CV fold {cfg.run} matched no "
                f"stories under {cfg.data_dir} (check --run against "
                f"{cfg.fold_split_path})"
            )
        if not train_files:
            # the opposite failure: the chosen fold matched every story,
            # leaving nothing to train on
            raise SystemExit(
                f"train split is empty: every story under {cfg.data_dir} "
                f"fell into CV fold {cfg.run} or the test set (check "
                f"--run against {cfg.fold_split_path})"
            )

    train_ds = EEGWindowDataset(
        train_files,
        train_audio,
        cfg.window_length,
        cfg.hop_length,
        batch_size=cfg.batch_size,
        shuffle=cfg.shuffle_b,
        shuffle_percentage=cfg.shuffle_percentage,
        addEEG=cfg.addEEG_b,
        data_augmentation=cfg.augmentations,
        data_augmentation_probability=cfg.data_augmentation_percentage,
        seed=cfg.seed,
    )
    val_ds = EEGWindowDataset(
        val_files,
        val_audio,
        cfg.window_length,
        cfg.hop_length,
        batch_size=cfg.batch_size,
        seed=cfg.seed,
    )

    # mesh/profiling come from the (persisted) config so --only_evaluate and
    # cv reloads reconstruct the environment the run used (VERDICT r1 #8)
    mesh = None
    if cfg.n_data_shards:
        from transformer_clip_eeg_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=cfg.n_data_shards)

    trainer = Trainer(
        cfg, train_ds, val_ds, results_dir=results_dir, mesh=mesh,
        profile_dir=cfg.profile_dir or None,
    )

    if args.only_evaluate == "yes":
        # orbax first; else a reference torch model.ckpt is ingested
        # directly (ref :541-556 loads the same file) — one command takes a
        # reference results dir (args.txt + checkpoints/model.ckpt) to the
        # eval JSONs
        restored = ckpt_lib.restore_checkpoint(
            trainer.checkpoint_dir, trainer.state
        )
        if restored is None:
            restored = ckpt_lib.restore_torch_checkpoint(
                trainer.checkpoint_dir, trainer.state
            )
        if restored is None:
            print(f"no checkpoint found in {trainer.checkpoint_dir}")
            return 1
        trainer.state = restored
        print(f"loaded model from {trainer.checkpoint_dir}")
    else:
        out = trainer.fit()
        printf(
            f"training done: best val loss_ce {out['best_loss']} at epoch "
            f"{out['best_epoch']}",
            trainer.loss_file,
        )

    if args.skip_eval == "yes":
        return 0

    if hasattr(trainer, "release_host_data"):
        # free chunk-store HBM AND the ingested datasets' host arrays for
        # eval (the suite re-ingests its own splits)
        trainer.release_host_data()
    run_eval_suite(trainer, cfg, results_dir,
                   train_files, val_files, test_files,
                   train_audio, val_audio, test_audio)
    return 0


def run_eval_suite(
    trainer, cfg, results_dir,
    train_files, val_files, test_files,
    train_audio, val_audio, test_audio,
) -> None:
    """The four post-training evaluation blocks (ref :558-601), each dumping
    the same JSON filenames the reference writes."""
    from transformer_clip_eeg_tpu.eval import (
        evaluate_model_challenge_2023_mm,
        evaluate_model_challenge_2023_regression,
        evaluate_model_do_regression_sub_independent,
        evaluate_model_do_regression_sub_specific,
    )

    model = trainer.model
    variables = trainer.state.variables
    # when the run trained on a mesh, the eval suite's embedding extraction
    # shards over the same mesh (identical outputs, all chips busy during
    # the probe-extraction-heavy phase)
    mesh = trainer.mesh

    mm_folder = find_icassp_folder(cfg.data_dir, "TEST_task1_matchmismatch")
    if mm_folder:
        ev, ev_logits, ev_topx, ev_topx_logits = evaluate_model_challenge_2023_mm(
            model, variables, mm_folder, speech_feature=cfg.stimulus_features,
            mesh=mesh,
        )
        for name, obj in [
            ("evaluation_challenge_set_2023_mm.json", ev),
            ("evaluation_challenge_set_2023_mm_logits.json", ev_logits),
            ("evaluation_challenge_set_2023_mm_top_x.json", ev_topx),
            ("evaluation_challenge_set_2023_mm_top_x_logits.json", ev_topx_logits),
        ]:
            with open(os.path.join(results_dir, name), "w") as f:
                json.dump(obj, f)
    else:
        print("no ICASSP task-1 folder found, skipping match-mismatch eval")

    # (the reference hardcodes the regression dataset's batch to 128,
    # ref :496; using the configured batch keeps short test fixtures viable)
    # Both regression blocks embed the SAME corpus — share one
    # ingest+extraction pass between them (SCALE.md: the duplicate
    # re-ingest was most of the eval phase's 4,200 s at SparrKULee scale).
    emb_cache: dict = {}
    evaluate_model_do_regression_sub_specific(
        model, variables, train_files, val_files, test_files,
        train_audio, val_audio, test_audio, results_dir,
        regress_to="env", window_length=cfg.window_length_s, fs=cfg.fs,
        batch_size=cfg.batch_size, mesh=mesh, embeddings_cache=emb_cache,
    )
    evaluate_model_do_regression_sub_independent(
        model, variables, train_files, val_files, test_files,
        train_audio, val_audio, test_audio, results_dir,
        regress_to="env", window_length=cfg.window_length_s, fs=cfg.fs,
        batch_size=cfg.batch_size, mesh=mesh, embeddings_cache=emb_cache,
    )
    emb_cache.clear()

    reg_folder = find_icassp_folder(cfg.data_dir, "TEST_task2_regression")
    if reg_folder:
        ev, ev_sub = evaluate_model_challenge_2023_regression(
            model, variables, results_dir, reg_folder, mesh=mesh
        )
        with open(
            os.path.join(results_dir, "evaluation_challenge_set_2023_regression.json"),
            "w",
        ) as f:
            json.dump(ev, f)
        with open(
            os.path.join(
                results_dir,
                "evaluation_challenge_set_2023_regression_sub_specific.json",
            ),
            "w",
        ) as f:
            json.dump(ev_sub, f)
    else:
        print("no ICASSP task-2 folder found, skipping challenge regression")

    # an eval suite churns tens of GB of short-lived numpy arrays at
    # SparrKULee scale; return the freed glibc heap to the OS so repeated
    # suites (the 9-fold cv --parallel eval loop) don't stack retained
    # RSS into a host OOM — measured 2026-08-21, see trim_host_heap
    from transformer_clip_eeg_tpu.utils.platform import trim_host_heap

    trim_host_heap()


if __name__ == "__main__":
    sys.exit(main())
