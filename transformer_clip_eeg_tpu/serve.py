"""Deployment/serving path: load a trained run and serve embeddings + retrieval.

The reference has no serving story — after training, using the model means
re-running the evaluation script end to end (ref ``train_clip_final.py:
558-601``).  This module packages the deployment workflow as a library (and
``python -m transformer_clip_eeg_tpu.serve`` CLI):

* :class:`InferenceSession` — rebuild the flagship model from a results
  directory (``args.txt`` + orbax checkpoint, no dataset required), compile
  the two embedders once, and stream EEG/speech windows through them in
  fixed-size padded chunks (one compile total per stream).
* :class:`RetrievalIndex` — a device-resident L2-normalized candidate bank;
  top-k retrieval is one ``[Q, D] @ [D, N]`` matmul + ``lax.top_k`` per
  query batch (the pattern of the challenge eval's top-X accuracy, ref
  ``train_clip_helper_functions.py:176-202``, turned into an online API).
* :func:`match_mismatch_decide` — the 2-candidate decision rule of the
  ICASSP task (argmax of diagonal similarities, ref ``:159-164``).

TPU-first notes: everything after host ingest is jitted; chunked embedding
keeps shapes static so nothing recompiles while serving; the index stores a
padded capacity so ``add`` never triggers recompilation of ``topk``.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def build_model_from_config(cfg, bank_size: int):
    """Assemble the model exactly as the Trainer does (train/loop.py), from a
    ``TrainConfig`` alone — serving must not need the training dataset."""
    from transformer_clip_eeg_tpu.models.registry import (
        build_model,
        load_eeg_encoder,
        load_speech_encoder,
    )

    eeg_enc = load_eeg_encoder(
        cfg.eeg_encoder,
        cfg.lstm_units,
        cfg.spatial_filters,
        cfg.number_conv_layers,
        cfg.window_length,
        cfg.latent_dim,
        cfg.attention_depth,
    )
    speech_enc = load_speech_encoder(
        cfg.speech_encoder,
        cfg.lstm_units,
        cfg.spatial_filters,
        cfg.number_conv_layers,
        cfg.window_length,
        cfg.stride_temporal,
        cfg.speech_dimension,
        cfg.latent_dim,
    )
    return build_model(
        cfg.model_arch,
        eeg_enc,
        speech_enc,
        window_length=cfg.window_length,
        temperature=cfg.temperature,
        latent_dim=cfg.latent_dim,
        bank_size=bank_size,
        lambda_clip_loss=cfg.lambda_clip_loss,
        lambda_sim_loss=cfg.lambda_sim_loss,
        momentum_membank=cfg.momentum_membank,
    )


class InferenceSession:
    """A loaded model + compiled embedders, ready to serve.

    ``chunk`` is the fixed serving batch: inputs of any length are padded to
    a multiple of it, so each embedder compiles exactly once.

    ``mesh`` (optional): a ``('data', 'model')`` device mesh — each chunk is
    then sharded over the 'data' axis with the weights replicated, so
    embedding throughput scales over ICI with zero communication (the
    encoders are batch-parallel; results are numerically identical to
    single-device, verified in tests).  ``chunk`` must divide by the data
    axis size.
    """

    def __init__(self, model, variables, chunk: int = 128, mesh=None):
        from transformer_clip_eeg_tpu.train.steps import make_embed_fns

        self.model = model
        self.chunk = chunk
        self.mesh = mesh
        self.cfg = None  # set by from_results_dir
        if mesh is not None:
            from transformer_clip_eeg_tpu.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                replicate,
                replicated,
            )

            n_data = mesh.shape[DATA_AXIS]
            if chunk % n_data != 0:
                raise ValueError(
                    f"chunk {chunk} must divide by the data axis ({n_data})"
                )
            # pin the weights to every device ONCE — otherwise each chunk
            # call would re-broadcast the whole params tree from host
            variables = replicate(mesh, variables)
            shardings = (replicated(mesh), batch_sharding(mesh))
            embed_eeg, embed_speech = make_embed_fns(
                model, in_shardings=shardings
            )
        else:
            embed_eeg, embed_speech = make_embed_fns(model)
            # same once-only upload on one device: checkpoint restore yields
            # numpy leaves, and numpy args re-transfer on EVERY jitted call
            variables = jax.device_put(variables)
        self.variables = variables
        self._embed_eeg, self._embed_speech = embed_eeg, embed_speech

    # -- construction -------------------------------------------------------

    @classmethod
    def from_results_dir(
        cls, results_dir: str, chunk: int = 128, mesh=None
    ) -> "InferenceSession":
        """Load ``args.txt`` + ``checkpoints/model_ckpt`` from a training run.

        The memory-bank size (training-data dependent) is inferred from the
        checkpointed bank itself, so no dataset access is needed.
        """
        from transformer_clip_eeg_tpu.train.checkpoint import (
            CKPT_NAME,
            restore_params_only,
        )
        from transformer_clip_eeg_tpu.train.config import TrainConfig

        cfg = TrainConfig.load(os.path.join(results_dir, "args.txt"))
        # the run's persisted compile_cache_dir round-trips into serving:
        # a serving process restarted against the same results dir
        # deserializes the embedder executables instead of recompiling.
        # An already-configured cache (the serve/server CLI flag, applied
        # before this call, or an env var) wins over the saved value.
        if getattr(cfg, "compile_cache_dir", ""):
            from transformer_clip_eeg_tpu.utils.platform import (
                enable_compile_cache,
                resolve_compile_cache_dir,
            )

            if not jax.config.jax_compilation_cache_dir:
                # "auto" resolves against the run dir's PARENT — the same
                # jit_cache/ sibling training used, so serving deserializes
                # the very executables the training process persisted
                enable_compile_cache(resolve_compile_cache_dir(
                    cfg.compile_cache_dir,
                    os.path.dirname(os.path.abspath(results_dir)),
                ))
        ckpt_path = os.path.join(results_dir, "checkpoints", CKPT_NAME)
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(f"no checkpoint at {ckpt_path}")
        # template-free restore reads the whole payload incl. the optimizer
        # state serving never uses (~2x params of extra I/O) — the price of
        # not knowing the param tree before the model is built; the unused
        # collections are dropped right below
        payload = restore_params_only(ckpt_path)

        membank = payload.get("membank") or {}
        bank_leaves = jax.tree.leaves(membank)  # nested by module path
        if getattr(cfg, "bank_size", 0):
            # the Trainer persists its derived sizing in args.txt — the
            # only faithful source for membank-free archs (clip_kld*,
            # no_contrastive_learning), whose class-count sizing leaves no
            # trace in the checkpoint
            bank_size = int(cfg.bank_size)
        elif bank_leaves:
            bank_size = int(bank_leaves[0].shape[0]) - 1
        else:
            raise ValueError(
                f"cannot size the {cfg.model_arch!r} head: args.txt has no "
                "bank_size (pre-r2 run?) and the checkpoint holds no memory "
                "bank to infer it from; add \"bank_size\": <number of "
                "stimulus segments> to args.txt"
            )
        model = build_model_from_config(cfg, bank_size)

        variables = {"params": payload["params"]}
        for coll in ("membank", "batch_stats"):
            if payload.get(coll):
                variables[coll] = payload[coll]
        session = cls(model, variables, chunk=chunk, mesh=mesh)
        session.cfg = cfg  # run config, for callers that surface model info
        return session

    # -- embedding ----------------------------------------------------------

    def embed_eeg(self, windows: np.ndarray, normalize: bool = False):
        """``[N, T, 64]`` EEG windows → ``[N, D]`` L2-normalized embeddings.

        ``normalize=True`` applies the eval-time MVN contract over the
        (segments, time) axes first (ref train_clip_helper_functions.py:136).
        """
        from transformer_clip_eeg_tpu.eval.match_mismatch import (
            embed_in_chunks,
        )

        windows = np.asarray(windows, np.float32)
        if normalize:
            mu = windows.mean(axis=(0, 1), keepdims=True)
            sd = windows.std(axis=(0, 1), keepdims=True)
            windows = (windows - mu) / np.where(sd == 0, 1.0, sd)
        return embed_in_chunks(
            self._embed_eeg, self.variables, windows, self.chunk
        )

    def embed_speech(self, windows: np.ndarray):
        """``[N, T, F]`` speech-feature windows → ``[N, D]`` embeddings."""
        from transformer_clip_eeg_tpu.eval.match_mismatch import (
            embed_in_chunks,
        )

        return embed_in_chunks(
            self._embed_speech,
            self.variables,
            np.asarray(windows, np.float32),
            self.chunk,
        )


class RetrievalIndex:
    """Device-resident L2-normalized candidate bank with one-matmul top-k.

    ``capacity`` rows are allocated up front (empty rows masked with -inf
    scores) so that growing the bank via :meth:`add` never changes shapes —
    the compiled ``topk`` stays valid for the life of the index.

    ``mesh`` (optional): shard the bank's rows over the 'data' axis.  The
    similarity matmul then runs candidate-parallel on every device (each
    holds ``capacity / n_devices`` rows); GSPMD inserts the one gather the
    global ``top_k`` needs.  Capacity is rounded up to a multiple of the
    axis size.
    """

    def __init__(self, dim: int, capacity: int = 1024, mesh=None):
        self.dim = int(dim)
        self.mesh = mesh
        if mesh is not None:
            from transformer_clip_eeg_tpu.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                replicated,
            )

            n = mesh.shape[DATA_AXIS]
            capacity = int(-(-capacity // n) * n)
            self._bank_sharding = batch_sharding(mesh)  # rows over 'data'
            jit_kw = dict(
                in_shardings=(self._bank_sharding, replicated(mesh),
                              replicated(mesh)),
            )
        else:
            self._bank_sharding = None
            jit_kw = {}
        self.capacity = int(capacity)
        self._bank = jnp.zeros((self.capacity, self.dim), jnp.float32)
        if self._bank_sharding is not None:
            self._bank = jax.device_put(self._bank, self._bank_sharding)
        self.size = 0

        @functools.partial(
            jax.jit, static_argnames=("k",), **jit_kw
        )
        def _topk_scores(bank, queries, size, k):
            sims = queries @ bank.T  # [Q, capacity]
            mask = jnp.arange(bank.shape[0])[None, :] < size
            # top_k inside the same program: one dispatch round-trip per
            # query instead of two (p50 85 → ~45 ms on the tunneled host)
            return jax.lax.top_k(jnp.where(mask, sims, -jnp.inf), k)

        self._topk_scores = _topk_scores

    @classmethod
    def from_embeddings(
        cls,
        embeddings: np.ndarray,
        capacity: Optional[int] = None,
        mesh=None,
    ):
        emb = np.asarray(embeddings, np.float32)
        idx = cls(emb.shape[1], capacity or max(1, emb.shape[0]), mesh=mesh)
        idx.add(emb)
        return idx

    def add(self, embeddings: np.ndarray) -> np.ndarray:
        """Append rows (assumed L2-normalized, as the embedders produce);
        returns their assigned indices."""
        emb = jnp.asarray(embeddings, jnp.float32)
        n = emb.shape[0]
        if self.size + n > self.capacity:
            raise ValueError(
                f"index full: size={self.size}, adding {n}, "
                f"capacity={self.capacity}"
            )
        self._bank = jax.lax.dynamic_update_slice_in_dim(
            self._bank, emb, self.size, 0
        )
        if self._bank_sharding is not None:
            # the eager update may leave the result replicated — pin the
            # bank back to its row sharding so topk stays candidate-parallel
            self._bank = jax.device_put(self._bank, self._bank_sharding)
        ids = np.arange(self.size, self.size + n)
        self.size += n
        return ids

    def topk(self, queries: np.ndarray, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """``[Q, D]`` queries → (scores ``[Q, k]``, indices ``[Q, k]``)."""
        if self.size == 0:
            raise ValueError("index is empty")
        k = min(k, self.size)
        s, i = self._topk_scores(
            self._bank, jnp.asarray(queries, jnp.float32),
            jnp.int32(self.size), k,
        )
        return np.asarray(s), np.asarray(i)


def match_mismatch_decide(
    eeg_emb: np.ndarray, cand_a: np.ndarray, cand_b: np.ndarray
) -> np.ndarray:
    """2-candidate decision per trial: 0 if candidate A matches, else 1
    (argmax over diagonal similarities, ref
    train_clip_helper_functions.py:153-164)."""
    sim_a = np.sum(eeg_emb * cand_a, axis=1)
    sim_b = np.sum(eeg_emb * cand_b, axis=1)
    return (sim_b > sim_a).astype(np.int32)


def main(argv=None) -> int:
    """Batch serving CLI: embed ``.npy`` EEG/speech windows with a trained
    run; optionally retrieve top-k candidates for each EEG window.

    Examples::

        python -m transformer_clip_eeg_tpu.serve \\
            --results_folder results/run_x --eeg windows.npy --out emb.npy
        python -m transformer_clip_eeg_tpu.serve \\
            --results_folder results/run_x --eeg windows.npy \\
            --candidates stim_windows.npy --topk 5 --out retrieval.json
    """
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--results_folder", required=True,
                    help="training run directory (args.txt + checkpoints/)")
    ap.add_argument("--eeg", help=".npy of [N, T, 64] EEG windows")
    ap.add_argument("--speech", help=".npy of [N, T, F] speech windows")
    ap.add_argument("--candidates",
                    help=".npy of [M, T, F] candidate speech windows")
    ap.add_argument("--topk", type=int, default=0)
    ap.add_argument("--mvn", action="store_true",
                    help="apply eval-time MVN normalization to the EEG")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--shard", type=int, default=0,
                    help="shard each chunk over N data-parallel devices "
                         "(0 = single device)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--compile_cache_dir", type=str, default="",
                    help="persistent XLA compilation cache — repeat "
                         "invocations deserialize the embedder programs "
                         "instead of recompiling")
    args = ap.parse_args(argv)

    from transformer_clip_eeg_tpu.utils.platform import (
        enable_compile_cache,
        resolve_compile_cache_dir,
    )

    # 'auto' = the training run's jit_cache/ sibling (same contract as the
    # train CLI), so an explicit --compile_cache_dir auto works here too
    enable_compile_cache(resolve_compile_cache_dir(
        args.compile_cache_dir,
        os.path.dirname(os.path.abspath(args.results_folder)),
    ))

    # retrieval needs the full (--eeg, --candidates, --topk) triple —
    # reject partial combinations instead of silently embedding
    retrieval_flags = (bool(args.topk), bool(args.candidates))
    if any(retrieval_flags) and not (all(retrieval_flags) and args.eeg):
        ap.error(
            "retrieval requires --eeg, --candidates AND --topk together"
        )

    mesh = None
    if args.shard:
        from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.shard)
    sess = InferenceSession.from_results_dir(
        args.results_folder, chunk=args.chunk, mesh=mesh
    )

    if args.topk and args.eeg and args.candidates:
        eeg_emb = sess.embed_eeg(np.load(args.eeg), normalize=args.mvn)
        cand_emb = sess.embed_speech(np.load(args.candidates))
        index = RetrievalIndex.from_embeddings(cand_emb, mesh=mesh)
        scores, ids = index.topk(eeg_emb, args.topk)
        with open(args.out, "w") as f:
            json.dump(
                {
                    "indices": ids.tolist(),
                    "scores": [[float(x) for x in row] for row in scores],
                },
                f,
            )
        print(f"wrote top-{args.topk} retrieval for {len(ids)} queries "
              f"to {args.out}")
        return 0

    if args.eeg and args.speech:
        ap.error(
            "--eeg and --speech are mutually exclusive in embed-only mode "
            "(use --topk with --eeg/--candidates for retrieval)"
        )
    if args.eeg:
        emb = sess.embed_eeg(np.load(args.eeg), normalize=args.mvn)
    elif args.speech:
        emb = sess.embed_speech(np.load(args.speech))
    else:
        ap.error("one of --eeg / --speech is required")  # raises SystemExit
    np.save(args.out, emb)
    print(f"wrote {emb.shape} embeddings to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
