"""Fold-parallel cross-validation training: all folds in one vmapped program.

The reference trains one CV fold per invocation (``--run`` selects the
validation story fold, ref ``train_clip_final.py:168``; folds defined by
``fold_split.json``) — a 5-fold sweep is five sequential runs.  On TPU the
flagship model (<10 M params, batch 128) leaves the chip underutilized
(single-model throughput is flat beyond batch 128 — PERF.md batch table), so
fold-parallelism is the scaling axis that actually buys throughput: the
per-fold train step is ``vmap``-ed over a stacked fold axis and every
dispatch trains ALL folds at once.

Design:

* ONE union dataset holds every story of CV folds 0–8 (each fold's train
  set is the union minus its val stories, ref
  ``train_clip_helper_functions.py:392-398``), chunked/windowed once and
  uploaded to the device once via ``DeviceChunkStore``.
* The epoch walks a SHARED shuffled chunk order.  For each chunk, each fold
  draws its own batch indices with its own sampling rng (exact reference
  sampling semantics, ``dataset.create_eeg_indices``) **iff** the chunk's
  story is in that fold's train split; other folds are masked out with the
  same valid-row state-revert mechanism the chunk-scan step uses.
* States (params, optimizer, memory bank, batch stats) are stacked ``[F,
  ...]``; one ``lax.scan`` over the chunk's batch list with a ``vmap`` over
  folds inside runs the whole chunk for every fold in ONE dispatch.
* Validation runs the same way over each fold's val chunks (memory bank
  still EMA-updates, gated per fold, as the reference's eval forward does).
* Per-fold early stopping freezes a finished fold (its valid mask goes
  False — state stops changing) while the others train on; per-fold
  best-on-val-CE states are kept stacked and unstacked into per-fold
  results dirs at the end (``results_root/fold_{f}/`` with ``args.txt``,
  ``loss.txt``, ``checkpoints/``).

Semantics note vs sequential ``Trainer``: segment identifiers are numbered
over the union dataset, so validation memory-bank updates land on the val
stories' own rows.  The sequential path numbers train and val datasets
independently (ids restart at 1, ref ``dataset_loader.py:270-272``), so its
val updates collide with train rows — a reference quirk this trainer does
not reproduce.  Within the fold-parallel schedule, per-fold numerics are
identical to running each fold alone (``tests/test_fold_parallel.py``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib
from transformer_clip_eeg_tpu.train.config import TrainConfig
from transformer_clip_eeg_tpu.train.device_data import (
    DeviceChunkStore,
    gather_batch,
)
from transformer_clip_eeg_tpu.train.loop import printf
from transformer_clip_eeg_tpu.train.schedulers import make_scheduler
from transformer_clip_eeg_tpu.train.state import (
    count_params,
    init_train_state,
    make_optimizer,
)
from transformer_clip_eeg_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)

Array = jax.Array


def ensure_scoped_vmem_budget() -> None:
    """Raise libtpu's scoped-VMEM limit for the vmapped Pallas backward.

    The fold-vmapped Pallas block backward stages fold-sliced operands on
    the scoped-VMEM stack; the default 16 MiB limit overflows at the
    flagship depth (measured 25.1 MiB via scripts/bench_folds.py).  Env
    vars must be set before TPU *backend init* (the first jax.devices() /
    make_mesh call loads libtpu) — this module sets it at import time, and
    CLI entry points call it explicitly before touching the backend.  No-op
    when a limit is already configured or on non-TPU backends (libtpu
    ignores the variable there).
    """
    flag = "--xla_tpu_scoped_vmem_limit_kib=49152"
    init_args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "scoped_vmem_limit" not in init_args:
        os.environ["LIBTPU_INIT_ARGS"] = f"{init_args} {flag}".strip()


# The deadline for LIBTPU_INIT_ARGS is TPU *backend init* (e.g. the first
# jax.devices()/make_mesh call), which library users may reach before
# constructing a trainer — so set the budget at import time too.  The
# in-constructor call remains as a belt-and-braces for exotic import orders.
ensure_scoped_vmem_budget()


def _select(valid_f: Array, new, old):
    """Per-fold state select: keep ``new`` where ``valid_f`` (shape [F])."""
    return jax.tree.map(
        lambda a, b: jnp.where(
            valid_f.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        ),
        new,
        old,
    )


def _fold_shard_map(scan_step, mesh, row_args: int, trailing_rng: bool):
    """Wrap a fold-scan body in :func:`jax.shard_map` over the 'data' axis.

    Why manual SPMD and not GSPMD sharding annotations: a ``vmap``-ed
    convolution carries the fold axis into the kernel operand (a grouped
    conv), and XLA's SPMD partitioner computes WRONG VALUES when that group
    axis is sharded (reproduced on CPU, jax 0.9: vmapped
    ``lax.conv_general_dilated`` with the vmap axis sharded diverges by
    O(10) absolute from the unsharded program — fold data crosses between
    groups).  ``shard_map`` gives each device its local fold slice and runs
    the ordinary unpartitioned per-fold program — bit-identical per-fold
    numerics by construction, and zero collectives since folds are
    independent.

    Spec layout (matching the scan-step signatures below): arg 0 is the
    fold-stacked state (leading F axis on every leaf), args 1-3 are the
    replicated chunk arrays, the remaining array args are ``[n_rows, F,
    ...]`` index/valid matrices, and a trailing replicated rng key may
    follow.  Losses come back ``{k: [n_rows, F]}``.
    """
    from jax.sharding import PartitionSpec

    from transformer_clip_eeg_tpu.parallel.mesh import DATA_AXIS

    fold = PartitionSpec(DATA_AXIS)
    rows = PartitionSpec(None, DATA_AXIS)
    rep = PartitionSpec()
    # (states, eeg_chunk, speech_chunk, ids_chunk, *row_matrices[, rng])
    in_specs = [fold, rep, rep, rep] + [rows] * row_args
    if trailing_rng:
        in_specs.append(rep)
    return jax.shard_map(
        scan_step,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(fold, rows),
        check_vma=False,
    )


def make_fold_scan_step(
    model_arch: str,
    augmentations: Sequence[str] = (),
    augmentation_probability: float = 0.5,
    add_eeg: bool = False,
    donate: bool = True,
    compute_dtype=None,
    mesh=None,
) -> callable:
    """All folds × all of a chunk's batches in ONE dispatch.

    ``step(states, eeg_chunk, speech_chunk, ids_chunk, idx_mat [n, F, bs],
    subs_mat [n, F, bs], partner_mat [n, F, bs], valid [n, F], rng, warmup)
    -> (states, losses {k: [n, F]})`` where ``states`` is a fold-stacked
    :class:`TrainState`.  ``valid[i, f] == 0`` runs fold f's step but keeps
    its pre-step state (row padding / fold not training on this chunk).

    With ``mesh``, the fold axis is sharded over the mesh's 'data' axis via
    :func:`jax.shard_map` (see :func:`_fold_shard_map` for why not GSPMD) —
    one fold group per device, chunk data replicated.
    """
    base = make_train_step(
        model_arch,
        augmentations,
        augmentation_probability,
        add_eeg,
        donate=False,
        compute_dtype=compute_dtype,
    )

    def make_scan(warmup: bool):
        def scan_step(
            states, eeg_chunk, speech_chunk, ids_chunk, idx_mat, subs_mat,
            partner_mat, valid, rng,
        ):
            def body(sts, inp):
                idx, subs, partner, v = inp  # [F, bs], [F]

                def per_fold(st, idx_f, subs_f, partner_f):
                    batch = gather_batch(
                        eeg_chunk, speech_chunk, ids_chunk, idx_f, subs_f,
                        add_eeg=add_eeg, partner=partner_f,
                    )
                    return base(st, batch, rng, warmup=warmup)

                new_sts, losses = jax.vmap(per_fold)(sts, idx, subs, partner)
                return _select(v, new_sts, sts), losses

            return jax.lax.scan(
                body, states, (idx_mat, subs_mat, partner_mat, valid)
            )

        return scan_step

    def step(states, eeg_chunk, speech_chunk, ids_chunk, idx_mat, subs_mat,
             partner_mat, valid, rng, warmup: bool):
        fn = make_scan(warmup)
        if mesh is not None:
            fn = _fold_shard_map(fn, mesh, row_args=4, trailing_rng=True)
        return fn(states, eeg_chunk, speech_chunk, ids_chunk, idx_mat,
                  subs_mat, partner_mat, valid, rng)

    return jax.jit(
        step,
        static_argnames=("warmup",),
        donate_argnums=(0,) if donate else (),
    )


def make_fold_eval_scan_step(
    model_arch: str, donate: bool = True, mesh=None
) -> callable:
    """Validation twin of :func:`make_fold_scan_step` (no grads; memory bank
    still updates, gated per fold by ``valid``)."""
    base = make_eval_step(model_arch, donate=False)

    def scan_step(states, eeg_chunk, speech_chunk, ids_chunk, idx_mat,
                  subs_mat, valid):
        def body(sts, inp):
            idx, subs, v = inp

            def per_fold(st, idx_f, subs_f):
                batch = gather_batch(
                    eeg_chunk, speech_chunk, ids_chunk, idx_f, subs_f
                )
                return base(st, batch)

            new_sts, losses = jax.vmap(per_fold)(sts, idx, subs)
            return _select(v, new_sts, sts), losses

        return jax.lax.scan(body, states, (idx_mat, subs_mat, valid))

    fn = (
        _fold_shard_map(scan_step, mesh, row_args=3, trailing_rng=False)
        if mesh is not None
        else scan_step
    )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def _story_of_chunk_key(key: str) -> str:
    return key.rsplit("_batch_", 1)[0]


def fold_scan_rng(seed: int) -> Array:
    """Dropout/augment rng for the fold-vmapped steps — ALWAYS threefry-typed.

    The fold scan steps ``vmap`` the train step over folds with per-fold
    keys: the step folds each fold's own ``state.step`` into the key, and
    fold step counters desync as folds skip chunks outside their train
    split.  threefry's batching rule is exact — a vmapped draw equals the
    same key's unbatched draw — so each fold's stream is independent of how
    many folds train alongside it and of its position in the stack.  The
    'rbg' impl (``TrainConfig.prng_impl``, the sequential Trainer's default
    for its +16–20% step throughput) does NOT have that property: under
    ``vmap``, XLA's ``RngBitGenerator`` gives rows ≥ 1 different bits than
    the same key draws unbatched (pinned by
    ``tests/test_prng_impl.py::test_rbg_bits_under_vmap_are_position_dependent``),
    which would make a fold's numerics depend on which other folds share the
    program — breaking the fold-isolation guarantee
    (``tests/test_fold_parallel.py::test_fold_parallel_isolates_folds``).
    The typed key carries its impl with it, overriding the global default
    the trainer configures, so only bit *generation inside the fold vmap*
    is pinned; param init and the sequential Trainer keep ``cfg.prng_impl``.
    """
    return jax.random.key(seed, impl="threefry2x32")


class FoldParallelTrainer:
    """Train several CV folds concurrently on one chip — or, with ``mesh``,
    shard the fold axis over the 'data' mesh axis so a multi-chip host
    trains one fold group per chip in a single program.

    ``cfg.run`` is ignored; ``folds`` lists the validation folds to train
    (e.g. ``[0, 1, 2, 3, 4]``).  ``union_files``/``union_audio`` must cover
    every story of CV folds 0–8 (train ∪ val of any single fold).

    Fold-sharding semantics: folds are independent programs vmapped over a
    stacked ``[F, ...]`` axis, so sharding that axis over the mesh needs
    ZERO collectives.  The sharding is manual SPMD via ``jax.shard_map``
    (NOT GSPMD annotations — the partitioner computes wrong values for the
    vmapped convs here, see :func:`_fold_shard_map`); each device runs its
    fold group against a replicated copy of the chunk data.
    ``len(folds)`` must divide evenly over the mesh's 'data' axis.
    Per-fold numerics are identical to the unsharded trainer
    (``tests/test_fold_parallel.py``).

    ``fold_group_size`` (single-device only): when all F folds' activations
    exceed HBM in one dispatch, train contiguous groups of G folds per
    dispatch instead of failing — ``'auto'`` picks the largest divisor of F
    that fits (AOT compile + XLA memory analysis).  Chunks upload once per
    epoch regardless of G, and per-fold numerics are bit-identical to the
    ungrouped walk for any G.
    """

    def __init__(
        self,
        cfg: TrainConfig,
        folds: Sequence[int],
        union_files: Sequence[str],
        union_audio: Sequence[str],
        results_root: str,
        row_bucket: int = 8,
        mesh=None,
        fold_group_size=None,
    ):
        ensure_scoped_vmem_budget()
        from transformer_clip_eeg_tpu.utils.platform import (
            configure_prng_impl,
            enable_compile_cache,
            resolve_compile_cache_dir,
        )

        configure_prng_impl(cfg.prng_impl)  # before any PRNGKey below
        # before the first jit; "auto" = jit_cache/ sibling of the fold
        # run dirs (same contract as Trainer, VERDICT r4 #4a)
        enable_compile_cache(
            resolve_compile_cache_dir(cfg.compile_cache_dir, results_root)
        )
        self.cfg = cfg
        self.folds = list(folds)
        F = len(self.folds)
        self.results_root = results_root
        self.row_bucket = row_bucket
        os.makedirs(results_root, exist_ok=True)

        self.mesh = mesh
        store_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from transformer_clip_eeg_tpu.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            if F % n_data != 0:
                raise ValueError(
                    f"{F} folds do not shard evenly over the mesh's "
                    f"{n_data}-device '{DATA_AXIS}' axis"
                )
            # states lead with the fold axis; index matrices are
            # [n_rows, F, ...]; chunk data is replicated to every device
            self._fold_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            self._row_sharding = NamedSharding(
                mesh, PartitionSpec(None, DATA_AXIS)
            )
            store_sharding = NamedSharding(mesh, PartitionSpec())

        with open(cfg.fold_split_path) as f:
            split = json.load(f)
        self.val_stories: List[set] = [set(split[str(f_)]) for f_ in folds]
        all_stories = [s for x in range(9) for s in split[str(x)]]
        self.train_stories: List[set] = [
            set(all_stories) - vs for vs in self.val_stories
        ]

        self.dataset = EEGWindowDataset(
            union_files,
            union_audio,
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
        self.store = DeviceChunkStore(
            self.dataset, sharding=store_sharding,
            store_dtype=cfg.chunk_store_dtype,
        )
        # one sampling stream per fold, mirroring each sequential run's
        # dataset rng; plus a shared stream for the chunk order and mixup
        self.fold_rngs = [np.random.default_rng(cfg.seed) for _ in folds]
        self.shared_rng = np.random.default_rng(cfg.seed)

        self.fold_dirs = []
        for f_ in folds:
            d = os.path.join(results_root, f"fold_{f_}")
            os.makedirs(os.path.join(d, "checkpoints"), exist_ok=True)
            fold_cfg = TrainConfig(**{**cfg.to_dict(), "run": f_})
            fold_cfg.bank_size = self.dataset.get_number_of_stimuli_segments()
            fold_cfg.save(os.path.join(d, "args.txt"))
            self.fold_dirs.append(d)
        self.loss_file = os.path.join(results_root, "loss.txt")

        # model + stacked state
        from transformer_clip_eeg_tpu.models.registry import (
            build_model,
            load_eeg_encoder,
            load_speech_encoder,
        )

        bank_size = self.dataset.get_number_of_stimuli_segments()
        eeg_enc = load_eeg_encoder(
            cfg.eeg_encoder, cfg.lstm_units, cfg.spatial_filters,
            cfg.number_conv_layers, cfg.window_length, cfg.latent_dim,
            cfg.attention_depth,
        )
        speech_enc = load_speech_encoder(
            cfg.speech_encoder, cfg.lstm_units, cfg.spatial_filters,
            cfg.number_conv_layers, cfg.window_length, cfg.stride_temporal,
            cfg.speech_dimension, cfg.latent_dim,
        )
        self.model = build_model(
            cfg.model_arch, eeg_enc, speech_enc,
            window_length=cfg.window_length, temperature=cfg.temperature,
            latent_dim=cfg.latent_dim, bank_size=bank_size,
            lambda_clip_loss=cfg.lambda_clip_loss,
            lambda_sim_loss=cfg.lambda_sim_loss,
            momentum_membank=cfg.momentum_membank,
        )
        self.tx = make_optimizer(
            cfg.optimizer, cfg.learning_rate, cfg.beta1, cfg.beta2,
            cfg.weight_decay, cfg.amsgrad_b,
        )
        self.schedulers = [
            make_scheduler(cfg.lr_scheduler, cfg.learning_rate,
                           cfg.step_size_scheduler)
            for _ in folds
        ]

        feature = self.dataset.features_to_load[0]
        some_chunk = next(
            c for c in self.dataset.chunks.values()
            if "eeg" in c and feature in c
        )
        example = (
            some_chunk["eeg"][0, : cfg.batch_size].astype(np.float32),
            some_chunk[feature][: cfg.batch_size].astype(np.float32),
            np.asarray(some_chunk["identifiers"][: cfg.batch_size], np.int32),
        )
        # all folds share the init (the reference reuses one seed per fold)
        state0 = init_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), example, self.tx
        )
        self.states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (F,) + x.shape).copy(), state0
        )

        # auto-resume: each fold restores its own checkpoint if one exists
        # (ref train_clip_final.py:443-449, per run dir), plus the val CE it
        # was saved at, so fit() won't overwrite the saved best with the
        # first post-resume epoch's (possibly worse) model
        self.resumed = np.zeros(F, bool)
        self.resume_best_loss = np.full(F, np.inf)
        for j, d in enumerate(self.fold_dirs):
            restored = ckpt_lib.restore_checkpoint(
                os.path.join(d, "checkpoints"), state0
            )
            if restored is not None:
                self.states = jax.tree.map(
                    lambda s, r, _j=j: s.at[_j].set(r), self.states, restored
                )
                self.resumed[j] = True
                meta = ckpt_lib.load_best_meta(os.path.join(d, "checkpoints"))
                if meta is not None:
                    self.resume_best_loss[j] = meta
        if self.resumed.any():
            printf(
                "auto-resumed folds "
                f"{[self.folds[j] for j in np.where(self.resumed)[0]]} "
                "from their checkpoints",
                self.loss_file,
            )
        if mesh is not None:
            self.states = jax.device_put(self.states, self._fold_sharding)

        compute_dtype = (
            cfg.compute_dtype if cfg.compute_dtype != "float32" else None
        )
        self.train_scan = make_fold_scan_step(
            cfg.model_arch, cfg.augmentations,
            cfg.data_augmentation_percentage, cfg.addEEG_b,
            compute_dtype=compute_dtype, mesh=mesh,
        )
        self.eval_scan = make_fold_eval_scan_step(cfg.model_arch, mesh=mesh)

        # fold-group chunking: when all F folds' activations don't fit HBM
        # at once (the XLA attention path OOMs at F>=4 flagship — PERF.md),
        # train folds in contiguous groups of G per dispatch instead of
        # failing.  Group order and the per-fold/shared rng draw order are
        # identical to the ungrouped walk, so per-fold numerics are
        # bit-identical for any G (tests/test_fold_parallel.py).
        self.fold_group_size = self._resolve_fold_group_size(fold_group_size)
        if self.fold_group_size != F:
            printf(
                f"fold-group chunking: {F} folds in groups of "
                f"{self.fold_group_size} per dispatch",
                self.loss_file,
            )

        printf(
            f"fold-parallel over folds {self.folds}: "
            f"{count_params(state0.params)} params x {F} folds",
            self.loss_file,
        )

    # -- fold-group sizing ----------------------------------------------------

    def _resolve_fold_group_size(self, requested) -> int:
        """``None``/0 → all folds in one dispatch; ``'auto'`` → the largest
        divisor of F whose train-step memory fits the device (measured by
        AOT-compiling candidates and reading XLA's memory analysis);
        an int → that size (must divide F)."""
        F = len(self.folds)
        if requested in (None, 0):
            return F
        if self.mesh is not None:
            raise ValueError(
                "fold_group_size cannot combine with a fold-sharded mesh — "
                "the mesh already divides the fold stack across chips"
            )
        if requested == "auto":
            return self._auto_group_size()
        g = int(requested)
        if g < 1 or F % g != 0:
            raise ValueError(
                f"fold_group_size {g} must be a positive divisor of the "
                f"fold count ({F})"
            )
        return g

    def _auto_group_size(self) -> int:
        """Largest divisor of F whose compiled train scan fits free device
        memory (92% headroom).  Falls back to F wherever memory stats or
        XLA's memory analysis are unavailable (CPU test meshes)."""
        F = len(self.folds)
        try:
            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            return F
        if not free or free <= 0:
            return F
        for g in sorted(
            (d for d in range(1, F + 1) if F % d == 0), reverse=True
        ):
            need = self._train_step_bytes(g)
            if need is None:
                return F
            if need <= free * 0.92:
                if g < F:
                    printf(
                        f"auto fold grouping: G={g} "
                        f"(step needs {need / 2**30:.2f} GiB of "
                        f"{free / 2**30:.2f} GiB free)",
                        self.loss_file,
                    )
                return g
        return 1

    def _train_step_bytes(self, g: int) -> Optional[int]:
        """Peak memory of one G-fold train dispatch at this dataset's largest
        chunk shape, via AOT compile + XLA memory analysis (no execution)."""
        try:
            cfg = self.cfg
            sb, wb, rb = (
                self.store.subs_bucket, self.store.win_bucket, self.row_bucket
            )
            ps = pw = 0
            for c in self.dataset.chunks.values():
                if "eeg" not in c or self.store.feature not in c:
                    continue
                ps = max(ps, -(-c["eeg"].shape[0] // sb) * sb)
                pw = max(pw, -(-c["eeg"].shape[1] // wb) * wb)
            if not ps:
                return None
            n_pad = -(-ps // rb) * rb
            wl, bs = cfg.window_length, cfg.batch_size
            f32 = jnp.float32
            sds = jax.ShapeDtypeStruct
            states_g = jax.tree.map(
                lambda x: sds((g,) + x.shape[1:], x.dtype), self.states
            )
            lowered = self.train_scan.lower(
                states_g,
                sds((ps, pw, wl, 64), f32),
                sds((pw, wl, cfg.speech_dimension), f32),
                sds((pw,), jnp.int32),
                sds((n_pad, g, bs), jnp.int32),
                sds((n_pad, g, bs), jnp.int32),
                sds((n_pad, g, bs), jnp.int32),
                sds((n_pad, g), jnp.bool_),
                fold_scan_rng(0),
                warmup=False,
            )
            mem = lowered.compile().memory_analysis()
            return int(
                mem.temp_size_in_bytes
                + mem.argument_size_in_bytes
                + mem.output_size_in_bytes
            )
        except Exception:
            return None

    # -- schedule assembly --------------------------------------------------

    def _chunk_rows(self, key: str, participate: np.ndarray, add_eeg: bool):
        """Index matrices for one chunk: ``(idx [n_pad, F, bs], subs, partner,
        valid [n_pad, F])`` with each participating fold sampling via its own
        rng; ``n_pad`` rounds the subject count up to ``row_bucket``."""
        chunk = self.dataset.chunks[key]
        eeg = chunk["eeg"]
        n, F = eeg.shape[0], len(self.folds)
        bs = self.cfg.batch_size
        n_pad = -(-n // self.row_bucket) * self.row_bucket
        idx = np.zeros((n_pad, F, bs), np.int32)
        subs = np.zeros((n_pad, F, bs), np.int32)
        partner = np.zeros((n_pad, F, bs), np.int32)
        valid = np.zeros((n_pad, F), bool)
        for j, active in enumerate(participate):
            if not active:
                continue
            i_m, s_m = self.dataset.create_eeg_indices(
                eeg, rng=self.fold_rngs[j]
            )
            idx[:n, j] = i_m
            subs[:n, j] = s_m
            partner[:n, j] = (
                self.shared_rng.integers(0, n, (n, bs))
                if add_eeg
                else s_m
            )
            valid[:n, j] = True
        return idx, subs, partner, valid

    def _epoch(self, member: List[set], active: np.ndarray, train: bool,
               rng_key, warmup: bool = False):
        """One pass over the (shuffled) union chunks; returns per-fold
        ``(loss sums {k: [F]}, batch counts [F])``."""
        cfg = self.cfg
        F = len(self.folds)
        sums: Dict[str, np.ndarray] = {}
        counts = np.zeros(F, np.int64)
        keys = [
            k for k in self.dataset.batches_keys
            if "eeg" in self.dataset.chunks[k]
            and self.store.feature in self.dataset.chunks[k]
        ]
        self.shared_rng.shuffle(keys)
        for key in keys:
            story = _story_of_chunk_key(key)
            participate = np.array(
                [active[j] and story in member[j] for j in range(F)], bool
            )
            if not participate.any():
                continue
            idx, subs, partner, valid = self._chunk_rows(
                key, participate, cfg.addEEG_b and train
            )
            eeg_d, speech_d, ids_d, _, _ = self.store.get(key)
            G = self.fold_group_size
            if G == F:
                if self.mesh is not None:
                    idx, subs, partner, valid = jax.device_put(
                        (idx, subs, partner, valid), self._row_sharding
                    )
                if train:
                    self.states, losses = self.train_scan(
                        self.states, eeg_d, speech_d, ids_d, idx, subs,
                        partner, valid, rng_key, warmup=warmup,
                    )
                else:
                    self.states, losses = self.eval_scan(
                        self.states, eeg_d, speech_d, ids_d, idx, subs, valid
                    )
                m = np.asarray(valid, np.float32)  # [n_pad, F]
                for k, v in losses.items():
                    contrib = (np.asarray(v) * m).sum(axis=0)
                    sums[k] = sums.get(k, 0.0) + contrib
                counts += m.sum(axis=0).astype(np.int64)
                continue
            # fold-group chunking: one dispatch per contiguous G-fold group
            # (all groups reuse this chunk while it is resident — one upload
            # per chunk per epoch regardless of G).  Groups whose folds all
            # sit out this chunk are skipped outright; a masked run would
            # preserve their state bit-identically anyway.
            for lo in range(0, F, G):
                hi = lo + G
                if not participate[lo:hi].any():
                    continue
                g_states = jax.tree.map(lambda x: x[lo:hi], self.states)
                if train:
                    g_states, losses = self.train_scan(
                        g_states, eeg_d, speech_d, ids_d, idx[:, lo:hi],
                        subs[:, lo:hi], partner[:, lo:hi], valid[:, lo:hi],
                        rng_key, warmup=warmup,
                    )
                else:
                    g_states, losses = self.eval_scan(
                        g_states, eeg_d, speech_d, ids_d, idx[:, lo:hi],
                        subs[:, lo:hi], valid[:, lo:hi],
                    )
                self.states = jax.tree.map(
                    lambda s, gs, _lo=lo: s.at[_lo : _lo + G].set(gs),
                    self.states, g_states,
                )
                m = np.asarray(valid[:, lo:hi], np.float32)
                for k, v in losses.items():
                    contrib = (np.asarray(v) * m).sum(axis=0)
                    prev = sums.setdefault(k, np.zeros(F, np.float64))
                    prev[lo:hi] += contrib
                counts[lo:hi] += m.sum(axis=0).astype(np.int64)
        return sums, counts

    # -- driver -------------------------------------------------------------

    def fit(self) -> Dict[str, object]:
        cfg = self.cfg
        F = len(self.folds)
        rng_key = fold_scan_rng(cfg.seed + 1)
        # resumed folds start from their recorded best val CE; best_epoch
        # stays 0 so patience counts from the resume point
        best_loss = self.resume_best_loss.copy()
        best_epoch = np.zeros(F, np.int64)
        active = np.ones(F, bool)
        best_states = jax.tree.map(jnp.copy, self.states)
        history: List[Dict[str, object]] = []

        import time as _time

        for epoch in range(cfg.epochs):
            if epoch > cfg.warmup_epochs:
                newly_done = active & (epoch > best_epoch + cfg.patience)
                for j in np.where(newly_done)[0]:
                    printf(
                        f"fold {self.folds[j]}: early stopping at epoch "
                        f"{epoch}", self.loss_file,
                    )
                active &= ~newly_done
            if not active.any():
                break
            warmup = epoch < cfg.warmup_epochs
            t0 = _time.time()
            store_before = self.store.snapshot_stats()
            tr_sums, tr_counts = self._epoch(
                self.train_stories, active, train=True, rng_key=rng_key,
                warmup=warmup,
            )
            jax.block_until_ready(self.states.params)
            epoch_time = _time.time() - t0
            store_after = self.store.snapshot_stats()

            # per-fold scheduler (ref :502-504)
            if cfg.lr_scheduler != "no":
                from transformer_clip_eeg_tpu.train.state import (
                    set_learning_rate,
                )

                last_val = history[-1]["val_loss_ce"] if history else [None] * F
                lrs = np.array(
                    [s.step(last_val[j]) for j, s in
                     enumerate(self.schedulers)],
                    np.float32,
                )
                self.states = self.states.replace(
                    opt_state=set_learning_rate(self.states.opt_state, lrs)
                )

            va_sums, va_counts = self._epoch(
                self.val_stories, active, train=False, rng_key=rng_key
            )
            val_ce = np.where(
                va_counts > 0, va_sums.get("loss_ce", np.zeros(F)) /
                np.maximum(va_counts, 1), np.inf,
            )
            tr_ce = tr_sums.get("loss_ce", np.zeros(F)) / np.maximum(
                tr_counts, 1
            )
            pairs = int(tr_counts.sum()) * cfg.batch_size
            printf(
                f"epoch {epoch}: train loss_ce "
                f"{np.array2string(tr_ce, precision=4)} val loss_ce "
                f"{np.array2string(val_ce, precision=4)} "
                f"({pairs / max(epoch_time, 1e-9):.0f} pairs/s aggregate)",
                self.loss_file,
            )
            # chunk-store upload attribution, matching the sequential
            # Trainer's per-epoch phase line (VERDICT r3 #1)
            printf(
                "epoch %d phases %s" % (epoch, json.dumps({
                    "uploads": store_after["uploads"]
                    - store_before["uploads"],
                    "upload_gb": round(
                        (store_after["upload_bytes"]
                         - store_before["upload_bytes"]) / 2**30, 2),
                    "upload_s": round(
                        store_after["upload_s"]
                        - store_before["upload_s"], 1),
                    "upload_wait_s": round(
                        store_after["wait_s"] - store_before["wait_s"], 1),
                })),
                self.loss_file,
            )
            history.append(
                {
                    "epoch": epoch,
                    "val_loss_ce": val_ce.tolist(),
                    "train_loss_ce": tr_ce.tolist(),
                    "epoch_time_s": epoch_time,
                    "train_pairs_per_s": pairs / max(epoch_time, 1e-9),
                }
            )

            improved = active & (val_ce < best_loss)
            if improved.any():
                best_loss = np.where(improved, val_ce, best_loss)
                best_epoch = np.where(improved, epoch, best_epoch)
                mask = jnp.asarray(improved)
                if self.mesh is not None:
                    # keep best_states fold-sharded like self.states
                    mask = jax.device_put(mask, self._fold_sharding)
                best_states = _select(mask, self.states, best_states)
                # save each improved fold now (ref :531-540) so a killed
                # sweep auto-resumes from every fold's best so far
                for j in np.where(improved)[0]:
                    ckpt_dir = os.path.join(self.fold_dirs[j], "checkpoints")
                    # meta first — see save_best_meta's crash-ordering note
                    ckpt_lib.save_best_meta(ckpt_dir, best_loss[j])
                    ckpt_lib.save_checkpoint(
                        ckpt_dir,
                        jax.tree.map(lambda x, _j=j: x[_j], best_states),
                    )

        # folds that never improved (e.g. epochs == 0) still get their
        # initial/best state on disk so the eval suite can load the run dir
        for j, d in enumerate(self.fold_dirs):
            if not os.path.exists(
                os.path.join(d, "checkpoints", ckpt_lib.CKPT_NAME)
            ):
                ckpt_lib.save_checkpoint(
                    os.path.join(d, "checkpoints"),
                    jax.tree.map(lambda x, _j=j: x[_j], best_states),
                )
        self.best_states = best_states
        return {
            "folds": self.folds,
            "best_loss": best_loss.tolist(),
            "best_epoch": best_epoch.tolist(),
            "history": history,
            "fold_dirs": self.fold_dirs,
        }

    def fold_state(self, fold: int):
        """Unstacked best :class:`TrainState` for one fold."""
        j = self.folds.index(fold)
        return jax.tree.map(lambda x: x[j], self.best_states)

    def release_host_data(self) -> None:
        """Free the union dataset's host arrays (and the chunk store's HBM
        residents) once training is over.  The per-fold eval suites
        re-ingest their own splits, so keeping the ~18 GB union resident
        through nine suites only stacks RSS toward the host OOM the
        2026-08-21 full-scale run hit.  ``fold_state``/checkpoints stay
        valid — they only reference device-side state."""
        if self.store is not None:
            self.store.release()
            self.store = None
        if self.dataset is not None:
            self.dataset.chunks.clear()
            self.dataset = None
