"""The training driver: epoch loop, early stopping, checkpointing, logging.

Faithful to the reference training loop (ref ``train_clip_final.py:443-540``):
auto-resume from ``checkpoints/``, warmup epochs backprop ``loss_ce`` only,
per-epoch scheduler step, validation under eval mode (memory bank still
updating, as the reference's does), best-on-val-CE checkpoint + in-memory
best restored on early stop, ``loss.txt`` tee logging every 100 batches.

TPU-first differences: batches are assembled on host by cheap index gathers
and streamed to the device with double-buffering; augmentation/mixup and the
whole fwd/bwd/update run as one donated jitted program; under a mesh the batch
is sharded over the 'data' axis with the state replicated (global-batch
InfoNCE semantics are preserved by XLA — see ``parallel/``).
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset
from transformer_clip_eeg_tpu.models.registry import (
    build_model,
    load_eeg_encoder,
    load_speech_encoder,
)
from transformer_clip_eeg_tpu.train import checkpoint as ckpt_lib
from transformer_clip_eeg_tpu.train.config import TrainConfig
from transformer_clip_eeg_tpu.train.schedulers import make_scheduler
from transformer_clip_eeg_tpu.train.state import (
    TrainState,
    count_params,
    init_train_state,
    make_optimizer,
    set_learning_rate,
)
from transformer_clip_eeg_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)


def printf(statement: str, file: str) -> None:
    """print + append to file (ref train_clip_final.py:31-34)."""
    print(statement)
    with open(file, "a") as f:
        f.write(statement + "\n")


def batch_iterator(
    dataset: EEGWindowDataset,
    add_eeg: bool = False,
    rng: Optional[np.random.Generator] = None,
    shuffle_chunks: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of fixed-shape numpy batches from the chunked dataset.

    Per chunk: the reference's index sampling (per-subject without
    replacement + cross-subject column shuffle, ref dataset_loader.py:436-464)
    then a host-side gather to ``[bs, wl, C]``.  When ``add_eeg`` a partner
    batch (same windows, uniformly random subjects) is gathered too so mixup
    itself runs on device (ref :333-356 does this in a host Python loop).
    """
    rng = rng or dataset.rng
    keys = list(dataset.batches_keys)
    if shuffle_chunks:
        rng.shuffle(keys)
    if not dataset.features_to_load:
        raise ValueError(
            "dataset has no stimulus features — no audio files matched the "
            "requested stimulus feature (check --stimulus_features against "
            "the *_-_<feature>.npy files in derivatives/preprocessed_stimuli)"
        )
    if not dataset.batches_keys:
        raise ValueError(
            "dataset produced zero story chunks — every story was shorter "
            "than hop*(batch_size-1)+window samples; reduce --batch_size or "
            "provide longer recordings"
        )
    feature = dataset.features_to_load[0]
    for key in keys:
        chunk = dataset.chunks[key]
        if "eeg" not in chunk or feature not in chunk:
            continue
        eeg = chunk["eeg"]  # [n_subs, n_win, wl, 64]
        speech = chunk[feature]  # [n_win, wl, F]
        ids = np.asarray(chunk["identifiers"])
        idx_per_batch, subs_per_batch = dataset.create_eeg_indices(eeg)
        n_subs = eeg.shape[0]
        for i in range(n_subs):
            idx = idx_per_batch[i]
            batch = {
                "eeg": eeg[subs_per_batch[i], idx].astype(np.float32),
                "speech": speech[idx].astype(np.float32),
                "ids": ids[idx].astype(np.int32),
            }
            if add_eeg:
                partner = rng.integers(0, n_subs, idx.shape[0])
                batch["partner_eeg"] = eeg[partner, idx].astype(np.float32)
            yield batch


def prefetch_to_device(
    iterator: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding=None,
) -> Iterator[Dict[str, jax.Array]]:
    """Double-buffered async host→device transfer (the reference moves each
    batch synchronously with ``.to(device)`` inside the hot loop,
    ref train_clip_final.py:476-479)."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class Trainer:
    """End-to-end trainer assembled from a :class:`TrainConfig`."""

    def __init__(
        self,
        config: TrainConfig,
        train_dataset: EEGWindowDataset,
        val_dataset: Optional[EEGWindowDataset] = None,
        results_dir: Optional[str] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        profile_dir: Optional[str] = None,
    ):
        # optional jax.profiler trace of the first training epoch
        # (SURVEY §5.1: the reference has no tracing at all)
        self.profile_dir = profile_dir
        self.cfg = config
        from transformer_clip_eeg_tpu.utils.platform import (
            configure_prng_impl,
            enable_compile_cache,
            resolve_compile_cache_dir,
        )

        # before any PRNGKey below (init, train rng) so they pick it up
        configure_prng_impl(config.prng_impl)
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.mesh = mesh
        self.results_dir = results_dir or os.path.join(
            config.results_folder,
            config.results_dir_name(time.strftime("%Y_%m_%d_%H_%M_%S")),
        )
        self.checkpoint_dir = os.path.join(self.results_dir, "checkpoints")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.loss_file = os.path.join(self.results_dir, "loss.txt")
        # before the first jit so the step programs hit/populate the cache;
        # "auto" resolves to a jit_cache/ SIBLING of the timestamped run
        # dir — shared by every run under the same results folder, so the
        # second run (or the cv loop's next fold process, or a restart at
        # scale) skips the ~20-40 s TPU compile (VERDICT r4 #4a)
        enable_compile_cache(resolve_compile_cache_dir(
            config.compile_cache_dir,
            os.path.dirname(os.path.abspath(self.results_dir)),
        ))

        cfg = config
        # memory-bank sizing (ref train_clip_final.py:367-372)
        bank_size = train_dataset.get_number_of_stimuli_segments()
        if val_dataset is not None:
            # the reference's val dataset restarts ids at 1 and shares the
            # bank; sizing by the max id seen keeps every update in range
            bank_size = max(bank_size, val_dataset.get_number_of_stimuli_segments())
        # persist the derived sizing so serving rebuilds the exact head
        # without the dataset (membank-free archs leave nothing in the
        # checkpoint to infer it from)
        config.bank_size = bank_size
        config.save(os.path.join(self.results_dir, "args.txt"))
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
        self.model = build_model(
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

        self.tx = make_optimizer(
            cfg.optimizer,
            cfg.learning_rate,
            cfg.beta1,
            cfg.beta2,
            cfg.weight_decay,
            cfg.amsgrad_b,
        )
        self.scheduler = make_scheduler(
            cfg.lr_scheduler, cfg.learning_rate, cfg.step_size_scheduler
        )
        compute_dtype = (
            cfg.compute_dtype if cfg.compute_dtype != "float32" else None
        )
        self.train_step = make_train_step(
            cfg.model_arch,
            cfg.augmentations,
            cfg.data_augmentation_percentage,
            cfg.addEEG_b,
            compute_dtype=compute_dtype,
        )
        self.eval_step = make_eval_step(cfg.model_arch, donate=True)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.batch_sharding = NamedSharding(mesh, P("data"))
            self.replicated = NamedSharding(mesh, P())
        else:
            self.batch_sharding = None
            self.replicated = None

        # device-resident chunk path (train/device_data.py).  Composes with
        # the mesh: chunks are uploaded replicated, the in-jit gathered batch
        # is constrained onto the 'data' axis, and GSPMD inserts the global
        # embedding all-gather for the B×B InfoNCE (SURVEY §5.8) — the fast
        # data path and the scale-out path are the same path.
        if cfg.data_mode == "device":
            self.device_data = True
        elif cfg.data_mode == "host":
            self.device_data = False
        else:  # auto
            self.device_data = jax.default_backend() == "tpu"
        if self.device_data:
            from transformer_clip_eeg_tpu.train.device_data import (
                DeviceChunkStore,
            )
            from transformer_clip_eeg_tpu.train.steps import (
                make_chunk_eval_scan_step,
                make_chunk_eval_step,
                make_chunk_scan_step,
                make_chunk_train_step,
            )

            self.chunk_store = DeviceChunkStore(
                train_dataset, sharding=self.replicated,
                store_dtype=cfg.chunk_store_dtype,
                budget_frac=cfg.chunk_budget_frac,
            )
            step_kw = dict(
                compute_dtype=compute_dtype,
                batch_sharding=self.batch_sharding,
            )
            self.chunk_step = make_chunk_train_step(
                cfg.model_arch,
                cfg.augmentations,
                cfg.data_augmentation_percentage,
                cfg.addEEG_b,
                **step_kw,
            )
            self.chunk_scan_step = make_chunk_scan_step(
                cfg.model_arch,
                cfg.augmentations,
                cfg.data_augmentation_percentage,
                cfg.addEEG_b,
                **step_kw,
            )
            if val_dataset is not None:
                self.val_chunk_store = DeviceChunkStore(
                    val_dataset, sharding=self.replicated,
                    store_dtype=cfg.chunk_store_dtype,
                    budget_frac=cfg.chunk_budget_frac,
                )
                self.chunk_eval_step = make_chunk_eval_step(
                    cfg.model_arch, batch_sharding=self.batch_sharding
                )
                self.chunk_eval_scan_step = make_chunk_eval_scan_step(
                    cfg.model_arch, batch_sharding=self.batch_sharding
                )

        # initialize state from one example batch
        example = next(batch_iterator(train_dataset, cfg.addEEG_b))
        self.state = init_train_state(
            self.model,
            jax.random.PRNGKey(cfg.seed),
            (example["eeg"], example["speech"], example["ids"]),
            self.tx,
        )
        if self.replicated is not None:
            self.state = jax.device_put(self.state, self.replicated)

        n_total = count_params(self.state.params)
        printf(f"number of parameters {n_total}", self.loss_file)

    # -- training -----------------------------------------------------------

    def _device_batches(self, dataset, add_eeg):
        it = batch_iterator(dataset, add_eeg)
        return prefetch_to_device(it, sharding=self.batch_sharding)

    def _train_batches(self, warmup: bool):
        """One training epoch: yields ``(new_state, losses, batch_size)``
        using whichever batch path is active."""
        cfg = self.cfg
        rng = self._train_rng
        if self.device_data:
            # one dispatch per story chunk: scan over the bucket-aligned
            # prefix of its n_subs batches in-jit (all rows real — no
            # discarded compute), per-batch step for the < bucket tail.
            # Measured equal to the donated per-batch path on a local chip;
            # the win is ~n_subs× fewer dispatches, which keeps throughput
            # flat on high-latency (remote/tunneled) device links
            sb = self.chunk_store.subs_bucket
            phase = self._phase
            for (eeg_c, sp_c, ids_c, idx_m, subs_m, partner_m, n) in (
                self.chunk_store.epoch_chunk_batches(add_eeg=cfg.addEEG_b)
            ):
                bs = idx_m.shape[1]
                n_scan = (n // sb) * sb
                if n_scan:
                    t0 = time.perf_counter()
                    state, losses = self.chunk_scan_step(
                        self.state, eeg_c, sp_c, ids_c, idx_m[:n_scan],
                        subs_m[:n_scan], partner_m[:n_scan],
                        np.ones(n_scan, dtype=bool), rng, warmup=warmup,
                    )
                    phase["dispatch_s"] += time.perf_counter() - t0
                    self.state = state
                    mean_losses = {
                        k: jnp.mean(v) for k, v in losses.items()
                    }
                    yield state, mean_losses, n_scan * bs
                for i in range(n_scan, n):
                    t0 = time.perf_counter()
                    state, losses = self.chunk_step(
                        self.state, eeg_c, sp_c, ids_c, idx_m[i],
                        subs_m[i], partner_m[i], rng, warmup=warmup,
                    )
                    phase["dispatch_s"] += time.perf_counter() - t0
                    self.state = state
                    yield state, losses, bs
        else:
            for batch in self._device_batches(self.train_dataset, cfg.addEEG_b):
                t0 = time.perf_counter()
                state, losses = self.train_step(
                    self.state, batch, rng, warmup=warmup
                )
                self._phase["dispatch_s"] += time.perf_counter() - t0
                self.state = state
                yield state, losses, batch["eeg"].shape[0]

    def release_device_data(self) -> None:
        """Drop all device-resident training chunks.  Called once training
        is over, before the eval suite's embedding extraction, so the HBM
        the chunk stores held (up to the full budget at SparrKULee scale)
        is available to eval instead of pinned behind stale residency."""
        for store in (
            getattr(self, "chunk_store", None),
            getattr(self, "val_chunk_store", None),
        ):
            if store is not None:
                store.release()

    def release_host_data(self) -> None:
        """Additionally free the ingested datasets' host arrays (the eval
        suite re-ingests its own splits; at SparrKULee scale the training
        datasets are ~15 GB of host RSS that would otherwise sit under the
        whole eval phase — see utils.platform.trim_host_heap)."""
        self.release_device_data()
        for ds in (self.train_dataset, self.val_dataset):
            if ds is not None and hasattr(ds, "chunks"):
                ds.chunks.clear()
        self.train_dataset = None
        self.val_dataset = None

    def _format_loss_line(self, epoch: int, n_batches: int, losses) -> str:
        """The reference's per-100-batch loss line (ref :494-500).  The
        ``float()`` conversions block on the device queue — call only at a
        point where that sync is intended (stream mode) or already paid
        (end-of-epoch drain)."""
        if self.cfg.is_kld:
            return (
                f"train epoch {epoch} batch {n_batches} loss_ce "
                f"{float(losses['loss_ce'])} loss pmu2 "
                f"{float(losses['log_pmu2'])}, log z2: "
                f"{float(losses['kld_z2'])}"
            )
        return (
            f"train epoch {epoch} batch {n_batches} loss_ce "
            f"{float(losses['loss_ce'])} loss average eeg "
            f"{float(losses['loss_avg'])}"
        )

    def fit(self) -> Dict[str, Any]:
        cfg = self.cfg
        # auto-resume (ref train_clip_final.py:443-449); a reference torch
        # model.ckpt dropped into checkpoints/ resumes too (converted via
        # utils.torch_import — the reference loads the same file here)
        restored = ckpt_lib.restore_checkpoint(self.checkpoint_dir, self.state)
        if restored is None:
            restored = ckpt_lib.restore_torch_checkpoint(
                self.checkpoint_dir, self.state
            )
        if restored is not None:
            if self.replicated is not None:
                restored = jax.device_put(restored, self.replicated)
            self.state = restored
            printf(
                f"loaded model from {self.checkpoint_dir}", self.loss_file
            )
        else:
            printf(
                f"no model found at {self.checkpoint_dir}, training from scratch",
                self.loss_file,
            )

        self._train_rng = jax.random.PRNGKey(cfg.seed + 1)
        # a resumed run starts from the recorded best val CE (best_meta.json
        # next to the checkpoint) so its first — possibly worse — epoch
        # cannot overwrite the saved best; the reference restarts from inf
        # (ref :452-460), losing the bar on resume
        best_loss = float("inf")
        if restored is not None:
            meta = ckpt_lib.load_best_meta(self.checkpoint_dir)
            if meta is not None:
                best_loss = meta
        best_epoch = 0
        # deep copy (ref keeps a CPU best_state_dict, :463-468): the live
        # state's buffers are donated into every train/eval step, so an
        # aliasing snapshot would be deleted by the next step
        best_state = jax.tree.map(jnp.copy, self.state)
        history: List[Dict[str, float]] = []

        # without a validation set there is no best-on-val tracking: keep
        # the final state instead of silently restoring the initial copy
        # (val losses come back NaN, and 'nan < inf' never updates best)
        track_best = self.val_dataset is not None

        for epoch in range(cfg.epochs):
            # early stopping (ref :463-468)
            if (
                track_best
                and epoch > best_epoch + cfg.patience
                and epoch > cfg.warmup_epochs
            ):
                self.state = best_state
                printf(f"early stopping at epoch {epoch}", self.loss_file)
                break

            warmup = epoch < cfg.warmup_epochs
            if self.profile_dir and epoch == 0:
                jax.profiler.start_trace(self.profile_dir)
            t0 = time.time()
            n_batches = 0
            n_pairs = 0
            next_log = 0
            # per-phase epoch attribution (VERDICT r3 #1): dispatch = host
            # time in step calls (async dispatch + trace), fetch = host
            # blocking on loss scalars at log points, wait/upload from the
            # chunk store's own counters, block = the end-of-epoch drain
            # where queued device work surfaces
            self._phase = {"dispatch_s": 0.0, "fetch_s": 0.0}
            store_before = (
                self.chunk_store.snapshot_stats() if self.device_data else None
            )
            # the reference streams a loss line every 100 batches
            # (ref :494-500).  Fetching each loss scalar mid-epoch blocks
            # the host on the device queue — over a tunneled link that
            # serialized ~15 s of an otherwise ~12 s warm epoch at
            # SparrKULee scale (SCALE.md run B fetch_s; VERDICT r4 #4b).
            # Default: hold the DEVICE scalars and write the identical
            # lines once the epoch's compute has drained — same loss.txt
            # content, zero mid-epoch sync points.  --loss_log_stream
            # batch restores live streaming for interactive debugging.
            stream_logs = cfg.loss_log_stream == "batch"
            pending_logs: List[Tuple[int, Dict]] = []
            try:
                for item in self._train_batches(warmup):
                    # an item may cover several batches (the chunk-scan path
                    # yields a whole chunk with per-chunk mean losses); log at
                    # every crossing of the 100-batch mark (ref :494-500)
                    self.state, losses, pairs = item
                    if n_batches >= next_log:
                        next_log = n_batches - (n_batches % 100) + 100
                        if stream_logs:
                            tf = time.perf_counter()
                            msg = self._format_loss_line(
                                epoch, n_batches, losses
                            )
                            self._phase["fetch_s"] += time.perf_counter() - tf
                            printf(msg, self.loss_file)
                        else:
                            pending_logs.append((n_batches, losses))
                    n_batches += max(pairs // cfg.batch_size, 1)
                    n_pairs += pairs
            except BaseException:
                # a mid-epoch crash (NaN divergence, device OOM, SIGTERM)
                # must not eat the deferred loss lines — they are exactly
                # the diagnostic that localizes the failure.  Fetch what we
                # can; a dead device makes the fetch itself raise, so stop
                # at the first unfetchable scalar.
                for nb, losses in pending_logs:
                    try:
                        printf(
                            self._format_loss_line(epoch, nb, losses),
                            self.loss_file,
                        )
                    except Exception:
                        break
                raise
            tb = time.perf_counter()
            jax.block_until_ready(self.state.params)
            block_s = time.perf_counter() - tb
            tf = time.perf_counter()
            for nb, losses in pending_logs:
                printf(
                    self._format_loss_line(epoch, nb, losses), self.loss_file
                )
            self._phase["fetch_s"] += time.perf_counter() - tf
            epoch_time = time.time() - t0
            # persisted epoch timing (the reference only streams per-batch
            # losses; epoch wall-clock otherwise lives only in the returned
            # history dict, invisible to log-reading tools like
            # scripts/scale_rehearsal.py)
            printf(
                f"epoch {epoch} done in {epoch_time:.1f}s "
                f"({n_pairs / max(epoch_time, 1e-9):.0f} pairs/s)",
                self.loss_file,
            )
            phase_rec = {
                "dispatch_s": round(self._phase["dispatch_s"], 1),
                "fetch_s": round(self._phase["fetch_s"], 1),
                "block_s": round(block_s, 1),
            }
            if store_before is not None:
                after = self.chunk_store.snapshot_stats()
                phase_rec.update(
                    uploads=after["uploads"] - store_before["uploads"],
                    upload_gb=round(
                        (after["upload_bytes"] - store_before["upload_bytes"])
                        / 2**30, 2),
                    upload_s=round(
                        after["upload_s"] - store_before["upload_s"], 1),
                    upload_wait_s=round(
                        after["wait_s"] - store_before["wait_s"], 1),
                )
            printf(f"epoch {epoch} phases {json.dumps(phase_rec)}",
                   self.loss_file)
            if self.profile_dir and epoch == 0:
                jax.profiler.stop_trace()
                printf(f"profiler trace written to {self.profile_dir}",
                       self.loss_file)

            # scheduler (ref :502-504); plateau consumes last val loss
            if cfg.lr_scheduler != "no":
                last_val = history[-1]["val_loss_ce"] if history else None
                lr = self.scheduler.step(last_val)
                self.state = self.state.replace(
                    opt_state=set_learning_rate(self.state.opt_state, lr)
                )

            # validation (ref :506-529)
            val_metrics = self.evaluate()
            printf(
                f"validation epoch {epoch}: mean loss ce : "
                f"{val_metrics['loss_ce']}, mean loss average: "
                f"{val_metrics.get('loss_avg', val_metrics.get('log_pmu2', 0.0))},"
                f" mean loss total: {val_metrics['loss_total']}",
                self.loss_file,
            )
            history.append(
                {
                    "epoch": epoch,
                    "val_loss_ce": val_metrics["loss_ce"],
                    "val_loss_total": val_metrics["loss_total"],
                    "epoch_time_s": epoch_time,
                    "train_pairs_per_s": n_pairs / max(epoch_time, 1e-9),
                }
            )

            # best-on-val-CE checkpoint (ref :531-540); meta first — see
            # save_best_meta's crash-ordering note
            if val_metrics["loss_ce"] < best_loss:
                best_loss = val_metrics["loss_ce"]
                ckpt_lib.save_best_meta(self.checkpoint_dir, best_loss)
                ckpt_lib.save_checkpoint(self.checkpoint_dir, self.state)
                best_epoch = epoch
                best_state = jax.tree.map(jnp.copy, self.state)
        else:
            if track_best:
                self.state = best_state
            else:
                # no val set: the final state is the result; checkpoint it
                ckpt_lib.save_checkpoint(self.checkpoint_dir, self.state)

        return {
            "best_loss": best_loss,
            "best_epoch": best_epoch,
            "history": history,
            "results_dir": self.results_dir,
        }

    def evaluate(self) -> Dict[str, float]:
        """Mean validation losses over the val set (ref :506-529).

        In device-data mode validation runs through the val chunk store —
        whole chunks scanned in one dispatch, zero per-batch host gathers —
        with identical batch sampling to the host path (the chunk iterator
        consumes ``dataset.rng`` in the same order ``batch_iterator`` does).
        """
        if self.val_dataset is None:
            return {"loss_ce": float("nan"), "loss_total": float("nan")}
        sums: Dict[str, float] = {}
        count = 0
        if self.device_data:
            sb = self.val_chunk_store.subs_bucket
            for (eeg_c, sp_c, ids_c, idx_m, subs_m, _partner, n) in (
                self.val_chunk_store.epoch_chunk_batches(add_eeg=False)
            ):
                n_scan = (n // sb) * sb
                if n_scan:
                    self.state, losses = self.chunk_eval_scan_step(
                        self.state, eeg_c, sp_c, ids_c, idx_m[:n_scan],
                        subs_m[:n_scan], np.ones(n_scan, dtype=bool),
                    )
                    for k, v in losses.items():
                        sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
                    count += n_scan
                for i in range(n_scan, n):
                    self.state, losses = self.chunk_eval_step(
                        self.state, eeg_c, sp_c, ids_c, idx_m[i], subs_m[i],
                    )
                    for k, v in losses.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                    count += 1
        else:
            for batch in self._device_batches(self.val_dataset, add_eeg=False):
                self.state, losses = self.eval_step(self.state, batch)
                for k, v in losses.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}
