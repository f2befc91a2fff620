"""Device-resident chunk store: batch gathers on device instead of host.

The host batch path (``train/loop.batch_iterator``) gathers each batch on
the host and transfers it — for a story chunk shared by ``n_subs`` subjects
that re-sends the same ~100 MB of wav2vec features ``n_subs`` times per
epoch.  Here each story chunk (EEG ``[n_subs, n_win, wl, 64]`` + speech
``[n_win, wl, F]`` + ids) is padded to a small set of bucket shapes,
transferred to the device **once**, and the per-batch row gather runs inside
the jitted train step — host→device traffic per chunk drops from
``n_subs × (batch + features)`` to one chunk upload (~8× less at SparrKULee
scale), and the gather itself is one XLA dynamic-gather on HBM.

Padding is sampling-invisible: index sampling happens on the host over the
*real* window/subject counts only, so padded rows are never touched; padded
ids map to memory-bank row 0 (the reference's bank has ``bank_size + 1``
rows with row 0 never assigned to a real segment, ref
``clip_model.py:711-728``).

The next chunk's upload is prefetched on a background thread while the
current chunk trains (see ``DeviceChunkStore``), overlapping host→device
transfer with device compute — significant when the link is slow relative
to compute (a ~100 MB chunk at SparrKULee scale costs ~10 ms over PCIe but
seconds over a remote/tunneled link).
"""

from __future__ import annotations

import threading
import time
import weakref
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset

Array = jax.Array


def _bucket(n: int, step: int) -> int:
    return ((n + step - 1) // step) * step


class DeviceChunkStore:
    """Pads, uploads, and iterates story chunks resident on device.

    With ``prefetch=True`` (default) the *next* chunk's pad + upload runs on
    a single background thread while the current chunk trains, overlapping
    host→device transfer with device compute.  Prefetch touches only the
    upload — index sampling stays on the calling thread, so the host RNG
    draw order (and therefore training numerics) is identical with prefetch
    on or off.

    Residency policy: by default (``max_resident=None``) chunks stay
    resident up to a byte budget auto-sized from the device's free memory
    (``budget_frac`` — default 75% — of free HBM at construction).  At
    SparrKULee scale an f32 working set can exceed that budget (measured
    ~14 GB on a 16 GB chip, SCALE.md r3); eviction then picks the resident
    chunk whose next use in the current epoch walk is **farthest away**
    (Belady order, fed by the epoch iterators via :meth:`_set_upcoming`),
    so a walk that doesn't fit re-uploads only the overflow instead of
    thrashing every chunk the way FIFO does on a cyclic scan.  Passing
    ``store_dtype='bfloat16'`` halves the working set (upload bytes and
    HBM) — gathered batches are cast back to f32 on device, a per-batch
    rounding of the *inputs* only.  Where memory stats are unavailable
    (CPU test meshes) the policy falls back to a 2-chunk count cap;
    passing ``max_resident=N`` forces a count cap.

    ``stats`` counts uploads/bytes/seconds since construction (and
    ``wait_s`` the main thread spent blocked on uploads); the Trainer
    snapshots it per epoch to attribute epoch wall-clock (VERDICT r3 #1).
    """

    # Process-wide residency ledger, keyed per DEVICE SET: several stores
    # (train + val, fold-parallel + eval extraction) share one device and
    # must cap their COMBINED residency; stores on different devices must
    # not count against each other.  Entry: {"resident": bytes, "cap":
    # bytes, "stores": live budgeted-store count}.  Each store's share is
    # held in a mutable cell that a ``weakref.finalize`` releases if the
    # store is dropped without ``release()`` (exception paths, repeated
    # Trainer construction); an entry whose last store dies is removed,
    # so the cap does not outlive the stores that justified it.
    _ledger_lock = threading.Lock()
    _ledger: Dict[tuple, Dict[str, int]] = {}

    def __init__(
        self,
        dataset: EEGWindowDataset,
        feature: Optional[str] = None,
        subs_bucket: int = 8,
        win_bucket: int = 64,
        sharding=None,
        max_resident: Optional[int] = None,
        prefetch: bool = True,
        budget_frac: float = 0.75,
        store_dtype: str = "float32",
    ):
        self.dataset = dataset
        if feature is None and not dataset.features_to_load:
            raise ValueError(
                "dataset has no stimulus features — no audio files matched "
                "the requested stimulus feature (check --stimulus_features "
                "against the *_-_<feature>.npy files in "
                "derivatives/preprocessed_stimuli)"
            )
        self.feature = feature or dataset.features_to_load[0]
        self.subs_bucket = subs_bucket
        self.win_bucket = win_bucket
        self.sharding = sharding
        self.prefetch = prefetch
        self.store_dtype = jnp.dtype(store_dtype)
        if self.store_dtype not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)
        ):
            raise ValueError(
                f"store_dtype must be float32 or bfloat16, got {store_dtype}"
            )
        self.stats = {
            "uploads": 0, "upload_bytes": 0, "upload_s": 0.0, "wait_s": 0.0,
        }
        self.budget_bytes: Optional[int] = None
        if max_resident is None:
            self.budget_bytes = self._auto_budget(budget_frac)
            if self.budget_bytes is None:
                max_resident = 2
        if max_resident is not None and prefetch:
            # prefetch needs one slot for the in-use chunk plus one for
            # the incoming chunk
            max_resident = max(max_resident, 2)
        self.max_resident = max_resident
        self._resident: Dict[str, Tuple] = {}
        # this store's share of the per-device ledger lives in a plain dict
        # cell so the weakref finalizer below can release it without
        # keeping the store alive
        self._ledger_cell = {"bytes": 0}
        if self.budget_bytes is not None:
            key = self._device_key
            with DeviceChunkStore._ledger_lock:
                entry = DeviceChunkStore._ledger.setdefault(
                    key, {"resident": 0, "cap": 0, "stores": 0}
                )
                entry["cap"] = max(entry["cap"], self.budget_bytes)
                entry["stores"] += 1
            weakref.finalize(
                self, DeviceChunkStore._ledger_drop_store,
                key, self._ledger_cell,
            )
        self._sizes: Dict[str, int] = {}
        self._resident_bytes = 0
        self._futures: Dict[str, Future] = {}
        self._lock = threading.Lock()
        self._pool: Optional[ThreadPoolExecutor] = None
        self._in_use: Optional[str] = None
        # epoch-walk lookahead for Belady eviction: key -> steps until next
        # use (smaller = needed sooner).  Updated by the epoch iterators.
        self._upcoming: Dict[str, int] = {}

    def snapshot_stats(self) -> Dict[str, float]:
        with self._lock:
            return dict(self.stats)

    def _ledger_add(self, nbytes: int) -> None:
        with DeviceChunkStore._ledger_lock:
            entry = DeviceChunkStore._ledger.get(self._device_key)
            if entry is not None:
                entry["resident"] += nbytes
                self._ledger_cell["bytes"] += nbytes

    def _ledger_sub(self, nbytes: int) -> None:
        with DeviceChunkStore._ledger_lock:
            entry = DeviceChunkStore._ledger.get(self._device_key)
            if entry is not None:
                entry["resident"] = max(0, entry["resident"] - nbytes)
                self._ledger_cell["bytes"] = max(
                    0, self._ledger_cell["bytes"] - nbytes
                )

    @classmethod
    def _ledger_drop_store(cls, key: tuple, cell: Dict[str, int]) -> None:
        """weakref.finalize target: reclaim a dead store's resident bytes
        (it may have been dropped without ``release()`` — exception paths,
        repeated Trainer construction) and retire its store count; the
        entry — including its only-grows cap — is removed once no budgeted
        store on that device set remains."""
        with cls._ledger_lock:
            entry = cls._ledger.get(key)
            if entry is None:
                return
            entry["resident"] = max(0, entry["resident"] - cell["bytes"])
            cell["bytes"] = 0
            entry["stores"] -= 1
            if entry["stores"] <= 0:
                del cls._ledger[key]

    def release(self) -> None:
        """Drop every resident chunk (and its ledger share) so the device
        memory is reusable — e.g. by the post-training eval suite's
        embedding extraction."""
        for fut in list(self._futures.values()):
            try:
                fut.result()
            except Exception:
                pass
        with self._lock:
            self._futures.clear()
            self._ledger_sub(self._resident_bytes)
            self._resident.clear()
            self._sizes.clear()
            self._resident_bytes = 0
            self._in_use = None

    def _set_upcoming(self, keys_ahead) -> None:
        with self._lock:
            self._upcoming = {k: i for i, k in enumerate(keys_ahead)}

    # HBM per chip by device kind, for runtimes whose memory_stats() is
    # unavailable (e.g. tunneled/proxy backends).  Substring-matched
    # LONGEST PATTERN FIRST so e.g. 'v4 lite' (8 GB v4i) cannot be
    # mis-sized by the bare 'v4' (32 GB) entry (ADVICE r4).
    _HBM_BY_KIND = {
        "v5 lite": 16, "v5e": 16, "v6 lite": 32, "v6e": 32, "v4 lite": 8,
        "v4i": 8, "v5p": 95, "v4": 32, "v3": 16, "v2": 8,
    }

    _device_key: tuple = ("unknown",)

    def _auto_budget(self, frac: float) -> Optional[int]:
        """``frac`` of the device's currently-free memory (default 75%),
        or None if unknowable.  Also records ``_device_key`` (sorted device
        ids) for the per-device residency ledger.

        When the runtime does not expose ``memory_stats()`` (measured: the
        tunneled TPU backend — where the silent 2-chunk fallback caused
        every epoch to re-upload the full working set, the 34× warm-epoch
        gap of VERDICT r3 weak #3), fall back to the device kind's known
        HBM size minus a fixed 1 GiB runtime reserve plus ``frac``
        headroom.  Unlike the memory_stats() path this sizes from TOTAL
        HBM, so the (1-frac) headroom — 4 GB at 16 GB HBM — must absorb
        params/optimizer/activations too; at this workload's model scale
        (~3.8 M params ≈ 61 MB of state) that is ample, but callers
        running large models on stats-less backends should pass a lower
        ``budget_frac`` (ADVICE r4)."""
        try:
            if self.sharding is not None:
                devs = sorted(self.sharding.device_set, key=lambda d: d.id)
            else:
                devs = [jax.devices()[0]]
            dev = devs[0]
            self._device_key = tuple(
                (getattr(d, "platform", "?"), d.id) for d in devs
            )
        except Exception:
            return None
        try:
            stats = dev.memory_stats()
            free = stats["bytes_limit"] - stats["bytes_in_use"]
            return int(free * frac) if free > 0 else None
        except Exception:
            kind = getattr(dev, "device_kind", "") or ""
            if dev.platform != "tpu" and "TPU" not in kind:
                return None  # CPU test meshes keep the small count cap
            norm = kind.lower().replace("tpu ", "")
            for pat in sorted(self._HBM_BY_KIND, key=len, reverse=True):
                if pat in norm:
                    gb = self._HBM_BY_KIND[pat]
                    budget = int((gb - 1) * 2**30 * frac)
                    print(
                        f"DeviceChunkStore: memory_stats() unavailable; "
                        f"using {budget / 2**30:.1f} GB budget from device "
                        f"kind '{kind}' ({gb} GB HBM)",
                        flush=True,
                    )
                    return budget
            return None

    def _pad_chunk(self, key: str):
        chunk = self.dataset.chunks[key]
        eeg = chunk["eeg"]  # [n_subs, n_win, wl, 64]
        speech = chunk[self.feature]  # [n_win, wl, F]
        ids = np.asarray(chunk["identifiers"], np.int32)
        n_subs, n_win = eeg.shape[0], eeg.shape[1]
        ps = _bucket(n_subs, self.subs_bucket)
        pw = _bucket(n_win, self.win_bucket)
        dt = self.store_dtype  # numpy handles ml_dtypes.bfloat16 natively
        eeg_p = np.zeros((ps, pw) + eeg.shape[2:], dt)
        eeg_p[:n_subs, :n_win] = eeg
        speech_p = np.zeros((pw,) + speech.shape[1:], dt)
        speech_p[:n_win] = speech
        ids_p = np.zeros((pw,), np.int32)  # pad ids → bank row 0
        ids_p[:n_win] = ids
        return eeg_p, speech_p, ids_p, n_subs, n_win

    def _insert(self, key: str) -> None:
        """Pad + upload ``key`` into the residency dict (any thread)."""
        t0 = time.perf_counter()
        eeg, speech, ids, n_subs, n_win = self._pad_chunk(key)
        nbytes = eeg.nbytes + speech.nbytes + ids.nbytes
        put = (
            (lambda x: jax.device_put(x, self.sharding))
            if self.sharding is not None
            else jax.device_put
        )
        entry = (put(eeg), put(speech), put(ids), n_subs, n_win)
        # device_put is async; block so upload_s measures the transfer and
        # eviction below only drops chunks whose replacement has landed
        jax.block_until_ready(entry[:3])
        with self._lock:
            self.stats["uploads"] += 1
            self.stats["upload_bytes"] += nbytes
            self.stats["upload_s"] += time.perf_counter() - t0
            if key in self._resident:  # re-insert: replace, don't double-count
                self._ledger_sub(self._sizes[key])
                self._resident_bytes -= self._sizes.pop(key)
                del self._resident[key]

            def over_cap() -> bool:
                if (
                    self.max_resident is not None
                    and len(self._resident) >= self.max_resident
                ):
                    return True
                if self.budget_bytes is None:
                    return False
                if self._resident_bytes + nbytes > self.budget_bytes:
                    return True
                # combined residency of ALL stores on this device set.
                # SOFT enforcement: each store can only evict its OWN
                # chunks, so a store whose residency is empty (or whose
                # only resident chunk is in use) still inserts while
                # another store holds the whole cap — combined residency
                # can overshoot the cap by up to one store's working
                # chunk set.  That bounded overshoot is accepted; the
                # budget_frac headroom absorbs it (ADVICE r4).
                with DeviceChunkStore._ledger_lock:
                    entry = DeviceChunkStore._ledger.get(self._device_key)
                    if entry is None:
                        return False
                    return entry["resident"] + nbytes > entry["cap"]

            if over_cap() and self.budget_bytes is not None and \
                    not getattr(self, "_evict_warned", False):
                self._evict_warned = True
                print(
                    "DeviceChunkStore: working set exceeds the "
                    f"{self.budget_bytes / 2**30:.1f} GB HBM budget — "
                    "epochs will re-upload evicted chunks (Belady order "
                    "bounds the thrash to the overflow). If inputs "
                    "tolerate bf16, --chunk_store_dtype bfloat16 halves "
                    "residency and upload bytes.",
                    flush=True,
                )
            while self._resident and over_cap():
                # evict the chunk needed FARTHEST in the future (Belady,
                # from the epoch iterator's lookahead; unknown next use =
                # farthest) — FIFO on a cyclic epoch walk evicts exactly
                # what is needed next and thrashes every chunk (VERDICT r3
                # weak #3).  Never the chunk the loop is consuming.
                evictable = [
                    k for k in self._resident if k != self._in_use
                ]
                if not evictable:
                    break
                victim = max(
                    evictable,
                    key=lambda k: self._upcoming.get(k, 1 << 30),
                )
                self._ledger_sub(self._sizes[victim])
                self._resident_bytes -= self._sizes.pop(victim)
                del self._resident[victim]
            self._resident[key] = entry
            self._sizes[key] = nbytes
            self._ledger_add(nbytes)
            self._resident_bytes += nbytes

    def get(self, key: str):
        """Device-resident (eeg, speech, ids, n_subs, n_win) for a chunk."""
        t0 = time.perf_counter()
        fut = self._futures.pop(key, None)
        if fut is not None:
            fut.result()  # re-raises background upload errors here
        with self._lock:
            entry = self._resident.get(key)
            self._in_use = key
        if entry is None:
            self._insert(key)
            with self._lock:
                entry = self._resident[key]
        with self._lock:
            self.stats["wait_s"] += time.perf_counter() - t0
        return entry

    def prefetch_key(self, key: str) -> None:
        """Start uploading ``key`` on the background thread (idempotent)."""
        with self._lock:
            if key in self._resident or key in self._futures:
                return
            if self._pool is None:
                self._pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="chunk-prefetch"
                )
            self._futures[key] = self._pool.submit(self._insert, key)

    def _epoch_keys(
        self, rng: np.random.Generator, shuffle: bool
    ) -> list:
        keys = [
            k
            for k in self.dataset.batches_keys
            if "eeg" in self.dataset.chunks[k]
            and self.feature in self.dataset.chunks[k]
        ]
        if shuffle:
            rng.shuffle(keys)
        return keys

    def epoch_batches(
        self,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        add_eeg: bool = False,
    ) -> Iterator[Tuple]:
        """Yields ``(eeg_chunk, speech_chunk, ids_chunk, idx, subs, partner)``
        per batch — chunk arrays device-resident, index vectors tiny host
        arrays.  Sampling semantics identical to the host path (per-subject
        without replacement + cross-subject shuffle, ref
        dataset_loader.py:436-464); ``partner`` are host-sampled mixup
        partner subjects (``== subs`` when mixup is off, never touching
        padded rows)."""
        rng = rng or self.dataset.rng
        keys = self._epoch_keys(rng, shuffle)
        for j, key in enumerate(keys):
            self._set_upcoming(keys[j:])
            chunk = self.dataset.chunks[key]
            idx_per_batch, subs_per_batch = self.dataset.create_eeg_indices(
                chunk["eeg"]
            )
            eeg_d, speech_d, ids_d, n_subs, _ = self.get(key)
            if self.prefetch and j + 1 < len(keys):
                self.prefetch_key(keys[j + 1])
            bs = idx_per_batch.shape[1]
            for i in range(n_subs):
                partner = (
                    rng.integers(0, n_subs, bs).astype(np.int32)
                    if add_eeg
                    else subs_per_batch[i].astype(np.int32)
                )
                yield (
                    eeg_d,
                    speech_d,
                    ids_d,
                    idx_per_batch[i].astype(np.int32),
                    subs_per_batch[i].astype(np.int32),
                    partner,
                )


    def epoch_chunk_batches(
        self,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        add_eeg: bool = False,
    ) -> Iterator[Tuple]:
        """Chunk-granular variant of ``epoch_batches`` for the scan step
        (``train/steps.make_chunk_scan_step``): yields ``(eeg_chunk,
        speech_chunk, ids_chunk, idx_mat [n, bs], subs_mat [n, bs],
        partner_mat [n, bs], n)`` per chunk — the exact batch list, no
        padding.  The caller decides how to split it between the scan step
        and the per-batch step (the Trainer scans the bucket-aligned prefix
        and runs the tail per-batch, so no training compute is discarded)."""
        rng = rng or self.dataset.rng
        keys = self._epoch_keys(rng, shuffle)
        for j, key in enumerate(keys):
            self._set_upcoming(keys[j:])
            chunk = self.dataset.chunks[key]
            idx_m, subs_m = self.dataset.create_eeg_indices(chunk["eeg"])
            eeg_d, speech_d, ids_d, n_subs, _ = self.get(key)
            if self.prefetch and j + 1 < len(keys):
                self.prefetch_key(keys[j + 1])
            n, bs = idx_m.shape
            if add_eeg:
                partner_m = rng.integers(0, n_subs, (n, bs))
            else:
                partner_m = subs_m
            yield (
                eeg_d,
                speech_d,
                ids_d,
                np.asarray(idx_m, np.int32),
                np.asarray(subs_m, np.int32),
                np.asarray(partner_m, np.int32),
                n,
            )


def gather_batch(
    eeg_chunk: Array,
    speech_chunk: Array,
    ids_chunk: Array,
    idx: Array,
    subs: Array,
    add_eeg: bool = False,
    partner: Optional[Array] = None,
) -> Dict[str, Array]:
    """Device-side batch assembly (traced inside the train step).

    Chunks stored in bf16 (``DeviceChunkStore(store_dtype='bfloat16')``)
    are cast back to f32 *after* the row gather, so the cast costs one
    batch — not one chunk — per step and everything downstream (augment,
    encoders, loss) keeps its f32 numerics.
    """
    f32 = lambda x: x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    batch = {
        "eeg": f32(eeg_chunk[subs, idx]),
        "speech": f32(speech_chunk[idx]),
        "ids": ids_chunk[idx],
    }
    if add_eeg:
        batch["partner_eeg"] = f32(eeg_chunk[partner, idx])
    return batch
