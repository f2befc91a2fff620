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
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_clip_eeg_tpu.data.dataset import EEGWindowDataset

Array = jax.Array


def _bucket(n: int, step: int) -> int:
    return ((n + step - 1) // step) * step


class DeviceChunkStore:
    """Pads, uploads, and iterates story chunks resident on device."""

    def __init__(
        self,
        dataset: EEGWindowDataset,
        feature: Optional[str] = None,
        subs_bucket: int = 8,
        win_bucket: int = 64,
        sharding=None,
        max_resident: int = 2,
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
        self.max_resident = max_resident
        self._resident: Dict[str, Tuple] = {}

    def _pad_chunk(self, key: str):
        chunk = self.dataset.chunks[key]
        eeg = chunk["eeg"]  # [n_subs, n_win, wl, 64]
        speech = chunk[self.feature]  # [n_win, wl, F]
        ids = np.asarray(chunk["identifiers"], np.int32)
        n_subs, n_win = eeg.shape[0], eeg.shape[1]
        ps = _bucket(n_subs, self.subs_bucket)
        pw = _bucket(n_win, self.win_bucket)
        eeg_p = np.zeros((ps, pw) + eeg.shape[2:], np.float32)
        eeg_p[:n_subs, :n_win] = eeg
        speech_p = np.zeros((pw,) + speech.shape[1:], np.float32)
        speech_p[:n_win] = speech
        ids_p = np.zeros((pw,), np.int32)  # pad ids → bank row 0
        ids_p[:n_win] = ids
        return eeg_p, speech_p, ids_p, n_subs, n_win

    def get(self, key: str):
        """Device-resident (eeg, speech, ids, n_subs, n_win) for a chunk."""
        if key not in self._resident:
            if len(self._resident) >= self.max_resident:
                # evict oldest (insertion order) to bound HBM use
                oldest = next(iter(self._resident))
                del self._resident[oldest]
            eeg, speech, ids, n_subs, n_win = self._pad_chunk(key)
            put = (
                (lambda x: jax.device_put(x, self.sharding))
                if self.sharding is not None
                else jax.device_put
            )
            self._resident[key] = (
                put(eeg), put(speech), put(ids), n_subs, n_win
            )
        return self._resident[key]

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
        for key in self._epoch_keys(rng, shuffle):
            chunk = self.dataset.chunks[key]
            idx_per_batch, subs_per_batch = self.dataset.create_eeg_indices(
                chunk["eeg"]
            )
            eeg_d, speech_d, ids_d, n_subs, _ = self.get(key)
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
        for key in self._epoch_keys(rng, shuffle):
            chunk = self.dataset.chunks[key]
            idx_m, subs_m = self.dataset.create_eeg_indices(chunk["eeg"])
            eeg_d, speech_d, ids_d, n_subs, _ = self.get(key)
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
    """Device-side batch assembly (traced inside the train step)."""
    batch = {
        "eeg": eeg_chunk[subs, idx],
        "speech": speech_chunk[idx],
        "ids": ids_chunk[idx],
    }
    if add_eeg:
        batch["partner_eeg"] = eeg_chunk[partner, idx]
    return batch
