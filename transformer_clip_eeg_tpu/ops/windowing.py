"""On-device windowing / normalization / overlap-add primitives.

The reference does all of this in host numpy (``dataset_loader.py:474-477``,
``train_clip_helper_functions.py:136, 262, 306-325``); here they are pure
jittable array ops so evaluation pipelines can run fully on device.  Numpy
twins (used by the host ingest path) live in ``data/dataset.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def split_into_windows(x: Array, window_length: int) -> Array:
    """Non-overlapping windows over axis 0, replicating the reference quirk
    (ref dataset_loader.py:474-477): ``np.split(...)[: -1]`` drops the ragged
    tail — and, when the length divides evenly, drops the final *full* window.

    ``[T, F] -> [n_windows, window_length, F]``
    """
    t = x.shape[0]
    n = t // window_length
    if t % window_length == 0:
        n -= 1  # the reference's [:-1] removes a full window in this case
    return x[: n * window_length].reshape((n, window_length) + x.shape[1:])


def split_into_windows_np(x: np.ndarray, window_length: int) -> np.ndarray:
    t = x.shape[0]
    n = t // window_length
    if t % window_length == 0:
        n -= 1
    return x[: n * window_length].reshape((n, window_length) + x.shape[1:])


def sliding_windows(x: Array, window_length: int, hop: int) -> Array:
    """Overlapping windows over axis 0 (used for 50%-overlap eval windowing,
    ref train_clip_helper_functions.py:262).  Drops the final ragged window
    like the reference's ``[:-1]``."""
    t = x.shape[0]
    starts = np.arange(0, t, hop)
    starts = starts[starts + window_length <= t]
    # the reference builds windows at every hop and drops the last list entry;
    # keeping only fully-inside windows is equivalent for hop = window/2
    idx = starts[:, None] + np.arange(window_length)[None, :]
    return x[idx]


def mvn_normalize(x: Array, axes=(0, 1)) -> Array:
    """Mean-variance normalization over the given axes (the eval-time EEG
    contract, ref train_clip_helper_functions.py:136)."""
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    return (x - mean) / std


def hann_window(n: int) -> Array:
    """torch.hann_window default (periodic): 0.5*(1-cos(2πk/N))."""
    k = jnp.arange(n)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * k / n))


def overlap_add_hann(segments: Array, total_length: int, window_length: int) -> Array:
    """Hann-weighted 50%-overlap-add reconstruction with boundary correction.

    Ref train_clip_helper_functions.py:306-325: every segment is weighted by a
    Hann window except that the first half of the first segment and the last
    half of the last segment get weight 1; segments are summed at hops of
    ``window_length // 2``.

    ``segments``: ``[n_segments, window_length]`` → ``[total_length]``.
    """
    n_seg = segments.shape[0]
    hop = window_length // 2
    hann = jnp.tile(hann_window(window_length)[None, :], (n_seg, 1))
    hann = hann.at[0, 0:hop].set(1.0)
    hann = hann.at[-1, hop:].set(1.0)
    weighted = segments * hann
    idx = (
        jnp.arange(n_seg)[:, None] * hop + jnp.arange(window_length)[None, :]
    ).reshape(-1)
    return (
        jnp.zeros((total_length,), segments.dtype)
        .at[idx]
        .add(weighted.reshape(-1), mode="drop")
    )
