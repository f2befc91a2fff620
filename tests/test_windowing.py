"""Windowing / MVN / Hann overlap-add parity with the reference math."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from transformer_clip_eeg_tpu.ops.windowing import (
    hann_window,
    mvn_normalize,
    overlap_add_hann,
    sliding_windows,
    split_into_windows,
)


def test_hann_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(192)), torch.hann_window(192).numpy(), atol=1e-6
    )


def test_mvn_matches_reference_contract(rng):
    # ref train_clip_helper_functions.py:136 — normalize over (segments, time)
    x = rng.standard_normal((10, 192, 64)).astype(np.float32)
    ref = (x - np.mean(x, axis=(0, 1), keepdims=True)) / np.std(
        x, axis=(0, 1), keepdims=True
    )
    np.testing.assert_allclose(np.asarray(mvn_normalize(jnp.asarray(x))), ref,
                               atol=1e-5)


def test_overlap_add_matches_reference_loop(rng):
    # reference semantics (helper:306-325) re-implemented directly in torch
    wl, n_seg = 192, 7
    hop = wl // 2
    time_dim = hop * (n_seg - 1) + wl
    segs = rng.standard_normal((n_seg, wl)).astype(np.float32)

    hann = torch.hann_window(wl).repeat(n_seg, 1)
    hann[0, 0:hop] = 1
    hann[-1, hop:] = 1
    weighted = torch.from_numpy(segs) * hann
    ref = torch.zeros(time_dim)
    for j in range(n_seg):
        ref[j * hop : j * hop + wl] += weighted[j]

    out = overlap_add_hann(jnp.asarray(segs), time_dim, wl)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_sliding_windows(rng):
    x = rng.standard_normal((10 * 96, 4)).astype(np.float32)
    w = sliding_windows(jnp.asarray(x), 192, 96)
    assert w.shape[1:] == (192, 4)
    np.testing.assert_array_equal(np.asarray(w[1]), x[96 : 96 + 192])


def test_split_into_windows_jax_matches_np(rng):
    x = rng.standard_normal((400, 3)).astype(np.float32)
    out = split_into_windows(jnp.asarray(x), 192)
    assert out.shape == (2, 192, 3)
    np.testing.assert_array_equal(np.asarray(out[0]), x[:192])
