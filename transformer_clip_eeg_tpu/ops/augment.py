"""EEG data augmentation as jittable JAX ops (braindecode-equivalent).

The reference delegates to braindecode transforms (ref ``dataset_loader.py:5,
113-165``) with the hard-coded ``BEST_AUG_PARAMS``.  Here each augmentation is
a pure JAX function applied batched on device — no host round-trip in the
train loop.

Axis convention quirk (replicated deliberately): the reference feeds batches
of shape ``[bs, window, 64]`` to braindecode, whose transforms treat axis 1 as
"channels" and axis 2 as "time".  So e.g. ChannelsDropout actually drops
*time windows* and the "time axis" is the 64 EEG electrodes.  These functions
use the same convention — ``channel_axis=1``, ``time_axis=2`` on the raw
``[bs, window, 64]`` batch — to match what the reference actually executes.

Each transform applies per-sample with probability ``p`` (braindecode
``Transform.probability`` semantics).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# ref dataset_loader.py:115-144
BEST_AUG_PARAMS = {
    "GaussianNoise": {"std": 0.16},
    "FrequencyShift": {"max_delta_freq": 0.6, "sfreq": 100},
    "FTSurrogate": {"phase_noise_magnitude": 1.0},
    "SmoothTimeMask": {"mask_len_samples": 20},
    "ChannelsDropout": {"p_drop": 0.2},
    "ChannelsShuffle": {"p_shuffle": 0.6},
    "BandstopFilter": {"bandwidth": 0.6, "sfreq": 100},
}


def _per_sample_mask(key: Array, batch: Array, p: float) -> Array:
    """[B] boolean — which samples get the transform."""
    return jax.random.bernoulli(key, p, (batch.shape[0],))


def _apply_masked(mask: Array, augmented: Array, original: Array) -> Array:
    return jnp.where(mask[:, None, None], augmented, original)


def sign_flip(key: Array, x: Array, p: float) -> Array:
    k1, _ = jax.random.split(key)
    return _apply_masked(_per_sample_mask(k1, x, p), -x, x)


def gaussian_noise(key: Array, x: Array, p: float, std: float = 0.16) -> Array:
    k1, k2 = jax.random.split(key)
    noise = std * jax.random.normal(k2, x.shape, x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), x + noise, x)


def ft_surrogate(
    key: Array, x: Array, p: float, phase_noise_magnitude: float = 1.0
) -> Array:
    """Randomize Fourier phases along the time axis (braindecode FTSurrogate;
    one shared phase draw across channels, i.e. channel_indep=False)."""
    k1, k2 = jax.random.split(key)
    b, c, t = x.shape
    f = jnp.fft.fft(x.astype(jnp.float32), axis=2)
    n_half = t // 2 - 1 if t % 2 == 0 else (t - 1) // 2
    phases = (
        jax.random.uniform(k2, (b, 1, n_half)) * phase_noise_magnitude * 2 * jnp.pi
    )
    ones = jnp.ones((b, 1, 1))
    if t % 2 == 0:
        rot = jnp.concatenate(
            [ones, jnp.exp(1j * phases), ones, jnp.exp(-1j * phases[..., ::-1])],
            axis=2,
        )
    else:
        rot = jnp.concatenate(
            [ones, jnp.exp(1j * phases), jnp.exp(-1j * phases[..., ::-1])], axis=2
        )
    aug = jnp.real(jnp.fft.ifft(f * rot, axis=2)).astype(x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def frequency_shift(
    key: Array, x: Array, p: float, max_delta_freq: float = 0.6, sfreq: float = 100.0
) -> Array:
    """Shift the spectrum by Δf ~ U(-max, max) via the analytic signal."""
    k1, k2 = jax.random.split(key)
    b, c, t = x.shape
    delta = jax.random.uniform(
        k2, (b, 1, 1), minval=-max_delta_freq, maxval=max_delta_freq
    )
    xf = jnp.fft.fft(x.astype(jnp.float32), axis=2)
    # analytic signal (hilbert): zero negative freqs, double positive
    h = jnp.zeros((t,))
    if t % 2 == 0:
        h = h.at[0].set(1).at[t // 2].set(1).at[1 : t // 2].set(2)
    else:
        h = h.at[0].set(1).at[1 : (t + 1) // 2].set(2)
    analytic = jnp.fft.ifft(xf * h, axis=2)
    times = jnp.arange(t) / sfreq
    shifted = analytic * jnp.exp(2j * jnp.pi * delta * times)
    aug = jnp.real(shifted).astype(x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def bandstop_filter(
    key: Array, x: Array, p: float, bandwidth: float = 0.6, sfreq: float = 100.0
) -> Array:
    """Notch out a random band [f0, f0+bw] via an FFT brick-wall mask.

    (braindecode uses an IIR notch; a spectral mask is the natural on-device
    equivalent with the same effect for augmentation purposes.)"""
    k1, k2 = jax.random.split(key)
    b, c, t = x.shape
    nyq = sfreq / 2.0
    f0 = jax.random.uniform(
        k2, (b, 1, 1), minval=1.0, maxval=max(nyq - bandwidth - 1.0, 1.0 + 1e-3)
    )
    freqs = jnp.abs(jnp.fft.fftfreq(t, d=1.0 / sfreq))
    stop = (freqs >= f0) & (freqs <= f0 + bandwidth)
    xf = jnp.fft.fft(x.astype(jnp.float32), axis=2)
    aug = jnp.real(jnp.fft.ifft(jnp.where(stop, 0.0, xf), axis=2)).astype(x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def smooth_time_mask(
    key: Array, x: Array, p: float, mask_len_samples: int = 20
) -> Array:
    """Sigmoid-smoothed zero mask of fixed length at a random position."""
    k1, k2 = jax.random.split(key)
    b, c, t = x.shape
    start = jax.random.uniform(
        k2, (b, 1, 1), minval=0.0, maxval=max(t - mask_len_samples, 1)
    )
    tgrid = jnp.arange(t)[None, None, :]
    # braindecode: sigmoid ramp up at start, down at start+len (temp 2)
    mask = jax.nn.sigmoid(2.0 * (tgrid - start)) * jax.nn.sigmoid(
        -2.0 * (tgrid - start - mask_len_samples)
    )
    aug = x * (1.0 - mask).astype(x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def channels_dropout(key: Array, x: Array, p: float, p_drop: float = 0.2) -> Array:
    k1, k2 = jax.random.split(key)
    b, c, t = x.shape
    keep = jax.random.bernoulli(k2, 1.0 - p_drop, (b, c, 1))
    aug = x * keep.astype(x.dtype)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def channels_shuffle(key: Array, x: Array, p: float, p_shuffle: float = 0.6) -> Array:
    """Randomly permute a p_shuffle-subset of channels (per sample)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, c, t = x.shape
    in_subset = jax.random.bernoulli(k2, p_shuffle, (b, c))

    def shuffle_one(key, sel, xi):
        # permute the selected channels among themselves, identity elsewhere
        noise = jax.random.uniform(key, (c,))
        shuffled_sel = jnp.argsort(jnp.where(sel, noise, jnp.inf))  # random order
        src = jnp.nonzero(sel, size=c, fill_value=c)[0]  # selected slots (pad c)
        perm = jnp.arange(c).at[src].set(shuffled_sel, mode="drop")
        return xi[perm]

    keys = jax.random.split(k3, b)
    aug = jax.vmap(shuffle_one)(keys, in_subset, x)
    return _apply_masked(_per_sample_mask(k1, x, p), aug, x)


def mixup_eeg(key: Array, eeg: Array, probability: float) -> Array:
    """Cross-subject EEG mixup ('addEEG', ref dataset_loader.py:333-356).

    ``eeg`` is ``[n_subs, n_windows, wl, 64]``.  Per (subject, window) with
    probability p: convex-combine with a random other subject's EEG for the
    *same* window, α ~ U(0, 1).  The reference does this in a double Python
    loop on the host — here it is one vectorized gather on device.
    """
    n_subs, n_win = eeg.shape[0], eeg.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    probabilities = jax.random.uniform(k1, (n_subs, n_win))
    alphas = jax.random.uniform(k2, (n_subs, n_win))
    do_aug = probabilities < probability
    m = 1.0 - alphas * do_aug  # weight on the original
    partner = jax.random.randint(k3, (n_subs, n_win), 0, n_subs)
    partner_eeg = eeg[partner, jnp.arange(n_win)[None, :]]
    return (
        m[..., None, None] * eeg + (1.0 - m[..., None, None]) * partner_eeg
    ).astype(eeg.dtype)


_TRANSFORMS: Dict[str, Callable] = {
    "SignFlip": sign_flip,
    "GaussianNoise": gaussian_noise,
    "FTSurrogate": ft_surrogate,
    "FrequencyShift": frequency_shift,
    "BandstopFilter": bandstop_filter,
    "SmoothTimeMask": smooth_time_mask,
    "ChannelsDropout": channels_dropout,
    "ChannelsShuffle": channels_shuffle,
}


def make_augmentation_fn(
    names: Sequence[str], probability: float
) -> Callable[[Array, Array], Array]:
    """Compose named augmentations (ref dataset_loader.py:147-165) into one
    jittable ``fn(key, batch) -> batch`` using BEST_AUG_PARAMS."""
    steps = []
    for name in names:
        if name not in _TRANSFORMS:
            raise ValueError(f"unknown augmentation {name!r}")
        params = BEST_AUG_PARAMS.get(name, {})
        steps.append(partial(_TRANSFORMS[name], p=probability, **params))

    def apply(key: Array, batch: Array) -> Array:
        for i, step in enumerate(steps):
            key, sub = jax.random.split(key)
            batch = step(sub, batch)
        return batch

    return apply
