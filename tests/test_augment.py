"""On-device augmentation ops: shape/identity/effect invariants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_clip_eeg_tpu.ops import augment


ALL = [
    "SignFlip", "GaussianNoise", "FTSurrogate", "FrequencyShift",
    "BandstopFilter", "SmoothTimeMask", "ChannelsDropout", "ChannelsShuffle",
]


@pytest.mark.parametrize("name", ALL)
def test_augmentation_applies_and_preserves_shape(name, rng):
    x = jnp.asarray(rng.standard_normal((8, 192, 64)).astype(np.float32))
    fn = augment.make_augmentation_fn([name], probability=1.0)
    key = jax.random.PRNGKey(0)
    y = jax.jit(fn)(key, x)
    assert y.shape == x.shape
    assert y.dtype == x.dtype
    assert not np.allclose(np.asarray(y), np.asarray(x)), name
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("name", ALL)
def test_augmentation_zero_probability_is_identity(name, rng):
    x = jnp.asarray(rng.standard_normal((4, 64, 16)).astype(np.float32))
    fn = augment.make_augmentation_fn([name], probability=0.0)
    y = fn(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_sign_flip_is_exact_negation(rng):
    x = jnp.asarray(rng.standard_normal((4, 16, 8)).astype(np.float32))
    y = augment.sign_flip(jax.random.PRNGKey(0), x, 1.0)
    np.testing.assert_allclose(np.asarray(y), -np.asarray(x), atol=0)


def test_ft_surrogate_preserves_power_spectrum(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 192)).astype(np.float32))
    y = augment.ft_surrogate(jax.random.PRNGKey(0), x, 1.0)
    px = np.abs(np.fft.fft(np.asarray(x), axis=2))
    py = np.abs(np.fft.fft(np.asarray(y), axis=2))
    np.testing.assert_allclose(px, py, atol=1e-3)


def test_channels_shuffle_is_channel_permutation(rng):
    x = jnp.asarray(rng.standard_normal((3, 12, 7)).astype(np.float32))
    y = augment.channels_shuffle(jax.random.PRNGKey(0), x, 1.0, p_shuffle=1.0)
    xs = np.sort(np.asarray(x), axis=1)
    ys = np.sort(np.asarray(y), axis=1)
    np.testing.assert_allclose(xs, ys, atol=0)


def test_channels_dropout_zeroes_whole_channels(rng):
    x = jnp.asarray(rng.standard_normal((2, 50, 5)).astype(np.float32) + 10.0)
    y = np.asarray(
        augment.channels_dropout(jax.random.PRNGKey(3), x, 1.0, p_drop=0.5)
    )
    per_channel = y.sum(axis=2)
    zeroed = per_channel == 0
    assert zeroed.any()
    # non-zeroed channels are untouched
    x_np = np.asarray(x)
    for b in range(2):
        for c in range(50):
            if not zeroed[b, c]:
                np.testing.assert_array_equal(y[b, c], x_np[b, c])


def test_mixup_eeg_matches_host_semantics(rng):
    eeg = jnp.asarray(rng.standard_normal((5, 20, 16, 4)).astype(np.float32))
    mixed = augment.mixup_eeg(jax.random.PRNGKey(0), eeg, probability=1.0)
    assert mixed.shape == eeg.shape
    e = np.asarray(eeg)
    m = np.asarray(mixed)
    # every mixed window is a convex combination of same-window EEGs
    assert m.max() <= e.max() + 1e-5 and m.min() >= e.min() - 1e-5
    assert not np.allclose(m, e)
