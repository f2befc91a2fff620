"""CLIP loss heads and the EMA memory bank.

All heads share the reference pattern (e.g. ref ``clip_model.py:887-944``):
encode both streams → flatten ``[B, T*D]`` → L2-normalize →
``logits = speech @ eeg.T * exp(temperature)`` → symmetric cross-entropy
against ``arange(B)``.  The B×B similarity is one MXU matmul; under a device
mesh the normalized embeddings are all-gathered first (see
``parallel/collective.py``) so the InfoNCE sees the *global* batch.

The memory bank (ref ``clip_model.py:697-745``) is mutable cross-step state;
here it lives in the ``membank`` flax variable collection so it is part of the
train-state pytree, checkpointed by orbax, and updated functionally (callers
pass ``mutable=['membank']``).

Heads expose ``encode_eeg`` / ``encode_speech`` methods for the evaluation
suite (the reference accesses ``model.eegModel`` / ``model.speechModel``
directly, ref ``train_clip_helper_functions.py:105,147``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transformer_clip_eeg_tpu.ops.layers import (
    Dense,
    Dropout,
    LayerNorm,
    l2_normalize,
    leaky_relu,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Loss utilities (ref clip_model.py:1463-1494)
# ---------------------------------------------------------------------------


def cross_entropy(logits: Array, targets: Array) -> Array:
    """torch ``F.cross_entropy`` with integer class targets (mean reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


def soft_cross_entropy(logits: Array, target_probs: Array) -> Array:
    """torch ``F.cross_entropy`` with probability targets (mean reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_probs * logp, axis=-1))


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """torch ``F.binary_cross_entropy_with_logits`` (mean reduction)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def nll_loss(logp: Array, targets: Array) -> Array:
    """torch ``F.nll_loss`` (mean reduction, integer targets)."""
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))


def simloss(x: Array, target: Array) -> Array:
    """ref clip_model.py:1463-1470 — NLL over logits summed across positives."""
    return nll_loss(x.sum(axis=-2), target)


def log_softmax_mp(x: Array) -> Array:
    """ref clip_model.py:1473-1476."""
    denominator = jnp.log(jnp.exp(x).sum(axis=-2).sum(axis=-1))[..., None]
    nominator = jnp.log(jnp.exp(x).sum(axis=-2))
    return nominator - denominator


def multiple_positives_loss(preds: Array, targets: Array) -> Array:
    """ref clip_model.py:1479-1483 (sic 'multiple_postives_loss')."""
    return nll_loss(log_softmax_mp(preds), targets)


def log_gauss(x: Array, mu: Array, logvar: Array) -> Array:
    """ref clip_model.py:1489-1491."""
    log_2pi = math.log(2 * math.pi)
    return -0.5 * (log_2pi + logvar + jnp.square(x - mu) / jnp.exp(logvar))


def kld(p_mu: Array, p_logvar: Array, q_mu: Array, q_logvar: Array) -> Array:
    """ref clip_model.py:1493-1494."""
    return -0.5 * (
        1
        + p_logvar
        - q_logvar
        - (jnp.square(p_mu - q_mu) + jnp.exp(p_logvar)) / jnp.exp(q_logvar)
    )


def flatten_features(x: Array) -> Array:
    """Flatten ``[B, ...]`` to ``[B, -1]`` (torch ``flatten(start_dim=1)``).

    Also the mixed-precision boundary: encoders may run in bfloat16, but
    embeddings are normalized and contrasted in float32."""
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def flatten_maybe_transposed(x: Array) -> Array:
    """The CLIPSimNoLatentProj quirk (ref clip_model.py:893-897): transpose
    the trailing axes when ``shape[1] > shape[2]`` before flattening."""
    if x.ndim == 3 and x.shape[1] > x.shape[2]:
        x = jnp.transpose(x, (0, 2, 1))
    return flatten_features(x)


# ---------------------------------------------------------------------------
# Memory bank (ref clip_model.py:697-745)
# ---------------------------------------------------------------------------


class MemoryBank(nn.Module):
    """EMA memory bank keyed by global segment id.

    ``forward(idx, data)`` gathers rows, EMA-updates them in place
    (``mem = m*mem + (1-m)*data`` on stop-gradient data) and returns the
    *pre-update* rows, detached — exactly the reference semantics where the
    update happens under ``torch.no_grad()`` and the returned averages are
    ``.detach()``-ed.

    Rows are initialized U(0, 1) (ref :721-728); bank shape is
    ``[bank_size + 1, dim]``.  Under data-parallel sharding the bank is
    replicated and the scatter applied identically on every shard with
    globally-gathered (idx, data), keeping it deterministic.
    """

    bank_size: int
    dim: int
    momentum: float = 0.90

    @nn.compact
    def __call__(self, idx: Array, data: Array, update: bool = True) -> Array:
        mem = self.variable(
            "membank",
            "memory",
            lambda: jax.random.uniform(
                self.make_rng("params"), (self.bank_size + 1, self.dim)
            ),
        )
        averages = jax.lax.stop_gradient(mem.value[idx])
        if update and not self.is_initializing():
            new_entry = (
                self.momentum * averages
                + (1.0 - self.momentum) * jax.lax.stop_gradient(data)
            )
            mem.value = mem.value.at[idx].set(new_entry)
        return averages


# ---------------------------------------------------------------------------
# Projection heads (ref clip_model.py:1282-1323)
# ---------------------------------------------------------------------------


class ProjectionHead(nn.Module):
    projection_dim: int = 512
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        projected = Dense(self.projection_dim, name="projection")(x)
        x = leaky_relu(projected)
        x = Dense(self.projection_dim, name="fc")(x)
        x = Dropout(self.dropout, name="dropout")(x, deterministic)
        x = x + projected
        return LayerNorm(name="layer_norm")(x)


class ProjectionHeadLinear(nn.Module):
    projection_dim: int = 512

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Dense(self.projection_dim * 2, name="projection")(x)
        x = leaky_relu(x)
        return Dense(self.projection_dim, name="last_linear")(x)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def _symmetric_infonce(
    speech_features: Array, eeg_features: Array, log_temp: Array
) -> Tuple[Array, Array, Array]:
    """logits = speech @ eeg.T * exp(T); symmetric CE vs arange(B).

    Returns (speech_loss, eeg_loss, logits)."""
    logits = (
        jnp.dot(
            speech_features,
            eeg_features.T,
            preferred_element_type=jnp.float32,
        )
        * jnp.exp(log_temp)
    )
    targets = jnp.arange(logits.shape[0])
    speech_loss = cross_entropy(logits, targets)
    eeg_loss = cross_entropy(logits.T, targets)
    return speech_loss, eeg_loss, logits


class CLIP(nn.Module):
    """Plain symmetric InfoNCE head (ref clip_model.py:657-693)."""

    eegModel: nn.Module
    speechModel: nn.Module
    temperature: float = 1.0

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array = None, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = l2_normalize(flatten_features(self.eegModel(eeg, deterministic)), 1)
        sp_f = l2_normalize(
            flatten_features(self.speechModel(speech, deterministic)), 1
        )
        s_loss, e_loss, _ = _symmetric_infonce(sp_f, eeg_f, temp)
        loss = (s_loss + e_loss) / 2.0
        return loss


class CLIPSim(nn.Module):
    """InfoNCE + bias-free latent projections + MSE pull toward the memory-bank
    average (ref clip_model.py:747-810)."""

    eegModel: nn.Module
    speechModel: nn.Module
    bank_size: int
    temperature: float = 1.0
    latent_dim: int = 16
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_average: float = 1.0
    momentum_membank: float = 0.90

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self,
        eeg: Array,
        speech: Array,
        ids: Array,
        deterministic: bool = True,
        update_membank: bool = True,
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = flatten_features(self.eegModel(eeg, deterministic))
        sp_f = flatten_features(self.speechModel(speech, deterministic))
        # bias-free projections; NOTE the reference sizes the *speech*
        # projection from the EEG output dim too (ref clip_model.py:762-763)
        eeg_f = Dense(self.latent_dim, use_bias=False, name="latent_projection_eeg")(
            eeg_f
        )
        sp_f = Dense(
            self.latent_dim, use_bias=False, name="latent_projection_speech"
        )(sp_f)
        eeg_f = l2_normalize(eeg_f, 1)
        sp_f = l2_normalize(sp_f, 1)
        averages = MemoryBank(
            self.bank_size, self.latent_dim, self.momentum_membank,
            name="eegMemoryBank",
        )(ids, eeg_f, update=update_membank)
        averages = l2_normalize(averages, 1)
        s_loss, e_loss, _ = _symmetric_infonce(sp_f, eeg_f, temp)
        loss_ce = (s_loss + e_loss) / 2.0
        eeg_average_loss = jnp.mean(jnp.square(averages - eeg_f))
        loss_total = (
            self.lambda_clip * loss_ce + self.lambda_average * eeg_average_loss
        )
        return loss_ce, eeg_average_loss, loss_total


class CLIPSimNoLatentProj(nn.Module):
    """The default architecture (driver ``train_clip_final.py:177,382-383``).

    Ref clip_model.py:868-944: no projection; transpose-if-wider quirk before
    flatten; the regularizer is a second InfoNCE between memory-bank averages
    and current EEG features with its own temperature.
    """

    eegModel: nn.Module
    speechModel: nn.Module
    bank_size: int
    latent_dim: int  # memory-bank row dim = speech.get_output_dim(window)
    temperature: float = 1.0
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_average: float = 1.0
    momentum_membank: float = 0.90

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self,
        eeg: Array,
        speech: Array,
        ids: Array,
        deterministic: bool = True,
        update_membank: bool = True,
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        temp_eeg = self.param(
            "temperature_eeg", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = flatten_maybe_transposed(self.eegModel(eeg, deterministic))
        sp_f = flatten_maybe_transposed(self.speechModel(speech, deterministic))
        eeg_f = l2_normalize(eeg_f, 1)
        sp_f = l2_normalize(sp_f, 1)
        averages = MemoryBank(
            self.bank_size, self.latent_dim, self.momentum_membank,
            name="eegMemoryBank",
        )(ids, eeg_f, update=update_membank)
        averages = l2_normalize(averages, 1)
        s_loss, e_loss, _ = _symmetric_infonce(sp_f, eeg_f, temp)
        loss_ce = (s_loss + e_loss) / 2.0
        # second InfoNCE: bank averages vs current EEG (ref :934-937)
        avg_loss, _, _ = _symmetric_infonce(averages, eeg_f, temp_eeg)
        loss_total = self.lambda_clip * loss_ce + self.lambda_average * avg_loss
        return loss_ce, avg_loss, loss_total


class BaseMatchMismatch(nn.Module):
    """2-way match/mismatch head (ref clip_model.py:814-865)."""

    eegModel: nn.Module
    speechModel: nn.Module
    latent_dim: int = 16
    window_length: int = 192
    temperature: float = 0.075

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array = None, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = l2_normalize(flatten_features(self.eegModel(eeg, deterministic)), 1)
        sp_f = l2_normalize(
            flatten_features(self.speechModel(speech, deterministic)), 1
        )
        _, _, logits = _symmetric_infonce(sp_f, eeg_f, temp)
        match = jnp.diagonal(logits)
        mismatch = jnp.concatenate(
            [jnp.diagonal(logits, offset=1), logits[-2, -1][None]]
        )
        pair_logits = jnp.stack([match, mismatch], axis=1)  # [B, 2]
        targets = jnp.stack(
            [jnp.ones(pair_logits.shape[0]), jnp.zeros(pair_logits.shape[0])], axis=1
        )
        loss = soft_cross_entropy(pair_logits, targets)
        accuracy = jnp.mean(
            (jnp.argmax(pair_logits, axis=1) == jnp.argmax(targets, axis=1)).astype(
                jnp.float32
            )
        )
        return loss, accuracy


class CLIPNoContrastiveLearning(nn.Module):
    """Ablation: BCE on diag vs superdiag logits (ref clip_model.py:948-995)."""

    eegModel: nn.Module
    speechModel: nn.Module
    window_length: int = 192

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array = None, deterministic: bool = True
    ):
        eeg_f = flatten_maybe_transposed(self.eegModel(eeg, deterministic))
        sp_f = flatten_maybe_transposed(self.speechModel(speech, deterministic))
        eeg_f = l2_normalize(eeg_f, 1)
        sp_f = l2_normalize(sp_f, 1)
        logits = jnp.dot(sp_f, eeg_f.T, preferred_element_type=jnp.float32)
        match = jnp.diagonal(logits)[:-1]
        mismatch = jnp.diagonal(logits, offset=1)
        stacked = jnp.stack([match, mismatch])
        targets = jnp.stack(
            [jnp.ones(logits.shape[0] - 1), jnp.zeros(logits.shape[0] - 1)]
        )
        loss = bce_with_logits(stacked, targets)
        return loss, loss, loss


class CLIPSimMultiplePositives(nn.Module):
    """Multiple positives per speech segment (ref clip_model.py:1000-1078)."""

    eegModel: nn.Module
    speechModel: nn.Module
    temperature: float = 1.0
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_average: float = 1.0

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array = None, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        _ = self.param(
            "temperature_eeg", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = l2_normalize(flatten_features(self.eegModel(eeg, deterministic)), 1)
        sp_f = l2_normalize(
            flatten_features(self.speechModel(speech, deterministic)), 1
        )
        logits = (
            jnp.dot(sp_f, eeg_f.T, preferred_element_type=jnp.float32)
            * jnp.exp(temp)
        )
        n_speech = logits.shape[0]
        n_repeats = logits.shape[1] // n_speech
        targets = jnp.tile(jnp.arange(n_speech), n_repeats)
        eeg_loss = cross_entropy(logits.T, targets)
        logits_speech = logits.reshape(n_speech, -1, n_speech)
        targets_speech = jnp.arange(n_speech)
        speech_loss = multiple_positives_loss(logits_speech, targets_speech)
        sim_loss = simloss(logits_speech, targets_speech)
        loss_ce = (speech_loss + eeg_loss) / 2.0
        loss_total = self.lambda_clip * loss_ce + self.lambda_average * sim_loss
        return loss_ce, sim_loss, loss_total


class CLIPSimMultiplePositivesAdapted(nn.Module):
    """Grouped-and-summed positives variant (ref clip_model.py:1083-1168)."""

    eegModel: nn.Module
    speechModel: nn.Module
    temperature: float = 1.0
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_average: float = 1.0

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array = None, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        _ = self.param(
            "temperature_eeg", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        eeg_f = l2_normalize(flatten_features(self.eegModel(eeg, deterministic)), 1)
        sp_f = l2_normalize(
            flatten_features(self.speechModel(speech, deterministic)), 1
        )
        logits = (
            jnp.dot(sp_f, eeg_f.T, preferred_element_type=jnp.float32)
            * jnp.exp(temp)
        )
        n_speech = logits.shape[0]
        n_repeats = logits.shape[1] // n_speech
        targets = jnp.tile(jnp.arange(n_speech), n_repeats)
        eeg_loss = cross_entropy(logits.T, targets)
        logits_speech = logits.reshape(n_speech, -1, n_speech).sum(axis=1)
        speech_loss = cross_entropy(logits_speech, jnp.arange(n_speech))
        loss_ce = (speech_loss + eeg_loss) / 2.0
        loss_total = self.lambda_clip * loss_ce
        return loss_ce, loss_ce, loss_total


class CLIPKLDNoLatentProj(nn.Module):
    """Variational head with per-segment learnable priors
    (ref clip_model.py:1174-1279)."""

    eegModel: nn.Module
    speechModel: nn.Module
    latent_dimension: int
    number_of_classes: int
    latent_dimension2: int = 64
    temperature: float = 1.0
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_lower_bound: float = 1.0
    lambda_discriminative: float = 1.0

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        _ = self.param(
            "temperature_eeg", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        mu_lookup = self.param(
            "mu_eeg_lookup",
            nn.initializers.normal(1.0),
            (self.number_of_classes + 1, self.latent_dimension2),
        )
        eeg_f = flatten_features(self.eegModel(eeg, deterministic))
        sp_f = flatten_features(self.speechModel(speech, deterministic))
        mu2_eeg = mu_lookup[ids]
        z2_mu = Dense(self.latent_dimension2, name="eeg_mu_linear")(eeg_f)
        z2_logvar = Dense(self.latent_dimension2, name="eeg_logvar_linear")(eeg_f)
        if not deterministic:
            eps = jax.random.normal(self.make_rng("sample"), z2_mu.shape)
            _z2_sample = eps * jnp.exp(0.5 * z2_logvar) + z2_mu
        # priors (ref :1233-1234): z2 var 0.5^2 around mu2; mu2 std-normal
        prior_z2_logvar = jnp.log(0.5 ** 2)
        log_pmu2 = jnp.mean(log_gauss(mu2_eeg, 0.0, jnp.log(1.0 ** 2)), axis=1)
        kld_z2 = jnp.mean(kld(z2_mu, z2_logvar, mu2_eeg, prior_z2_logvar), axis=1)
        lower_bound = jnp.mean(-log_pmu2 + kld_z2, axis=0)
        eeg_n = l2_normalize(eeg_f, 1)
        sp_n = l2_normalize(sp_f, 1)
        s_loss, e_loss, _ = _symmetric_infonce(sp_n, eeg_n, temp)
        loss_ce = (s_loss + e_loss) / 2.0
        loss_total = (
            self.lambda_clip * loss_ce + self.lambda_lower_bound * lower_bound
        )
        return loss_total, loss_ce, jnp.mean(log_pmu2), jnp.mean(kld_z2)


class CLIPKLDWithLatentProj(nn.Module):
    """KLD head with projection heads on both streams
    (ref clip_model.py:1325-1450)."""

    eegModel: nn.Module
    speechModel: nn.Module
    latent_dimension: int
    number_of_classes: int
    temperature: float = 1.0
    window_length: int = 192
    lambda_clip: float = 1.0
    lambda_lower_bound: float = 1.0
    lambda_discriminative: float = 1.0
    projection_head: str = "linear"  # 'linear' | 'non-linear'

    def encode_eeg(self, eeg: Array, deterministic: bool = True) -> Array:
        return self.eegModel(eeg, deterministic)

    def encode_speech(self, speech: Array, deterministic: bool = True) -> Array:
        return self.speechModel(speech, deterministic)

    @nn.compact
    def __call__(
        self, eeg: Array, speech: Array, ids: Array, deterministic: bool = True
    ):
        temp = self.param(
            "temperature", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        _ = self.param(
            "temperature_eeg", lambda k: jnp.asarray(self.temperature, jnp.float32)
        )
        mu_lookup = self.param(
            "mu_eeg_lookup",
            nn.initializers.normal(1.0),
            (self.number_of_classes + 1, self.latent_dimension),
        )
        proj_cls = (
            ProjectionHead if self.projection_head == "non-linear" else
            ProjectionHeadLinear
        )
        eeg_f = flatten_features(self.eegModel(eeg, deterministic))
        sp_f = flatten_features(self.speechModel(speech, deterministic))
        eeg_logvar = proj_cls(self.latent_dimension, name="eeg_logvar_linear")(
            eeg_f, deterministic
        )
        eeg_mu = proj_cls(self.latent_dimension, name="eeg_mu_linear")(
            eeg_f, deterministic
        )
        sp_proj = proj_cls(self.latent_dimension, name="speech_latent_projection")(
            sp_f, deterministic
        )
        eeg_norm = l2_normalize(eeg_mu, 1)
        sp_norm = l2_normalize(sp_proj, 1)
        mu2_eeg = mu_lookup[ids]
        log_pmu2 = jnp.mean(log_gauss(mu2_eeg, 0.0, jnp.log(1.0 ** 2)), axis=1)
        kld_z2 = jnp.mean(
            kld(eeg_mu, eeg_logvar, mu2_eeg, jnp.log(0.5 ** 2)), axis=1
        )
        lower_bound = jnp.mean(-log_pmu2 + kld_z2, axis=0)
        s_loss, e_loss, _ = _symmetric_infonce(sp_norm, eeg_norm, temp)
        loss_ce = (s_loss + e_loss) / 2.0
        loss_total = (
            self.lambda_clip * loss_ce + self.lambda_lower_bound * lower_bound
        )
        return loss_total, loss_ce, jnp.mean(log_pmu2), jnp.mean(kld_z2)
