"""Test configuration: force a virtual 8-device CPU mesh before JAX imports.

Multi-chip sharding tests run against 8 virtual CPU devices
(``--xla_force_host_platform_device_count=8``); real-TPU execution is
exercised by bench.py / the driver, not by the unit suite.
"""

import os

# The session environment presets JAX_PLATFORMS=axon (one real tunneled TPU
# chip); the unit suite must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jaxtyping's pytest plugin imports jax before this conftest runs, so jax's
# config may already have captured JAX_PLATFORMS=axon — override it directly
# (safe as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _restore_default_prng_impl():
    """Trainer construction sets the global default PRNG impl from
    ``TrainConfig.prng_impl`` (rbg by default); snapshot/restore it per test
    so a Trainer test can't change the streams a later test sees."""
    before = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != before:
        jax.config.update("jax_default_prng_impl", before)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
