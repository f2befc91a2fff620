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

# Persistent XLA compile cache shared by the whole suite (and by repeat
# suite runs): most of the suite's wall-clock is jit compilation of the
# same small programs over and over — warm runs skip it.  The env var
# (rather than jax.config) also reaches the CLI/serving subprocesses the
# e2e tests spawn.  Opt out with TEST_COMPILE_CACHE=0; tests that assert
# on cache behavior manage their own dirs/env and are unaffected.
if os.environ.get("TEST_COMPILE_CACHE", "1") != "0":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/tce_tpu_test_jit_cache"
    )
    # (min-compile-time stays at jax's 1.0 s default — setting the env var
    # here would override the explicit min_compile_time_secs=0.0 the cache
    # tests pass, per the env-wins contract in utils/platform.py)

# jaxtyping's pytest plugin imports jax before this conftest runs, so jax's
# config may already have captured JAX_PLATFORMS=axon — override it directly
# (safe as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")
# Same late-import problem for the cache dir: jax captured the (unset) env
# var at import, so the os.environ write above only reaches subprocesses —
# the in-process suite needs the config update too.
if os.environ.get("TEST_COMPILE_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Captured once at conftest import, before any fixture or test runs.  A
# per-test before/after snapshot is NOT enough: module-scoped fixtures run
# *before* a function-scoped autouse fixture's setup, so a module fixture
# that constructs a Trainer (which applies cfg.prng_impl — rbg by default)
# would be snapshotted as the "before" value and the rbg default would latch
# for the rest of the session (observed: the fold-parallel vmap-exactness
# tests fail under ambient rbg in full-suite order but pass standalone).
_PRNG_IMPL_BASELINE = jax.config.jax_default_prng_impl


@pytest.fixture(autouse=True)
def _restore_default_prng_impl():
    """Trainer construction sets the global default PRNG impl from
    ``TrainConfig.prng_impl`` (rbg by default); restore the session baseline
    after every test so no test (or module fixture) can change the streams a
    later test sees."""
    yield
    if jax.config.jax_default_prng_impl != _PRNG_IMPL_BASELINE:
        jax.config.update("jax_default_prng_impl", _PRNG_IMPL_BASELINE)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
