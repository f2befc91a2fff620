"""Make ``JAX_PLATFORMS`` authoritative for CLI entry points.

Some hosts register an accelerator platform from ``sitecustomize`` by
*prepending* it to jax's platform config; ``JAX_PLATFORMS=cpu python -m
...`` then silently runs on the accelerator anyway (config ``axon,cpu`` →
axon wins).  Entry points call :func:`honor_jax_platforms_env` before any
backend use so the documented commands mean what they say on every host.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """If ``JAX_PLATFORMS`` is set, force jax's platform config to exactly
    that value.  No-op when unset or when a backend is already live."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        # a backend was already initialized in-process (library use, not a
        # fresh CLI invocation) — leave it alone
        pass
