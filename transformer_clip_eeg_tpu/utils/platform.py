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


PRNG_IMPLS = ("rbg", "threefry2x32", "unsafe_rbg")

# the production training default (TrainConfig.prng_impl mirrors this —
# pinned by tests/test_prng_impl.py::test_default_prng_impl_is_shared);
# bench/profile entry points use it so they measure what training runs
DEFAULT_PRNG_IMPL = "rbg"


def configure_prng_impl(impl: str) -> None:
    """Set jax's default PRNG implementation (``jax_default_prng_impl``).

    ``rbg`` (the training default, ``TrainConfig.prng_impl``) derives keys
    with threefry — same split/fold_in quality as jax's default — but
    generates bits with the hardware-friendly XLA ``RngBitGenerator``;
    measured +16–20% flagship train-step throughput over ``threefry2x32``
    on one v5e chip (PERF.md), because the 10 conv-block dropout masks
    ([128, 192, 64] each/step) stop paying threefry's per-bit cost.
    ``threefry2x32`` restores jax's default streams (bit-reproducibility
    with runs recorded before this option existed); ``unsafe_rbg`` exists
    for completeness and benchmarks only.

    Keys created *before* the switch keep their original implementation
    (jax keys are typed), so calling this late affects only later
    ``PRNGKey`` calls.  ``JAX_DEFAULT_PRNG_IMPL`` in the environment wins
    over ``impl`` — standard jax behavior, honored by doing nothing here.
    """
    if impl not in PRNG_IMPLS:
        raise ValueError(
            f"unknown prng_impl {impl!r}; expected one of {PRNG_IMPLS}"
        )
    env = os.environ.get("JAX_DEFAULT_PRNG_IMPL")
    if env:
        # env wins (standard jax behavior) — but say so when it overrides
        # an explicit non-default request, otherwise `--prng_impl
        # threefry2x32` (the documented bit-reproducibility escape hatch)
        # would lose silently and the run's streams would not be what the
        # user asked for
        if env != impl and impl != DEFAULT_PRNG_IMPL:
            print(
                f"warning: JAX_DEFAULT_PRNG_IMPL={env} overrides requested "
                f"prng_impl={impl}; unset the env var to honor the flag"
            )
        return
    import jax

    jax.config.update("jax_default_prng_impl", impl)


def resolve_compile_cache_dir(raw: str, results_root: str) -> str:
    """Resolve a config's ``compile_cache_dir`` value to a real path.

    ``"auto"`` (the config default) means "a ``jit_cache/`` directory under
    ``results_root``" — shared by every run under the same results folder,
    so restarts, ``--only_evaluate`` reloads, the cv loop's next fold
    process, and serving sessions all deserialize the compiled programs
    instead of paying the ~20–40 s TPU compile again.  ``""`` disables the
    cache; any other value is an explicit directory and passes through.

    Every consumer of ``TrainConfig.compile_cache_dir`` must resolve
    through here before calling :func:`enable_compile_cache` — passing the
    ``"auto"`` sentinel straight through would create a literal ``./auto``
    directory in the process cwd.
    """
    if raw == "auto":
        return os.path.join(os.path.abspath(results_root), "jit_cache")
    return raw


def enable_compile_cache(
    cache_dir: str, min_compile_time_secs: float = 1.0
) -> None:
    """Point jax's persistent compilation cache at ``cache_dir``.

    First compilation of the fused train step costs ~20–40 s on TPU; every
    CLI restart, serving-process start, and ``--only_evaluate`` reload pays
    it again because jit caches are in-memory only.  With a cache dir set,
    XLA executables are serialized to disk and later processes deserialize
    instead of recompiling — same program, same devices → cache hit.

    ``min_compile_time_secs`` skips persisting programs cheaper than the
    threshold (jax's default 1.0 s keeps tiny helper jits out of the
    cache); tests pass 0.0 to exercise the path with toy programs.

    A ``JAX_COMPILATION_CACHE_DIR`` environment variable wins over the
    argument (standard jax behavior, same contract as
    :func:`configure_prng_impl`): jax already consumed it as the config
    default at import, so we leave it alone and warn about the conflict.
    No-op when ``cache_dir`` is empty.
    """
    if not cache_dir:
        return
    if cache_dir == "auto":
        # the config sentinel must be resolved against a results root
        # first — enabling it literally would litter ./auto in the cwd
        raise ValueError(
            "compile_cache_dir='auto' is a config sentinel; resolve it "
            "with resolve_compile_cache_dir(raw, results_root) first"
        )
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        if os.path.abspath(env) != os.path.abspath(cache_dir):
            print(
                f"warning: JAX_COMPILATION_CACHE_DIR={env} overrides "
                f"requested compile_cache_dir={cache_dir}; unset the env "
                "var to honor the flag"
            )
        return
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # same env-wins contract as the cache dir: a user-set
    # JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS already seeded the config
    # default at import — don't clobber it with our default argument
    if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            min_compile_time_secs,
        )
    # jax's persistent-cache backend is a lazily-created singleton that
    # latches the dir it was first initialized with — updating the config
    # after any compile has touched the cache silently keeps writing to the
    # OLD dir.  Reset it so the new dir takes effect in-process (the CLI's
    # --only_evaluate overlay and the test suite both repoint mid-process).
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        _cc.reset_cache()
    except Exception:
        pass


def trim_host_heap() -> None:
    """Return freed glibc heap pages to the OS (``malloc_trim``).

    The per-fold evaluation suites allocate/free many ~10 MB numpy arrays
    (per-recording EEG, windowed copies); glibc's dynamic mmap threshold
    promotes these to the sbrk heap, where freed pages are retained by the
    allocator instead of returned.  Across a 9-fold ``cv --parallel`` eval
    pass on the 20 GB rehearsal corpus this retention alone grew RSS from
    ~50 GB to >110 GB and got the process OOM-killed on a 125 GB host
    (measured 2026-08-21, dmesg oom-kill of the fold-5 eval).  A trim after
    each fold's suite keeps RSS at the true working set.  No-op on
    non-glibc platforms.
    """
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def host_rss_gb() -> float:
    """Current process resident set in GiB (0.0 where /proc is absent).

    Reads ``/proc/self/statm`` (pages) rather than ``ru_maxrss`` — the
    latter is a high-water mark and cannot show that a trim/cache-release
    actually lowered residency."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 2**30
    except Exception:
        return 0.0


def host_mem_total_gb() -> float:
    """Memory actually available to THIS process in GiB (0.0 if unknowable).

    The minimum of physical RAM and any cgroup limit: inside a container
    capped below the machine's RAM, sizing a guard off SC_PHYS_PAGES alone
    would let the process sail past the cgroup ceiling and get OOM-killed
    before the guard ever fires (the fold-5 failure mode of SCALE.md r4,
    reproduced in a memory-limited container)."""
    phys = 0.0
    try:
        phys = (
            os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
        )
    except Exception:
        pass
    limits = [phys] if phys else []
    for path in (
        "/sys/fs/cgroup/memory.max",              # cgroup v2
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",  # cgroup v1
    ):
        try:
            raw = open(path).read().strip()
        except OSError:
            continue
        if raw == "max":
            continue
        try:
            val = int(raw) / 2**30
        except ValueError:
            continue
        # v1 reports "no limit" as a huge page-rounded number; ignore
        # anything that isn't a real cap below ~1 PiB
        if 0 < val < 2**20:
            limits.append(val)
    return min(limits) if limits else 0.0
