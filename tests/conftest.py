"""Test configuration: force a local 8-virtual-device CPU JAX platform.

The container's sitecustomize imports jax at interpreter start and registers
a remote-TPU "axon" backend (JAX_PLATFORMS=axon, with network round-trips on
every compile).  Setting the env var here is too late — jax is already
imported — but jax.config.update("jax_platforms", ...) still works, and
XLA_FLAGS is read at backend init, which hasn't happened yet at conftest
time.  Tests therefore run on a local 8-virtual-device CPU mesh; bench.py
keeps the axon env and runs on the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's wall time is dominated by XLA
# compiles of the big fused-chunk programs; executables are keyed on the
# HLO hash, so code changes invalidate exactly the affected programs.
#
# The cache dir is scoped by a MACHINE fingerprint: the cache key does NOT
# include the host CPU feature set, and this working tree persists across
# build machines — loading an XLA:CPU AOT executable compiled on a
# different CPU generation warns "Machine type ... doesn't match" and can
# SIGILL mid-suite (observed 2026-08-22: a round-4 cache entry segfaulted
# the whole pytest process inside compilation_cache.get_executable).


def _machine_cache_dir() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except Exception:
        import platform

        flags = platform.processor() or "unknown"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache",
                        f"machine-{tag}")


jax.config.update("jax_compilation_cache_dir", _machine_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled-program memory between test modules.

    The suite compiles ~160 distinct jit signatures; on the 2-CPU box the
    accumulated compile-cache memory segfaulted XLA at ~95% of a single-
    process run (round-1 verdict).  Dropping caches per module bounds the
    growth; tests/run_all.py remains as the per-file-subprocess fallback.
    """
    yield
    jax.clear_caches()
