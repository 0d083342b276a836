"""Test config: run all tests on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (mirrors the
reference's strategy of testing SIMD paths under an emulator,
`.github/workflows/ci.yml:315-421` / Intel SDE).

Note: the ambient environment tunnels JAX to a real TPU (JAX_PLATFORMS=axon)
and a sitecustomize imports jax at interpreter boot, so plain env-var edits
here are too late — `jax.config.update` is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The suite is compile-dominated (one CPU core, hundreds of jit programs):
# persist compiled executables across runs so repeat suite runs (and the
# next round's) pay XLA compilation once.  Safe on the CPU backend; the
# per-module clear_caches() below only drops in-process state, so cleared
# modules re-load from this disk cache instead of recompiling.
# Default to a repo-local dir (gitignored): /tmp is wiped with the VM,
# which is exactly when the next cold suite run needs the cache most
# (observed: the round-4 "cold" 35:49 run re-filled a cache the wipe had
# emptied).  The repo directory survives wipes.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_TEST_CACHE_DIR", os.path.join(_repo, ".cache", "xla_test")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xD15CA)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA's CPU compiler has been observed to segfault (LLVM crash inside
    backend_compile_and_load) only after ~100 tests' worth of accumulated
    jit executables — the same compile succeeds in a fresh process.
    Dropping the in-process caches at module boundaries bounds that state;
    the cost is re-compiling shared helpers once per module."""
    yield
    jax.clear_caches()
