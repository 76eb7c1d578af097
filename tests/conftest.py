"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the analogue of the reference's
``mpirun -np N`` single-box testing with NUM_MPI_PROCS ≤ 8,
packages/tpetra/core/test/Map/CMakeLists.txt:2-23) and with x64 enabled so
fp64 convergence tolerances (Belos default 1e-8) are meaningful.
"""
import os

# must be set before jax import; force-override (the session may point JAX
# at the tunneled TPU chip — unit tests always run on the virtual CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the baked-in TPU-tunnel plugin (axon) registers itself at interpreter
# startup regardless of JAX_PLATFORMS; the config update below actually
# forces the CPU backend for the unit-test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: shard_map/while-loop programs dominate suite
# wall time; cache survives across pytest processes (TT_JAX_CACHE=0
# disables it).
_cache = os.environ.get("TT_JAX_CACHE", "/tmp/tt-jax-cache")
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# The XLA:CPU compiler deterministically SEGFAULTS after ~535
# compilations in one process on this box (independent of which test
# lands there and of the persistent cache — measured by bisecting a
# single-process run; every test passes in per-file runs). Bound the
# in-process compiler state by dropping JAX's compiled-program caches
# every N tests; recompiles reload from the persistent cache cheaply.
_TEST_COUNT = [0]
_CLEAR_EVERY = int(os.environ.get("TT_CLEAR_CACHES_EVERY", "150"))


@pytest.fixture(autouse=True)
def _bound_compiler_state():
    yield
    _TEST_COUNT[0] += 1
    if _CLEAR_EVERY and _TEST_COUNT[0] % _CLEAR_EVERY == 0:
        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """Auto-mark the heavyweight files so `-m "not slow"` is a quick
    (<2 min) suite; the full suite stays the default."""
    slow_files = {"test_dist.py", "test_baseline_configs.py",
                  "test_dist_precond.py", "test_combine_modes.py"}
    for item in items:
        if item.path.name in slow_files:
            item.add_marker(pytest.mark.slow)
