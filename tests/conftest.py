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
# wall time; cache survives across pytest processes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TT_JAX_CACHE", "/tmp/tt-jax-cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_collection_modifyitems(config, items):
    """Auto-mark the heavyweight files so `-m "not slow"` is a quick
    (<2 min) suite; the full suite stays the default."""
    slow_files = {"test_dist.py", "test_baseline_configs.py",
                  "test_dist_precond.py", "test_combine_modes.py"}
    for item in items:
        if item.path.name in slow_files:
            item.add_marker(pytest.mark.slow)
