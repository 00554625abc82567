"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard JAX trick for
testing `jax.sharding` layouts without TPU hardware (SURVEY.md §4).
x64 is enabled so exact-oracle comparisons (Kalman vs PF) are meaningful.
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which is wrong for the 8-device virtual mesh and slow for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below is what actually forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The XLA CPU backend segfaults inside `backend_compile_and_load` when a
    single process accumulates the whole suite's compilations (reproduced
    twice at ~95% of the full run, in different tests; any subset passes).
    Clearing per module keeps within-module jit reuse (where all the reuse
    is) while bounding per-process compiler state.
    """
    yield
    jax.clear_caches()
