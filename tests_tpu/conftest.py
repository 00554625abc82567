"""Real-TPU hardware lane (RUN_TPU=1): runs on the default (axon/TPU)
backend, OUTSIDE the CPU-forcing conftest of `tests/`.

Run with `scripts/run_checks.sh tpu`.  Never run this concurrently with
the CPU suite — TPU compiles go through a local helper process that the
CPU suite would starve (CLAUDE.md).  The session fixture probes the
tunneled endpoint with a tiny jit matmul first: queue stalls of 2-16 min
with no local cause are normal at session start.
"""
import os
import time

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU") != "1":
        skip = pytest.mark.skip(
            reason="real-chip lane: set RUN_TPU=1 (scripts/run_checks.sh tpu)")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def tpu_probe():
    if os.environ.get("RUN_TPU") != "1":
        yield
        return
    import jax
    import jax.numpy as jnp
    backend = jax.default_backend()
    if backend != "tpu":
        pytest.skip(f"RUN_TPU=1 but default backend is {backend!r}")
    t0 = time.time()
    x = jnp.ones((128, 128), jnp.float32)
    val = float(jax.jit(lambda a: jnp.sum(a @ a))(x))
    assert val == 128.0 ** 3
    print(f"\n[tpu probe] endpoint ready in {time.time() - t0:.1f}s "
          f"({jax.devices()})")
    yield
