"""TPU check: fused-kernel in-kernel RNG (rng='kernel') vs host normals.

1. Statistical: mean SVM score over R replicate chains agrees between the
   two modes within Monte-Carlo error.
2. Timing: flagship bench config (2048 chains x 1024 particles, W=60),
   host vs kernel RNG.
"""
import sys
import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
T, N, C = 40, 256, 512
ys, _ = svm.generate_data(jax.random.PRNGKey(1), params, T)
ys = ys.astype(jnp.float32)
w = jnp.ones((T,), jnp.float32)
pv = float(svm.stationary_variance(params))


def batch(rng):
    f = jax.jit(jax.vmap(lambda k: fused_pf_score(
        svm.FUSED, k, params, ys, w, N, 0.0, pv, rng=rng)[0]))
    return np.asarray(f(jax.random.split(jax.random.PRNGKey(7), C)))


h = batch("host")
k = batch("kernel")
se = np.sqrt(h.std(0) ** 2 / C + k.std(0) ** 2 / C)
z = (h.mean(0) - k.mean(0)) / (se + 1e-9)
print("host mean", h.mean(0), "kernel mean", k.mean(0))
print("z-scores", z)
assert np.all(np.abs(z) < 5), z
print("statistical check OK")

# ---- timing at flagship config
T2, N2, C2, W2 = 60, 1024, 2048, 60
ys2, _ = svm.generate_data(jax.random.PRNGKey(2), params, T2)
ys2 = ys2.astype(jnp.float32)
w2 = jnp.ones((W2,), jnp.float32)


def timed(rng, iters=10):
    f = jax.jit(jax.vmap(lambda k: fused_pf_score(
        svm.FUSED, k, params, ys2[:W2], w2, N2, 0.0, pv, rng=rng)[0]))
    keys = jax.random.split(jax.random.PRNGKey(3), C2)
    out = f(keys)
    float(out[0, 0])  # sync via host transfer (block_until_ready lies here)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(keys)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"rng={rng}: {dt*1e3:.2f} ms / batch "
          f"({C2/dt:.0f} window-evals/s)")
    return dt


dh = timed("host")
dk = timed("kernel")
print(f"kernel-RNG speedup: {dh/dk:.3f}x")
