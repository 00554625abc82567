"""TPU probe: dense vs chunked [N,N] backward-weight smoothers at large N.

The reference runs PaRIS at N=10,000 for exchange-rate KSD scores
(`demo/exchange_rate/calculate_ksd.py:80`) and Poyiadjis at N=1e6 for
ground-truth gradients (`svm_grad_compare.py:75`).  This probe times one
buffered window at those N on the real chip for bw_chunk in
{None, 256, 1024, 4096} and prints ms/window (timed against a scalar host
transfer — `jax.block_until_ready` returns early on the axon backend).

Usage: nohup timeout 900 python -u scripts/tpu_check_bw_chunk.py > log 2>&1 &
"""
import sys
import time

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops import buffered


def time_window(smoother, n, bw_chunk, W=20, reps=3):
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), params, W)
    ys = ys.astype(jnp.float32)

    @jax.jit
    def run(key):
        out = buffered.run_buffered_pf(
            svm.KERNEL, svm.grad_statistic, params, ys, key=key,
            n_particles=n, statistic_dim=3, smoother=smoother,
            bw_chunk=bw_chunk, prior_mean=0.0,
            prior_var=svm.stationary_variance(params))
        return out.loglikelihood

    try:
        ll = run(jax.random.PRNGKey(1))
        float(ll)  # forces execution (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for r in range(reps):
            float(run(jax.random.PRNGKey(2 + r)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{smoother:14s} N={n:6d} bw_chunk={str(bw_chunk):6s} "
              f"{dt * 1e3:9.1f} ms/window  loglik={float(ll):.2f}",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — report OOM/compile failures
        print(f"{smoother:14s} N={n:6d} bw_chunk={str(bw_chunk):6s} "
              f"FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    for smoother in ["paris", "poyiadjis_N2"]:
        for n, chunks in [(10_000, [None, 500, 2500]),
                          (40_000, [None, 2000, 8000])]:
            for chunk in chunks:
                time_window(smoother, n, chunk)
    # Poyiadjis-O(N) reference point at the ground-truth scale
    for n in [100_000, 1_000_000]:
        time_window("poyiadjis_N", n, None)


if __name__ == "__main__":
    main()
