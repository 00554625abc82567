"""Island-fused smoother bias vs island size (VERDICT r2 #2).

`island_fused=True` (`parallel/training.py`) runs the fused Pallas window
kernel per particle shard as P independent N/P-particle filters and
psum-averages the Fisher-identity scores.  Averaging independent islands
leaves the *expectation* equal to a single island-size filter's score, so
the island bias IS the Poyiadjis-smoother bias at N = island size
(reference estimator contract: `particle_filters/pf.py:84-136`; Vergé et
al. 2015 island PF).

This sweep measures that bias directly on the LGSSM (exact Kalman gradient
oracle, `ops/kalman.py`): for each island size M it runs R replicates of
the fused window score at N=M and reports E[score] - exact per natural
coordinate, alongside (a) the gather-mode global-resampling estimator at
the full N (what sharding WITHOUT island mode computes) and (b) the
Nemeth lambda=0.95 O(N) smoother at full N — the analogous
bias-for-throughput trade already documented in BENCH_NOTES.

Run on TPU (fused kernel native): python scripts/island_bias_sweep.py
Writes scripts/island_bias_sweep.json and prints a markdown table.
"""
import json
import os
import sys
import time

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sgmcmc_tpu.models import lgssm
    from sgmcmc_tpu.ops.buffered import run_buffered_pf
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    interpret = jax.default_backend() != "tpu"
    W = 48          # full window, no buffering: pure smoother bias
    R = 256
    params64 = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                   R=[[0.7]])
    ys64, _ = lgssm.generate_data(jax.random.PRNGKey(0), params64, W)
    exact = lgssm.gradient_marginal_loglikelihood(params64, ys64)
    exact_vec = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])

    dtype = jnp.float32
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype),
                                    params64)
    ys = jnp.asarray(ys64, dtype)
    step_w = jnp.ones((W,), dtype)
    pm = jnp.zeros((), dtype)
    pv = jnp.asarray(10.0, dtype)
    fm = lgssm.get_fused(None)

    def fused_batch(M):
        def one(k):
            stat, ll = fused_pf_score(fm, k, params, ys, step_w, M, pm, pv,
                                      lambduh=1.0, interpret=interpret)
            return stat, ll
        return jax.jit(jax.vmap(one))

    def gather_batch(N, smoother, lambduh=0.95):
        def one(k):
            out = run_buffered_pf(
                lgssm.get_kernel("optimal"), lgssm.grad_statistic, params,
                ys, key=k, n_particles=N,
                statistic_dim=lgssm.statistic_dim(1, 1), smoother=smoother,
                prior_mean=jnp.zeros((1,), dtype),
                prior_var=10.0 * jnp.eye(1, dtype=dtype),
                resampler="systematic", resample_mode="gather",
                lambduh=lambduh)
            return out.mean_statistic, out.loglikelihood
        return jax.jit(jax.vmap(one))

    rows = []

    def record(label, fn, M):
        keys = jax.random.split(jax.random.PRNGKey(12345), R)
        t0 = time.time()
        stats, lls = fn(keys)
        stats = np.asarray(jax.device_get(stats), np.float64)
        elapsed = time.time() - t0
        mean = stats.mean(axis=0)
        se = stats.std(axis=0) / np.sqrt(R)
        bias = mean - exact_vec
        rel = np.abs(bias) / (np.abs(exact_vec) + 1e-12)
        rows.append(dict(label=label, N=M, reps=R,
                         bias=bias.tolist(), se=se.tolist(),
                         max_rel_bias=float(rel.max()),
                         max_abs_bias=float(np.abs(bias).max()),
                         seconds=elapsed))
        print(f"{label:28s} N={M:5d}  max|bias|={np.abs(bias).max():.4f}  "
              f"max rel={rel.max():.4f}  se~{se.max():.4f}  "
              f"[{elapsed:.1f}s]", flush=True)

    for M in [64, 128, 256, 512, 1024]:
        record("island (fused, per-island)", fused_batch(M), M)
    record("global resampling (gather)", gather_batch(
        1024, "poyiadjis_N", 1.0), 1024)
    record("nemeth lambda=0.95 (gather)", gather_batch(
        1024, "nemeth", 0.95), 1024)

    out = dict(W=W, reps=R, exact=exact_vec.tolist(),
               coords=["LRinv", "LQinv", "C", "A"], rows=rows)
    path = os.path.join(os.path.dirname(__file__), "island_bias_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")

    print("\n| estimator | N (island) | max |bias| | max rel bias |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['label']} | {r['N']} | {r['max_abs_bias']:.4f} "
              f"| {r['max_rel_bias']:.3f} |")


if __name__ == "__main__":
    main()
