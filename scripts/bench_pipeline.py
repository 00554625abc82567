"""A/B micro-bench: fused-kernel qp-group software pipelining (VERDICT r2 #3).

Times the flagship bench.py configuration (SVM, N=1024, S=40/B=10,
Poyiadjis-O(N), in-kernel RNG) with `PFScoreConfig.pipeline` off vs on.
The pipelined kernel issues qp group i+1's B1 build + MXU gather dot
before group i's VPU tail, aiming to overlap the (asynchronous) dot with
the tail's vector work; the phase ablation in BENCH_NOTES (dot 0.35us /
B1 0.24us / tail 0.28us per chain-step) bounds the win at ~1.6x if the
overlap is perfect, 1.0x if Mosaic already schedules it or serializes
anyway.  Run on TPU: python scripts/bench_pipeline.py [--chains 8192]
"""
import argparse
import json
import os
import sys
import time

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench(pipeline: bool, n_chains: int, iters: int = 20):
    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.models import svm

    T = 1000
    key = jax.random.PRNGKey(0)
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.fold_in(key, 1), true, T)
    cfg = sgmcmc.PFScoreConfig(
        n_particles=1024, subsequence_length=40, buffer_length=10,
        minibatch_size=1, smoother="poyiadjis_N", resampler="systematic",
        resample_mode="auto",
        rng="kernel" if jax.default_backend() == "tpu" else "host",
        pipeline=pipeline)
    score_fn = sgmcmc.make_pf_score_fn(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        cfg, T,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        fused_model=svm.FUSED)
    prior = svm.default_prior()
    grad_fn = sgmcmc.make_noisy_grad_fn(
        score_fn, lambda p: svm.grad_logprior(prior, p), T)

    def chain_step(k, p, obs):
        new, ll = sgmcmc.sgld_step(k, p, obs, grad_fn, epsilon=0.1, T=T)
        return svm.project_parameters(new), ll

    def multi(keys, params, obs):
        def body(p, i):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            p, ll = jax.vmap(chain_step, in_axes=(0, 0, None))(ks, p, obs)
            return p, ll
        return jax.lax.scan(body, params,
                            jnp.arange(iters, dtype=jnp.int32))

    fit = jax.jit(multi, donate_argnums=(1,))
    keys = jax.random.split(jax.random.fold_in(key, 2), n_chains)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape).copy(),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0))
    p, ll = fit(keys, params0, ys)
    float(jnp.sum(ll[-1]))           # sync via host transfer (axon)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p, ll = fit(keys, p, ys)
        float(jnp.sum(ll[-1]))
        best = min(best, time.perf_counter() - t0)
    return n_chains * iters / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    args = ap.parse_args()
    base = bench(False, args.chains)
    print(json.dumps({"pipeline": False, "steps_per_s": round(base, 1)}),
          flush=True)
    piped = bench(True, args.chains)
    print(json.dumps({"pipeline": True, "steps_per_s": round(piped, 1),
                      "speedup": round(piped / base, 4)}), flush=True)


if __name__ == "__main__":
    main()
