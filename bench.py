"""Headline benchmark: aggregate SGLD steps/s on the flagship SVM config.

Runs the full buffered-PF SGLD update (subsequence sampling, N=1024-particle
Poyiadjis-O(N) Fisher-identity score over a S=40/B=10 window, prior
gradient, Langevin noise, projection) for many vmapped chains on one chip,
and reports aggregate SGLD steps/s (chains x iters / wall-clock).

Baseline for `vs_baseline`: the north-star target in BASELINE.json is 1e5
aggregate SGLD steps/s at 1024 particles on a v5e-8, i.e. 12,500 steps/s
per chip; `vs_baseline = value / 12500`.  (The NumPy reference runs the
same update at ~2 steps/s on a desktop CPU core — see BENCH_NOTES.md.)

Prints exactly one JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp

from sgmcmc_tpu.inference import sgmcmc
from sgmcmc_tpu.models import svm

N_PARTICLES = 1024
N_CHAINS = 8192
SUBSEQ, BUFFER = 40, 10
T = 1000
ITERS = 20
PER_CHIP_TARGET = 12500.0


def main():
    key = jax.random.PRNGKey(0)
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.fold_in(key, 1), true, T)

    cfg = sgmcmc.PFScoreConfig(
        n_particles=N_PARTICLES, subsequence_length=SUBSEQ,
        buffer_length=BUFFER, minibatch_size=1, smoother="poyiadjis_N",
        resampler="systematic", resample_mode="auto",
        rng="kernel" if jax.default_backend() == "tpu" else "host")
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

    def multi_chain_iters(keys, params, obs):
        def body(p, i):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            p, ll = jax.vmap(chain_step, in_axes=(0, 0, None))(ks, p, obs)
            return p, ll

        return jax.lax.scan(body, params,
                            jnp.arange(ITERS, dtype=jnp.int32))

    fit = jax.jit(multi_chain_iters, donate_argnums=(1,))

    keys = jax.random.split(jax.random.fold_in(key, 2), N_CHAINS)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_CHAINS,) + x.shape).copy(),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0))

    # warm-up (compile); sync via a host transfer of a value depending on
    # the full computation — block_until_ready on the remote (axon) backend
    # returns before execution finishes, which inflates throughput ~10^4x.
    p, ll = fit(keys, params0, ys)
    float(jnp.sum(ll[-1]))

    t0 = time.perf_counter()
    p, ll = fit(keys, p, ys)
    float(jnp.sum(ll[-1]))
    dt = time.perf_counter() - t0

    steps_per_s = N_CHAINS * ITERS / dt
    print(json.dumps({
        "metric": f"aggregate SGLD steps/s, SVM, {N_PARTICLES} particles, "
                  f"S={SUBSEQ} B={BUFFER}, Poyiadjis O(N), 1 chip",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / PER_CHIP_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
