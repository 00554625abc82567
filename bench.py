"""Headline benchmark: aggregate SGLD steps/s on the flagship SVM config.

Runs the full buffered-PF SGLD update (subsequence sampling, N=1024-particle
Poyiadjis-O(N) Fisher-identity score over a S=40/B=10 window, prior
gradient, Langevin noise, projection) for 8192 vmapped chains on one chip
— through the PUBLIC multi-chain API (`Sampler.fit_scan(num_chains=...)`,
record='none'), so the headline number is exactly what a user of the
documented surface gets (r4: previously this file hand-wired the vmap).

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

from sgmcmc_tpu.inference.samplers import SVMSampler
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

    sampler = SVMSampler(observations=ys, seed=2)
    sampler.parameters = svm.from_scalars(A=0.5, Q=1.0, R=2.0)
    kw = dict(
        N=N_PARTICLES, subsequence_length=SUBSEQ, buffer_length=BUFFER,
        pf="poyiadjis_N", resampler="systematic", resample_mode="auto",
        rng="kernel" if jax.default_backend() == "tpu" else "host")

    def run():
        _, aux = sampler.fit_scan(
            "SGLD", num_iters=ITERS, epsilon=0.1, num_chains=N_CHAINS,
            record="none", return_aux=True, **kw)
        # sync via a host transfer of a value depending on the full
        # computation — block_until_ready on the remote (axon) backend
        # returns before execution finishes (~10^4x inflation)
        return float(jnp.sum(aux[:, -1]))

    run()                       # warm-up (compile)
    t0 = time.perf_counter()
    run()
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
