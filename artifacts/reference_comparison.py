"""Posterior-moment comparison: this framework (TPU) vs the reference NumPy
implementation, on identical synthetic SVM data.

Runs the same SGLD configuration (eps=0.1, S=40, B=10, Poyiadjis O(N)
N=1000, projection each step) from the same initialization through both
implementations, and compares post-burn-in posterior means / sds of the
natural parameters (phi, sigma, tau).  The two chains use different RNGs,
so agreement is expected within Monte-Carlo error of the posterior spread.

Usage: python artifacts/reference_comparison.py [--ours_steps 4000]
       [--ref_seconds 120]
Writes artifacts/reference_comparison.md
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_ours(observations, steps, seed=1):
    import jax
    from sgmcmc_tpu.inference.samplers import SVMSampler
    from sgmcmc_tpu.models import svm

    s = SVMSampler(observations=observations, seed=seed)
    s.parameters = svm.from_scalars(A=0.5, Q=1.0, R=2.0)
    t0 = time.time()
    trace = s.fit_scan("SGLD", num_iters=steps, epsilon=0.1, N=1000,
                       subsequence_length=40, buffer_length=10,
                       pf="poyiadjis_N", resampler="systematic",
                       resample_mode="auto")
    elapsed = time.time() - t0
    burn = steps // 2
    A = np.asarray(trace.A)[burn:, 0, 0]
    lq = np.abs(np.asarray(trace.LQinv_vec)[burn:, 0])
    lr = np.abs(np.asarray(trace.LRinv_vec)[burn:, 0])
    return dict(phi=A, sigma=1.0 / lq, tau=1.0 / lr,
                steps=steps, seconds=elapsed)


def run_reference(observations, seconds, seed=2):
    sys.path.insert(0, "/root/reference")
    import numpy as np
    np.random.seed(seed)
    from sgmcmc_ssm.models.svm import SVMParameters, SVMPrior, SVMSampler

    sampler = SVMSampler(n=1, m=1, observations=np.asarray(observations))
    sampler.prior = SVMPrior.generate_default_prior(n=1, m=1)
    sampler.parameters = SVMParameters(
        A=np.array([[0.5]]), LQinv=np.array([[1.0]]),
        LRinv=np.array([[2.0 ** -0.5]]))
    kw = dict(kind="pf", pf="poyiadjis_N", N=1000, subsequence_length=40,
              buffer_length=10, epsilon=0.1)
    phis, sigmas, taus = [], [], []
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        sampler.sample_sgld(**kw)
        sampler.project_parameters()
        phis.append(float(sampler.parameters.A[0, 0]))
        sigmas.append(float(abs(sampler.parameters.sigma)))
        taus.append(float(abs(sampler.parameters.tau)))
        n += 1
    burn = n // 2
    return dict(phi=np.array(phis[burn:]), sigma=np.array(sigmas[burn:]),
                tau=np.array(taus[burn:]), steps=n,
                seconds=time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours_steps", type=int, default=4000)
    ap.add_argument("--ref_seconds", type=float, default=120.0)
    ap.add_argument("--T", type=int, default=1000)
    args = ap.parse_args()

    import jax
    from sgmcmc_tpu.models import svm
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, args.T)
    obs = np.asarray(ys, dtype=np.float64)

    ours = run_ours(ys, args.ours_steps)
    ref = run_reference(obs, args.ref_seconds)

    lines = ["# Posterior comparison: sgmcmc_tpu (TPU) vs reference NumPy",
             "",
             f"Synthetic SVM, T={args.T}, truth phi=0.9 sigma={0.5**0.5:.3f}"
             f" tau=1.0; SGLD eps=0.1 S=40 B=10 Poyiadjis-O(N) N=1000.",
             "",
             f"- ours: {ours['steps']} steps in {ours['seconds']:.1f}s"
             f" ({ours['steps']/ours['seconds']:.0f} steps/s, 1 chain)",
             f"- reference: {ref['steps']} steps in {ref['seconds']:.1f}s"
             f" ({ref['steps']/ref['seconds']:.1f} steps/s)",
             "",
             "| param | truth | ours mean+-sd | reference mean+-sd | |diff|/sd |",
             "|---|---|---|---|---|"]
    truth = dict(phi=0.9, sigma=0.5 ** 0.5, tau=1.0)
    max_z = 0.0
    for p in ["phi", "sigma", "tau"]:
        mo, so = ours[p].mean(), ours[p].std()
        mr, sr = ref[p].mean(), ref[p].std()
        pooled = max((so ** 2 + sr ** 2) ** 0.5, 1e-6)
        z = abs(mo - mr) / pooled
        max_z = max(max_z, z)
        lines.append(f"| {p} | {truth[p]:.3f} | {mo:.3f}+-{so:.3f} "
                     f"| {mr:.3f}+-{sr:.3f} | {z:.2f} |")
    lines += ["",
              f"Max |mean difference| / pooled posterior sd = {max_z:.2f} "
              f"(<1 means the two samplers' posteriors overlap within one "
              f"posterior standard deviation)."]
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(os.path.dirname(__file__),
                           "reference_comparison.md"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
