"""KSD comparison of exchange-rate parameter traces (SGLD vs LD).

Reproduction of `/root/reference/demo/exchange_rate/calculate_ksd.py`:
for each saved trace, compute the PF score (PaRIS, large N, unscaled) at
each post-burn-in sample and evaluate the IMQ kernel Stein discrepancy per
variable.

Usage: python calculate_ksd.py [--trace PATH.p ...] [--model svm|garch]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

# Natural KSD coordinates: SVM over (phi, sigma, tau) as in the reference
# demo (`save_svm_params.py` / `calculate_ksd.py`); GARCH over
# ['log_mu','logit_phi','logit_lambduh','LRinv'] (`calculate_ksd.py:59-61`
# — the reference demo evaluates LRinv itself, unlike the experiment
# driver's tau), where scalar LRinv == LRinv_vec.
VARIABLES = {
    "svm": ["phi", "sigma", "tau"],
    "svjm": ["phi", "sigma", "tau", "logit_pJ", "sigmaJ"],
    "garch": ["log_mu", "logit_phi", "logit_lambduh", "LRinv_vec"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", nargs="+", required=True)
    ap.add_argument("--model", default="svm",
                    choices=["svm", "svjm", "garch"])
    ap.add_argument("--data", default=None,
                    help="npz with hourly_log_returns (defaults to demo)")
    ap.add_argument("--segment", type=int, default=1)
    ap.add_argument("--N", type=int, default=10000)
    ap.add_argument("--max_samples", type=int, default=100)
    args = ap.parse_args()

    from exchange_rate_demo import DEFAULT_DATA, load_segments

    from sgmcmc_tpu.inference.samplers import (GARCHSampler, SVJMSampler,
                                               SVMSampler)
    from sgmcmc_tpu.io import checkpoint as ckpt
    from sgmcmc_tpu.metrics.ksd import compute_ksd

    obs = load_segments(args.data or DEFAULT_DATA)[args.segment]
    cls = {"svm": SVMSampler, "svjm": SVJMSampler,
           "garch": GARCHSampler}[args.model]
    sampler = cls(observations=obs, seed=0)

    for trace_path in args.trace:
        trace = ckpt.load_trace(trace_path)
        params_list = trace["parameters_list"]
        burn = len(params_list) // 3
        params_list = params_list[burn:]
        if len(params_list) > args.max_samples:
            idx = np.linspace(0, len(params_list) - 1,
                              args.max_samples).astype(int)
            params_list = [params_list[i] for i in idx]
        grads = []
        for p in params_list:
            sampler.parameters = p
            grads.append(sampler.noisy_gradient(
                pf="paris", N=args.N, subsequence_length=-1,
                is_scaled=False, resample_mode="auto"))
        if args.model in ("svm", "svjm"):
            from sgmcmc_tpu.experiments.driver import convert_gradient
            nat = [convert_gradient(args.model, q, g)
                   for q, g in zip(params_list, grads)]
            ksd = compute_ksd([v for v, _ in nat], [g for _, g in nat],
                              VARIABLES[args.model])
        else:
            ksd = compute_ksd(params_list, grads, VARIABLES[args.model])
        print(trace_path, ksd)


if __name__ == "__main__":
    main()
