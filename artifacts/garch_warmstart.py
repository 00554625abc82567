"""Synthetic-GARCH warm-start stationarity protocol (VERDICT r5 item 2).

The synthetic-GARCH parity cell was NOT ASSESSABLE by brute force: the
reference side needs ~10 CPU-h to transit the persistence ridge (R-hat
trajectory 4.31@20k -> 1.68@10x, reference_comparison_synth_garch_long.md).
This closes the cell without the transit:

1. ``--part ours``: pool ours' posterior from C overdispersed SGLD chains
   at the reference demo config (eps=0.1 S=40 B=10 Poyiadjis-O(N) N=1000,
   `garch/demo_setup.py:76-141` + `garch/driver.py:52-63`); save pooled
   coordinate samples.
2. ``--part ref``: draw K inits FROM ours' pooled posterior, stratified on
   the logit_lambduh quantiles (the ridge coordinate), start K reference
   chains there, run each a modest budget in parallel processes.
3. ``--part report``: under H0 (the reference kernel shares ours'
   stationary distribution), chains initialized at posterior draws REMAIN
   marginally posterior-distributed at every step — no mixing required.
   Decision statistics:
     * ensemble z: |pooled-ref mean - ours mean| / pooled posterior sd
       (the matrix's <1 criterion), with se from the K independent chain
       means (chain means are iid under H0 — an honest se that does not
       lean on within-chain ESS);
     * coherent drift: per-chain (last-quarter mean - first-quarter mean)
       / posterior sd, averaged across chains.  Under H0 tail-started
       chains drift inward symmetrically (mean ~ 0); a shared-sign drift
       of the ensemble toward somewhere outside ours' posterior is the
       H1 signature.
   Either outcome is decisive: stay -> PASS, coherent walk-away -> FAIL.

Writes artifacts/garch_warmstart.md + intermediate .npz files.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HERE = os.path.dirname(__file__)
OURS_NPZ = os.path.join(HERE, "garch_warmstart_ours.npz")
REF_NPZ = os.path.join(HERE, "garch_warmstart_ref.npz")
OUT = os.path.join(HERE, "garch_warmstart.md")

# the synthetic-GARCH leg's data config (reference_comparison.py main)
TRUE = dict(alpha=0.1, beta=0.4, gamma=0.3, R=0.5)
T = 1000
NAMES = ["log_mu", "logit_phi", "logit_lambduh", "tau"]


def make_observations():
    import jax
    from sgmcmc_tpu.models import garch
    true_g = garch.from_alpha_beta_gamma(
        alpha=TRUE["alpha"], beta=TRUE["beta"], gamma=TRUE["gamma"],
        R=TRUE["R"])
    ys, _ = garch.generate_data(jax.random.PRNGKey(1), true_g, T)
    return np.asarray(ys)


def part_ours(args):
    from reference_comparison import run_ours_garch
    ys = make_observations()
    t0 = time.time()
    ours = run_ours_garch(ys, args.ours_steps, n_chains=args.ours_chains)
    np.savez(OURS_NPZ, **{k: ours[k] for k in NAMES})
    print(f"ours pooled posterior: {args.ours_chains} chains x "
          f"{args.ours_steps} steps in {time.time() - t0:.0f}s; "
          f"post-burn shape {ours['log_mu'].shape}", flush=True)


def _select_inits(ours, K):
    """K stratified posterior draws: pooled post-burn samples at the
    logit_lambduh quantile grid (the ridge coordinate), full coordinate
    vectors kept aligned."""
    flat = {k: np.ravel(ours[k]) for k in NAMES}
    qs = np.linspace(0.1, 0.9, K)
    order = np.argsort(flat["logit_lambduh"])
    idx = order[(qs * (len(order) - 1)).astype(int)]
    return [{k: float(flat[k][i]) for k in NAMES} for i in idx]


def _run_ref_chain(task):
    """Worker: one warm-started reference chain (top-level, spawn-safe)."""
    seed, seconds, ys, init = task
    sys.path.insert(0, "/root/reference")
    import numpy as np  # noqa: F811
    np.random.seed(seed)
    from sgmcmc_ssm.models.garch import (GARCHParameters, GARCHPrior,
                                         GARCHSampler)
    sampler = GARCHSampler(n=1, m=1, observations=np.asarray(ys))
    sampler.prior = GARCHPrior.generate_default_prior(n=1, m=1)
    sampler.parameters = GARCHParameters(
        log_mu=np.atleast_1d(init["log_mu"]),
        logit_phi=np.atleast_1d(init["logit_phi"]),
        logit_lambduh=np.atleast_1d(init["logit_lambduh"]),
        LRinv=np.array([[1.0 / init["tau"]]]))
    kw = dict(kind="pf", pf="poyiadjis_N", N=1000, subsequence_length=40,
              buffer_length=10, epsilon=0.1)
    rows = {k: [] for k in NAMES}
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        sampler.sample_sgld(**kw)
        sampler.project_parameters()
        q = sampler.parameters
        rows["log_mu"].append(float(np.ravel(q.log_mu)[0]))
        rows["logit_phi"].append(float(np.ravel(q.logit_phi)[0]))
        rows["logit_lambduh"].append(float(np.ravel(q.logit_lambduh)[0]))
        rows["tau"].append(float(abs(np.ravel(q.tau)[0])))
        n += 1
    out = {k: np.array(v) for k, v in rows.items()}
    out["steps"] = n
    return out


def part_ref(args):
    from concurrent.futures import ProcessPoolExecutor
    import multiprocessing as mp

    ours = dict(np.load(OURS_NPZ))
    inits = _select_inits(ours, args.ref_chains)
    print("warm-start inits (logit_lambduh-stratified posterior draws):")
    for i, init in enumerate(inits):
        print(f"  chain {i}: " + " ".join(f"{k}={v:.3f}"
                                          for k, v in init.items()))
    ys = make_observations()
    tasks = [(100 + 7 * c, args.ref_seconds, ys, init)
             for c, init in enumerate(inits)]
    t0 = time.time()
    with ProcessPoolExecutor(
            max_workers=args.procs,
            mp_context=mp.get_context("spawn")) as ex:
        chains = list(ex.map(_run_ref_chain, tasks))
    n = min(c["steps"] for c in chains)
    np.savez(REF_NPZ,
             **{k: np.stack([c[k][:n] for c in chains]) for k in NAMES},
             inits=np.array([[init[k] for k in NAMES] for init in inits]),
             seconds=time.time() - t0)
    print(f"{len(chains)} reference chains x {n} steps "
          f"in {time.time() - t0:.0f}s", flush=True)


def part_report(args):
    ours = dict(np.load(OURS_NPZ))
    ref = dict(np.load(REF_NPZ))
    K, n = ref["log_mu"].shape

    lines = [
        "# Synthetic-GARCH warm-start stationarity verdict", "",
        f"Ours: pooled posterior, post-burn samples "
        f"{np.ravel(ours['log_mu']).size} "
        f"(config eps=0.1 S=40 B=10 Poyiadjis-O(N) N=1000, T={T}, "
        f"alpha={TRUE['alpha']} beta={TRUE['beta']} gamma={TRUE['gamma']} "
        f"R={TRUE['R']}).",
        f"Reference: {K} chains x {n} SGLD steps "
        f"({ref['seconds'] / 60:.0f} min wall), warm-started at "
        f"logit_lambduh-stratified draws FROM ours' pooled posterior.", "",
        "Under H0 (shared stationary distribution) warm-started chains "
        "remain marginally posterior-distributed at every step — no "
        "mixing transit required.  `z` uses the pooled posterior sd (the "
        "parity matrix's <1 criterion); `se` is from the K independent "
        "chain means (iid under H0).  `drift` is the across-chain mean "
        "of (last-quarter - first-quarter) / posterior sd — a coherent "
        "walk-away from ours' posterior is the H1 signature; "
        "tail-started chains relaxing inward under H0 show spread-sign, "
        "small drift.", "",
        "| param | ours mean+-sd | ref ensemble mean | z +- se | drift "
        "+- se | per-chain drift |", "|---|---|---|---|---|---|"]
    max_z, z_se_at_max, max_drift, drift_se_at_max = 0.0, 0.0, 0.0, 0.0
    for kname in NAMES:
        o = np.ravel(ours[kname])
        om, osd = o.mean(), o.std(ddof=1)
        chain_means = ref[kname].mean(axis=1)          # [K]
        rm = chain_means.mean()
        se = chain_means.std(ddof=1) / np.sqrt(K) / osd
        z = abs(rm - om) / osd
        q = n // 4
        drifts = (ref[kname][:, -q:].mean(axis=1)
                  - ref[kname][:, :q].mean(axis=1)) / osd
        dm = drifts.mean()
        dse = drifts.std(ddof=1) / np.sqrt(K)
        if z > max_z:
            max_z, z_se_at_max = z, se
        if abs(dm) > abs(max_drift):
            max_drift, drift_se_at_max = dm, dse
        lines.append(
            f"| {kname} | {om:.3f}+-{osd:.3f} | {rm:.3f} "
            f"| {z:.2f} +- {se:.2f} | {dm:+.2f} +- {dse:.2f} "
            f"| {' '.join(f'{d:+.2f}' for d in drifts)} |")

    # decision: stay (PASS) vs coherent walk-away (FAIL).  3.18 = t(3)
    # 95% critical value at K=4 — the chain-mean se has only K-1 df.
    tcrit = 3.18 if K == 4 else 2.0
    stay = max_z < 1.0
    no_walk = abs(max_drift) < max(tcrit * drift_se_at_max, 0.5)
    verdict = "PASS" if (stay and no_walk) else "FAIL"
    lines += ["",
              f"Max ensemble z = {max_z:.2f} +- {z_se_at_max:.2f} "
              f"(criterion < 1); max coherent drift = {max_drift:+.2f} "
              f"+- {drift_se_at_max:.2f} posterior sds (criterion: "
              f"|drift| < max({tcrit} se, 0.5)).  **{verdict}** — "
              + ("the reference kernel holds ours' posterior stationary; "
                 "the synthetic-GARCH parity cell closes as PASS without "
                 "the ~10 CPU-h ridge transit."
                 if verdict == "PASS" else
                 "the reference chains walk coherently away from ours' "
                 "posterior — the two samplers disagree; bisect."), ""]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["ours", "ref", "report", "all"],
                    default="all")
    ap.add_argument("--ours_steps", type=int, default=200000)
    ap.add_argument("--ours_chains", type=int, default=8)
    ap.add_argument("--ref_chains", type=int, default=4)
    ap.add_argument("--ref_seconds", type=float, default=2700.0)
    ap.add_argument("--procs", type=int, default=4)
    args = ap.parse_args()
    if args.part in ("ours", "all"):
        part_ours(args)
    if args.part in ("ref", "all"):
        part_ref(args)
    if args.part in ("report", "all"):
        part_report(args)


if __name__ == "__main__":
    main()
