"""Shared machinery for the head-to-head parity harnesses
(`reference_comparison.py`, `exact_parity.py`).

Each leg produces per-coordinate posterior sample arrays ([N] single
chain or [C, N] stacked chains) for both implementations; the comparison
quotes z = |Δmean| / pooled posterior sd **± se(z)** with ESS-based
Monte-Carlo error bars, and REFUSES to PASS a leg whose split-R-hat
exceeds `RHAT_LIMIT` on either side — the exact failure mode documented
in artifacts/eurus_garch_validation.md (the reference's own single chain
sat mid-transient at z=3.45 until mixing was checked by hand).
"""
import importlib.util
import os
import sys

if importlib.util.find_spec("sgmcmc_tpu") is None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sgmcmc_tpu.metrics.convergence import ess_bulk as _ess_bulk
from sgmcmc_tpu.metrics.convergence import rhat_rank as _rhat_rank

RHAT_LIMIT = 1.1


def summarize(x):
    """array [N] or [C, N] -> dict(mean, sd, ess, rhat, se_mean).

    The gate quantities are the Vehtari et al. 2021 robust estimators:
    `rhat` is the rank-normalized + folded split-R-hat and `ess` the
    rank-normalized bulk ESS — plain split-R-hat proved noisy right at
    the 1.1 threshold on the logit-scale GARCH/HMM coordinates
    (artifacts/exact_parity_sgld_long.md documented the re-rolls)."""
    x = np.asarray(x, np.float64)
    flat = x.ravel()
    e = _ess_bulk(x)
    return dict(mean=float(flat.mean()), sd=float(flat.std(ddof=1)),
                ess=float(e), rhat=float(_rhat_rank(x)),
                se_mean=float(flat.std(ddof=1) / np.sqrt(max(e, 1.0))))


def compare_table(title, names, ours, ref, truth=None):
    """Markdown section + verdict dict for one leg.

    ``ours``/``ref``: dicts with per-coordinate sample arrays plus
    'steps'/'seconds' bookkeeping entries.  Returns (lines, verdict) with
    verdict = dict(max_z, se_of_max_z, max_rhat, mixed, passed).
    """
    def chains_note(d):
        arr = np.asarray(d[names[0]])
        return f"{arr.shape[0]} chains" if arr.ndim == 2 else "1 chain"

    lines = [f"## {title}", "",
             f"- ours: {ours['steps']} steps in {ours['seconds']:.1f}s"
             f" ({ours['steps'] / max(ours['seconds'], 1e-9):.0f} steps/s,"
             f" {chains_note(ours)})",
             f"- reference: {ref['steps']} steps in {ref['seconds']:.1f}s"
             f" ({ref['steps'] / max(ref['seconds'], 1e-9):.1f} steps/s,"
             f" {chains_note(ref)})",
             ""]
    head = ("| param |" + (" truth |" if truth else "")
            + " ours mean+-sd | reference mean+-sd | |diff|/sd +- se "
            "| rhat ours/ref |")
    lines += [head,
              "|---|" + ("---|" if truth else "") + "---|---|---|---|"]
    max_z, se_at_max, max_rhat = 0.0, 0.0, 1.0
    for p in names:
        so_, sr_ = summarize(ours[p]), summarize(ref[p])
        pooled = max((so_["sd"] ** 2 + sr_["sd"] ** 2) ** 0.5, 1e-6)
        z = abs(so_["mean"] - sr_["mean"]) / pooled
        se_z = ((so_["se_mean"] ** 2 + sr_["se_mean"] ** 2) ** 0.5) / pooled
        if z > max_z:
            max_z, se_at_max = z, se_z
        max_rhat = max(max_rhat, so_["rhat"], sr_["rhat"])
        t = f" {truth[p]:.3f} |" if truth else ""
        lines.append(
            f"| {p} |{t} {so_['mean']:.3f}+-{so_['sd']:.3f} "
            f"| {sr_['mean']:.3f}+-{sr_['sd']:.3f} "
            f"| {z:.2f} +- {se_z:.2f} "
            f"| {so_['rhat']:.2f} / {sr_['rhat']:.2f} |")
    mixed = max_rhat <= RHAT_LIMIT
    passed = (max_z < 1.0) and mixed
    status = ("PASS" if passed else
              f"NOT ASSESSABLE (max split-R-hat {max_rhat:.2f} > "
              f"{RHAT_LIMIT} — unmixed chains compare transients, not "
              f"posteriors)" if not mixed else "FAIL")
    lines += ["", f"Max |mean difference| / pooled posterior sd = "
              f"{max_z:.2f} +- {se_at_max:.2f}; max split-R-hat = "
              f"{max_rhat:.2f}.  **{status}**", ""]
    return lines, dict(max_z=max_z, se=se_at_max, max_rhat=max_rhat,
                       mixed=mixed, passed=passed)
