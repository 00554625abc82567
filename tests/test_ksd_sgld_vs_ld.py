"""SGLD-vs-LD KSD ordering regression (VERDICT r2 #9).

Locks in the exchange-rate tables' qualitative trade-off (the reference
paper's headline comparison, protocol `demo/exchange_rate/calculate_ksd.py:
43-101`): on a short segment the full-sequence LD sampler's unbiased
gradients give it a large KSD advantage on the slow-mixing phi, while the
subsequence SGLD sampler stays within a small factor on sigma/tau — the
LD advantage *concentrates on phi*.

Fixed seeds make the whole computation deterministic; the asserted margins
(2x on phi dominance, 4x on sigma/tau competitiveness) are loose around
the measured values (phi ratio 0.08, sigma 0.48, tau 0.63 at these
settings).  Gated behind RUN_SLOW=1 (~2 min CPU); run with
`RUN_SLOW=1 python -m pytest tests/test_ksd_sgld_vs_ld.py -q`.
"""
import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="slow KSD regression; set RUN_SLOW=1")


def test_sgld_vs_ld_ksd_ordering():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgmcmc_tpu.experiments.driver import convert_gradient
    from sgmcmc_tpu.inference.samplers import SVMSampler
    from sgmcmc_tpu.metrics.ksd import imq_ksd
    from sgmcmc_tpu.models import svm

    T = 125
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(42), true, T)

    def fit(leg):
        s = SVMSampler(observations=ys, seed=7)
        s.parameters = svm.from_scalars(A=0.3, Q=1.0, R=2.0,
                                        dtype=jnp.float64)
        if leg == "sgld":
            return s.fit_scan("SGLD", num_iters=3000, epsilon=1e-3, N=128,
                              subsequence_length=16, buffer_length=4,
                              pf="poyiadjis_N", resampler="systematic",
                              resample_mode="gather"), 3000
        return s.fit_scan("SGLD", num_iters=600, epsilon=0.1, N=128,
                          subsequence_length=-1, pf="paris",
                          resample_mode="gather"), 600

    def ksd_of(trace, n_iters):
        burn = n_iters // 2
        idx = np.linspace(burn, n_iters - 1, 60).astype(int)
        s = SVMSampler(observations=ys, seed=11)
        vals, grads = [], []
        for i in idx:
            p = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[i], trace)
            s.parameters = p
            g = s.noisy_gradient(N=256, subsequence_length=-1, pf="paris",
                                 resample_mode="gather", is_scaled=False)
            v, gn = convert_gradient("svm", p, g)
            vals.append(v)
            grads.append(gn)
        out = {}
        for var in ["phi", "sigma", "tau"]:
            x = np.stack([getattr(v, var) for v in vals])
            gx = np.stack([getattr(g, var) for g in grads])
            out[var] = float(imq_ksd(jnp.asarray(x), jnp.asarray(gx)))
        return out

    k_sgld = ksd_of(*fit("sgld"))
    k_ld = ksd_of(*fit("ld"))

    # LD clearly better on the slow-mixing phi (measured ratio 0.08)
    assert k_ld["phi"] < 0.5 * k_sgld["phi"], (k_ld, k_sgld)
    # SGLD competitive (within a small factor) on sigma / tau
    assert k_sgld["sigma"] < 4.0 * k_ld["sigma"], (k_ld, k_sgld)
    assert k_sgld["tau"] < 4.0 * k_ld["tau"], (k_ld, k_sgld)
    # the LD advantage concentrates on phi: its phi ratio is the smallest
    ratios = {v: k_ld[v] / k_sgld[v] for v in ["phi", "sigma", "tau"]}
    assert ratios["phi"] < ratios["sigma"], ratios
    assert ratios["phi"] < ratios["tau"], ratios
