"""Distributional anchor: SGMCMC posterior vs conjugate Gibbs posterior.

Reproduces the reference's KS-test evaluation (`do_eval_ks_test`,
`svm/driver.py:1093-1218`; LGSSM Gibbs config `lgssm/demo_setup.py:88-97`):
a long exact-gradient SGRLD chain on a well-identified scalar LGSSM must
match the fixed-C blocked-Gibbs trace in distribution.  Because both
traces are autocorrelated, the assertions are posterior-moment agreement
(shift < 0.25 sd, spread ratio within 25%) plus a loose two-sample KS
bound, rather than a p-value at nominal size.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.inference.samplers import LGSSMSampler
from sgmcmc_tpu.io.checkpoint import unstack_trace
from sgmcmc_tpu.metrics.ks_test import ks_test_traces
from sgmcmc_tpu.models import lgssm


def test_sgrld_matches_gibbs_in_distribution():
    true = lgssm.from_matrices(A=[[0.7]], C=[[1.0]], Q=[[2.0]], R=[[0.1]],
                               dtype=jnp.float64)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), true, 300)

    # fixed-C blocked-Gibbs reference trace
    g = LGSSMSampler(observations=ys, parameters=true, seed=1)
    gibbs_iter = g.get_iter_step("Gibbs")
    gibbs_trace = []
    for i in range(2500):
        gibbs_iter()
        if i >= 500:
            gibbs_trace.append(g.parameters)

    # SGRLD with the exact (Kalman) full-data gradient
    s = LGSSMSampler(observations=ys, parameters=true, seed=2)
    trace = s.fit_scan("SGRLD", num_iters=40000, epsilon=0.01,
                       kind="marginal", subsequence_length=-1)
    sgrld_trace = unstack_trace(jax.device_get(trace))[10000::4]

    for nm in ("A", "LQinv_vec", "LRinv_vec"):
        ga = np.array([np.ravel(np.asarray(getattr(p, nm)))[0]
                       for p in gibbs_trace])
        sa = np.array([np.ravel(np.asarray(getattr(p, nm)))[0]
                       for p in sgrld_trace])
        shift = abs(ga.mean() - sa.mean()) / ga.std()
        ratio = sa.std() / ga.std()
        assert shift < 0.25, (nm, shift, ga.mean(), sa.mean(), ga.std())
        assert 0.75 < ratio < 1.33, (nm, ratio)

    res = ks_test_traces(sgrld_trace, gibbs_trace,
                         variables=["A", "LQinv_vec", "LRinv_vec"])
    for row in res:
        assert row["value"] < 0.2, res
