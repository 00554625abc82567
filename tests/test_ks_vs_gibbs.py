"""Distributional anchor: SGMCMC posterior vs conjugate Gibbs posterior.

Reproduces the reference's KS-test evaluation (`do_eval_ks_test`,
`svm/driver.py:1093-1218`) at the LGSSM Gibbs config of
`lgssm/demo_setup.py:76-134`: long SG-MCMC chains on a well-identified
scalar LGSSM must match the fixed-C blocked-Gibbs trace in distribution.
Variants covered (the reference grid's KS rows): full-data SGRLD ('KF'),
buffered-subsequence SGRLD (S=40), ADAGRAD-initialized SGLD, and the
complete-data ('MC') kind.  Because both traces are autocorrelated, the
assertions are posterior-moment agreement plus a loose two-sample KS
bound, rather than a p-value at nominal size.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.inference.samplers import LGSSMSampler
from sgmcmc_tpu.io.checkpoint import unstack_trace
from sgmcmc_tpu.metrics.ks_test import ks_test_traces
from sgmcmc_tpu.models import lgssm

VARIABLES = ["A", "LQinv_vec", "LRinv_vec"]


@pytest.fixture(scope="module")
def problem():
    true = lgssm.from_matrices(A=[[0.7]], C=[[1.0]], Q=[[2.0]], R=[[0.1]],
                               dtype=jnp.float64)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), true, 300)
    return true, ys


@pytest.fixture(scope="module")
def gibbs_trace(problem):
    true, ys = problem
    g = LGSSMSampler(observations=ys, parameters=true, seed=1)
    gibbs_iter = g.get_iter_step("Gibbs")
    trace = []
    for i in range(2500):
        gibbs_iter()
        if i >= 500:
            trace.append(g.parameters)
    return trace


def _assert_matches(sg_trace, gibbs_trace, shift_tol=0.25,
                    ratio_lo=0.75, ratio_hi=1.33, ks_tol=0.2):
    for nm in VARIABLES:
        ga = np.array([np.ravel(np.asarray(getattr(p, nm)))[0]
                       for p in gibbs_trace])
        sa = np.array([np.ravel(np.asarray(getattr(p, nm)))[0]
                       for p in sg_trace])
        shift = abs(ga.mean() - sa.mean()) / ga.std()
        ratio = sa.std() / ga.std()
        assert shift < shift_tol, (nm, shift, ga.mean(), sa.mean(), ga.std())
        assert ratio_lo < ratio < ratio_hi, (nm, ratio)
    res = ks_test_traces(sg_trace, gibbs_trace, variables=VARIABLES)
    for row in res:
        assert row["value"] < ks_tol, res


def test_sgrld_matches_gibbs_in_distribution(problem, gibbs_trace):
    """Full-data exact-gradient SGRLD (the reference grid's 'KF' row)."""
    true, ys = problem
    s = LGSSMSampler(observations=ys, parameters=true, seed=2)
    trace = s.fit_scan("SGRLD", num_iters=40000, epsilon=0.01,
                       kind="marginal", subsequence_length=-1)
    _assert_matches(unstack_trace(jax.device_get(trace))[10000::4],
                    gibbs_trace)


def test_buffered_sgrld_matches_gibbs(problem, gibbs_trace):
    """Buffered-subsequence SGRLD at the reference grid's S=40.

    B=24 makes the boundary-message bias negligible (measured: the
    posterior shift is bit-identical between B=24 and buffer_length=-1 =
    exact boundaries).  The burn-in is matched to the measured relaxation
    of the stiff R coordinate: the chain starts at the TRUE parameters,
    but this data realization's posterior sits at R ~= 0.38 (LRinv 3.16
    -> 1.62, ~5.7 posterior sds from the init), and at eps=0.004 the
    preconditioned chain needs ~60k iterations to traverse that —
    measured trace-fifth means 1.37 -> 1.64 over a 100k chain, i.e. a
    30k burn-in leaves a drifting trace (shift 0.55 sd), while a 60k
    burn-in equilibrates (shift 0.13 sd, KS 0.10)."""
    true, ys = problem
    s = LGSSMSampler(observations=ys, parameters=true, seed=3)
    trace = s.fit_scan("SGRLD", num_iters=120000, epsilon=0.004,
                       kind="marginal", subsequence_length=40,
                       buffer_length=24)
    _assert_matches(unstack_trace(jax.device_get(trace))[60000::5],
                    gibbs_trace, shift_tol=0.3, ratio_lo=0.7, ks_tol=0.2)


def test_adagrad_init_sgld_matches_gibbs(problem, gibbs_trace):
    """ADAGRAD mode-finding init + unpreconditioned full-data SGLD
    (VERDICT r1 #10: the SGLD leg of the KS protocol).  Unpreconditioned
    Langevin on (A, LQinv, LRinv) needs a small step for the stiff
    R-coordinate; tolerances match the discretization bias at eps=2e-3."""
    true, ys = problem
    s = LGSSMSampler(observations=ys, parameters=true, seed=4)
    s.fit_scan("ADAGRAD", num_iters=200, epsilon=0.01, kind="marginal",
               subsequence_length=-1)
    trace = s.fit_scan("SGLD", num_iters=60000, epsilon=2e-3,
                       kind="marginal", subsequence_length=-1)
    _assert_matches(unstack_trace(jax.device_get(trace))[20000::4],
                    gibbs_trace, shift_tol=0.45, ratio_lo=0.6,
                    ratio_hi=1.5, ks_tol=0.35)


def test_complete_kind_sgrld_matches_gibbs(problem, gibbs_trace):
    """Complete-data ('MC') kind: FFBS-draw gradients inside SGRLD (the
    reference grid's MC_100 row, with fewer draws per step)."""
    true, ys = problem
    s = LGSSMSampler(observations=ys, parameters=true, seed=5)
    trace = s.fit_scan("SGRLD", num_iters=40000, epsilon=0.01,
                       kind="complete", subsequence_length=-1,
                       num_samples=4)
    _assert_matches(unstack_trace(jax.device_get(trace))[10000::4],
                    gibbs_trace, shift_tol=0.35, ks_tol=0.25)


def test_full_buffer_flag_is_unbiased():
    """buffer_length=-1 buffers to the whole sequence: the subsequence
    score with exact boundary messages is an unbiased estimator of the
    full-data gradient (`sgmcmc_sampler.py:263-266` semantics)."""
    from jax.flatten_util import ravel_pytree

    from sgmcmc_tpu.inference import sgmcmc

    true = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]],
                               dtype=jnp.float64)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(9), true, 24)
    exact, _ = ravel_pytree(lgssm.gradient_marginal_loglikelihood(true, ys))
    cfg = sgmcmc.PFScoreConfig(subsequence_length=6, buffer_length=-1,
                               minibatch_size=8)
    score = jax.jit(sgmcmc.make_marginal_score_fn(
        lambda p, w, v, wt: lgssm.windowed_marginal_gradient(
            p, w, v, wt, 24, 6), cfg, 24))
    draws = []
    for i in range(60):
        g, ll = score(jax.random.PRNGKey(100 + i), true, ys)
        draws.append(np.asarray(ravel_pytree(g)[0]))
        assert np.isfinite(float(ll))
    mean = np.mean(draws, axis=0)
    se = np.std(draws, axis=0) / np.sqrt(len(draws))
    assert np.all(np.abs(mean - np.asarray(exact)) < 4 * se + 1e-8), (
        mean, np.asarray(exact), se)
