"""Parallel-in-time (associative-scan) Kalman vs the sequential oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import lgssm
from sgmcmc_tpu.ops import kalman, kalman_parallel


def make_params(n, m, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.6 * np.linalg.qr(rng.normal(size=(n, n)))[0]
    C = rng.normal(size=(m, n)) / np.sqrt(n)
    Q = np.eye(n) * 0.5 + 0.1 * np.ones((n, n))
    R = np.eye(m) * 0.8
    return lgssm.from_matrices(A, C, Q, R)


@pytest.mark.parametrize("n,m,T", [(1, 1, 64), (2, 2, 50), (3, 1, 37)])
def test_parallel_filter_matches_sequential(n, m, T):
    params = make_params(n, m, seed=n + m)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(T), params, T)
    fwd = lgssm.default_forward_message(params)

    mean_seq, cov_seq = kalman.filtered_moments(
        ys, params.A, params.C, params.LQinv, params.LRinv, fwd)
    fm = kalman_parallel.parallel_filtered_moments(
        ys, params.A, params.C, params.LQinv, params.LRinv, fwd)
    np.testing.assert_allclose(np.asarray(fm.mean), np.asarray(mean_seq),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fm.cov), np.asarray(cov_seq),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n,m,T", [(1, 1, 64), (2, 2, 50)])
def test_parallel_loglikelihood_matches_sequential(n, m, T):
    params = make_params(n, m, seed=10 + n)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(T + 1), params, T)
    fwd = lgssm.default_forward_message(params)
    ll_seq = kalman.marginal_loglikelihood(
        ys, params.A, params.C, params.LQinv, params.LRinv, fwd,
        kalman.init_backward_message(n, ys.dtype))
    ll_par = kalman_parallel.parallel_marginal_loglikelihood(
        ys, params.A, params.C, params.LQinv, params.LRinv, fwd)
    np.testing.assert_allclose(float(ll_par), float(ll_seq), rtol=1e-9)


@pytest.mark.parametrize("n,m,T", [(1, 1, 48), (2, 2, 40), (3, 2, 33)])
def test_parallel_smoother_matches_sequential(n, m, T):
    params = make_params(n, m, seed=20 + n)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(T + 2), params, T)
    mean_seq, cov_seq = lgssm.latent_var_distr(params, ys)   # smoothed
    mean_par, cov_par = kalman_parallel.parallel_smoothed_moments(
        ys, params.A, params.C, params.LQinv, params.LRinv,
        lgssm.default_forward_message(params))
    np.testing.assert_allclose(np.asarray(mean_par), np.asarray(mean_seq),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov_par), np.asarray(cov_seq),
                               rtol=1e-7, atol=1e-9)


def test_parallel_filter_jits_and_scales():
    params = make_params(2, 1, seed=5)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(9), params, 512)
    f = jax.jit(lambda o: kalman_parallel.parallel_marginal_loglikelihood(
        o, params.A, params.C, params.LQinv, params.LRinv))
    assert np.isfinite(float(f(ys)))


def test_parallel_gradient_matches_analytic():
    """jax.grad through the associative-scan filter equals the analytic
    pairwise-moment gradient (`lgssm/helper.py:312-420`)."""
    params = make_params(2, 2, seed=31)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(77), params, 60)
    g_par = lgssm.parallel_gradient_marginal_loglikelihood(params, ys)
    g_seq = lgssm.gradient_marginal_loglikelihood(params, ys)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(np.asarray(getattr(g_par, name)),
                                   np.asarray(getattr(g_seq, name)),
                                   rtol=1e-6, atol=1e-9, err_msg=name)


def test_parallel_hmm_forward_matches_sequential():
    from sgmcmc_tpu.ops import hmm

    rng = np.random.default_rng(4)
    K, T = 3, 41
    Pi = jnp.asarray(rng.dirichlet(np.ones(K) * 2, size=K))
    logP = jnp.asarray(rng.normal(size=(T, K)) * 2.0)
    init = hmm.default_forward_message(K)
    seq = hmm.forward_messages(logP, Pi, init)
    par = hmm.parallel_forward_messages(logP, Pi, init)
    np.testing.assert_allclose(np.asarray(par.prob), np.asarray(seq.prob),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(par.log_constant),
                               np.asarray(seq.log_constant), rtol=1e-9)
    bwd = hmm.default_backward_message(K)
    np.testing.assert_allclose(
        float(hmm.parallel_marginal_loglikelihood(logP, Pi, init, bwd)),
        float(hmm.marginal_loglikelihood(logP, Pi, init, bwd)), rtol=1e-9)
