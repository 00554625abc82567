"""Kalman oracle: brute-force Gaussian checks and autodiff cross-checks.

The marginal likelihood is validated against an *independent* construction:
the joint covariance of y_{1:T} assembled in NumPy and evaluated with a
dense multivariate-normal logpdf.  The Fisher-identity gradient is validated
against jax.grad of the marginal log-likelihood (they must agree exactly for
unweighted full-data likelihoods).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import lgssm
from sgmcmc_tpu.ops import kalman


def make_params(n=2, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.5 * rng.normal(size=(n, n)) / np.sqrt(n)
    C = np.eye(m, n) + 0.1 * rng.normal(size=(m, n))
    Q = np.eye(n) * 0.7 + 0.2 * np.ones((n, n))
    R = np.eye(m) * 0.5
    return lgssm.from_matrices(A, C, Q, R)


def brute_force_loglik(params, ys, prior_mean, prior_cov):
    """Dense-joint-Gaussian log p(y_{1:T}): independent oracle."""
    A = np.asarray(params.A)
    C = np.asarray(params.C)
    Q = np.asarray(params.Q)
    R = np.asarray(params.R)
    T, m = ys.shape
    n = A.shape[0]
    # x_t for t=0..T-1 with x_0 = A x_{-1} + w, x_{-1} ~ N(mean, cov)
    mean_x = np.zeros((T, n))
    mean_x[0] = A @ prior_mean
    cov_x = np.zeros((T, n, T, n))
    # propagate means and covariances
    covs = [A @ prior_cov @ A.T + Q]
    for t in range(1, T):
        mean_x[t] = A @ mean_x[t - 1]
        covs.append(A @ covs[-1] @ A.T + Q)
    for t in range(T):
        cov_x[t, :, t, :] = covs[t]
        acc = covs[t]
        for s in range(t + 1, T):
            acc = A @ acc
            cov_x[s, :, t, :] = acc
            cov_x[t, :, s, :] = acc.T
    # y covariance
    Cbig = np.kron(np.eye(T), C)
    cov_flat = cov_x.reshape(T * n, T * n)
    mean_y = (C @ mean_x.T).T.reshape(-1)
    cov_y = Cbig @ cov_flat @ Cbig.T + np.kron(np.eye(T), R)
    diff = ys.reshape(-1) - mean_y
    sign, logdet = np.linalg.slogdet(cov_y)
    return float(-0.5 * diff @ np.linalg.solve(cov_y, diff)
                 - 0.5 * logdet - 0.5 * T * m * np.log(2 * np.pi))


@pytest.mark.parametrize("n,m", [(1, 1), (2, 2)])
def test_marginal_loglikelihood_vs_bruteforce(n, m):
    params = make_params(n, m)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), params, 6)
    ll = float(lgssm.marginal_loglikelihood(params, ys))
    # default forward message: x_{-1} ~ N(0, 10 I)
    expected = brute_force_loglik(params, np.asarray(ys),
                                  np.zeros(n), np.eye(n) * 10.0)
    np.testing.assert_allclose(ll, expected, rtol=1e-8)


def test_split_point_invariance():
    """forward(0..t) fused with backward(t..T) must give the same loglik
    for every split t — validates both passes against each other."""
    params = make_params(2, 2, seed=1)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(1), params, 10)
    fmsg = lgssm.default_forward_message(params)
    bmsg = lgssm.default_backward_message(params)
    full = float(lgssm.marginal_loglikelihood(params, ys))
    bmsgs = kalman.backward_messages(ys, params.A, params.C, params.LQinv,
                                     params.LRinv, bmsg)
    for t in [0, 3, 7, 10]:
        b_t = kalman.GaussianMessage(bmsgs.log_constant[t],
                                     bmsgs.mean_precision[t],
                                     bmsgs.precision[t])
        ll = float(lgssm.marginal_loglikelihood(params, ys[:t],
                                                forward_msg=fmsg,
                                                backward_msg=b_t))
        np.testing.assert_allclose(ll, full, rtol=1e-9)


def test_gradient_matches_autodiff():
    """Fisher-identity gradient == jax.grad of the marginal loglik."""
    params = make_params(2, 2, seed=2)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(2), params, 8)

    analytic = lgssm.gradient_marginal_loglikelihood(params, ys)
    auto = jax.grad(lambda p: lgssm.marginal_loglikelihood(p, ys))(params)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, atol=1e-8,
            err_msg=name)


def test_gradient_matches_autodiff_scalar():
    params = make_params(1, 1, seed=3)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(3), params, 12)
    analytic = lgssm.gradient_marginal_loglikelihood(params, ys)
    auto = jax.grad(lambda p: lgssm.marginal_loglikelihood(p, ys))(params)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, err_msg=name)


def test_buffered_weighted_gradient_unbiased_over_subsequences():
    """Averaging the weighted buffered exact gradient over all subsequence
    positions with full-T buffers must equal the full gradient — the
    reference's unbiasedness construction (`sgmcmc_sampler.py:290-329`)."""
    params = make_params(1, 1, seed=4)
    T, S = 12, 4
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(4), params, T)
    full = lgssm.gradient_marginal_loglikelihood(params, ys)
    fmsg0 = lgssm.default_forward_message(params)
    bmsg0 = lgssm.default_backward_message(params)

    from sgmcmc_tpu.ops.subsequence import subsequence_weights
    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    n_starts = T - S + 1
    for start in range(n_starts):
        w = subsequence_weights(start, S, T, "uniform", ys.dtype)
        fmsg = kalman.forward_message(ys[:start], params.A, params.C,
                                      params.LQinv, params.LRinv, fmsg0)
        bmsg = kalman.backward_message(ys[start + S:], params.A, params.C,
                                       params.LQinv, params.LRinv, bmsg0)
        g = lgssm.gradient_marginal_loglikelihood(
            params, ys[start:start + S], forward_msg=fmsg,
            backward_msg=bmsg, weights=w)
        acc = jax.tree_util.tree_map(lambda a, b: a + b / n_starts, acc, g)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(acc, name)),
            np.asarray(getattr(full, name)), rtol=1e-5, atol=1e-7,
            err_msg=name)


def test_ffbs_mean_matches_smoothed_mean():
    params = make_params(1, 1, seed=5)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(5), params, 20)
    mean, cov = kalman.pairwise_smoothed_moments(
        ys, params.A, params.C, params.LQinv, params.LRinv,
        lgssm.default_forward_message(params),
        lgssm.default_backward_message(params))
    samples = lgssm.latent_var_sample(params, jax.random.PRNGKey(6), ys,
                                      num_samples=4000)
    emp_mean = np.asarray(samples.mean(axis=0))
    sd = np.sqrt(np.asarray(cov)[:, 0, 0])
    np.testing.assert_allclose(emp_mean[:, 0], np.asarray(mean)[:, 0],
                               atol=4 * sd.max() / np.sqrt(4000) * 4)


def test_grad_logprior_matches_autodiff():
    """Reference semantics: the matrix-normal priors on A/C contribute no
    gradient to their row precisions (LQinv/LRinv treated constant)."""
    from sgmcmc_tpu.utils.distributions import (matrix_normal_logpdf,
                                                wishart_logpdf)
    from sgmcmc_tpu.utils.linalg import tril_vector_to_mat

    params = make_params(2, 2, seed=6)
    prior = lgssm.default_prior(2, 2, var=5.0)
    analytic = lgssm.grad_logprior(prior, params)

    def partial_logprior(p):
        LQinv = tril_vector_to_mat(p.LQinv_vec)
        LRinv = tril_vector_to_mat(p.LRinv_vec)
        lp = wishart_logpdf(LQinv @ LQinv.T, prior.df_Qinv, prior.scale_Qinv)
        lp += wishart_logpdf(LRinv @ LRinv.T, prior.df_Rinv, prior.scale_Rinv)
        lp += matrix_normal_logpdf(
            p.A, prior.mean_A, Lrowprec=jax.lax.stop_gradient(LQinv),
            Lcolprec=jnp.diag(prior.var_col_A ** -0.5))
        lp += matrix_normal_logpdf(
            p.C, prior.mean_C, Lrowprec=jax.lax.stop_gradient(LRinv),
            Lcolprec=jnp.diag(prior.var_col_C ** -0.5))
        return lp

    auto = jax.grad(partial_logprior)(params)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, atol=1e-8,
            err_msg=name)


def test_grad_statistic_matches_autodiff():
    """Per-particle complete-data score vs autodiff (vector case)."""
    params = make_params(2, 2, seed=7)
    key = jax.random.PRNGKey(8)
    x_t = jax.random.normal(key, (4, 2), jnp.float64)
    x_next = jax.random.normal(jax.random.fold_in(key, 1), (4, 2),
                               jnp.float64)
    y = jax.random.normal(jax.random.fold_in(key, 2), (2,), jnp.float64)

    def cdl(p, xt, xn, yy):
        trans = lgssm._prior_log_density(p, xt[None], xn[None])[0]
        emit = lgssm._reweight_prior(p, xt[None], xn[None], yy)[0]
        return trans + emit

    stats = lgssm.grad_statistic(params, x_t, x_next, y, 0)
    for i in range(4):
        g = jax.grad(cdl)(params, x_t[i], x_next[i], y)
        expected = np.concatenate([
            np.asarray(g.LRinv_vec), np.asarray(g.LQinv_vec),
            np.asarray(g.C).ravel(), np.asarray(g.A).ravel()])
        np.testing.assert_allclose(np.asarray(stats[i]), expected,
                                   rtol=1e-8, atol=1e-10)
