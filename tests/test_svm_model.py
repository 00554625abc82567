"""SVM model: additive score vs autodiff, prior score vs autodiff, data gen."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import svm


def complete_data_loglike(params, x_t, x_next, y_next):
    """log Pr(x'|x) + log Pr(y'|x') for a single particle, via model fns."""
    trans = svm._prior_log_density(params, x_t[None, :], x_next[None, :])[0]
    emit = svm._reweight(params, x_t[None, :], x_next[None, :], y_next)[0]
    return trans + emit


def test_grad_statistic_matches_autodiff():
    params = svm.from_scalars(A=0.9, Q=0.5, R=2.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    x_t = jax.random.normal(key, (5, 1), jnp.float64)
    x_next = 0.9 * x_t + 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                                 (5, 1), jnp.float64)
    y = jnp.array([0.7], jnp.float64)

    stats = svm.grad_statistic(params, x_t, x_next, y, 0)  # [5, 3]
    for i in range(5):
        g = jax.grad(complete_data_loglike)(params, x_t[i], x_next[i], y)
        np.testing.assert_allclose(float(stats[i, 0]),
                                   float(g.LRinv_vec[0]), rtol=1e-10)
        np.testing.assert_allclose(float(stats[i, 1]),
                                   float(g.LQinv_vec[0]), rtol=1e-10)
        np.testing.assert_allclose(float(stats[i, 2]),
                                   float(g.A[0, 0]), rtol=1e-10)


def test_grad_logprior_matches_autodiff():
    """The reference's prior gradient treats the matrix-normal row
    covariance (Q) as constant in the A-prior; autodiff the matching
    partial logprior."""
    from sgmcmc_tpu.utils.distributions import (matrix_normal_logpdf,
                                                wishart_logpdf)
    from sgmcmc_tpu.utils.linalg import tril_vector_to_mat

    params = svm.from_scalars(A=0.8, Q=0.4, R=1.5, dtype=jnp.float64)
    prior = svm.default_prior(var=10.0, dtype=jnp.float64)
    analytic = svm.grad_logprior(prior, params)

    def partial_logprior(p):
        LQinv = tril_vector_to_mat(p.LQinv_vec)
        LRinv = tril_vector_to_mat(p.LRinv_vec)
        lp = wishart_logpdf(LQinv @ LQinv.T, prior.df_Qinv, prior.scale_Qinv)
        lp += wishart_logpdf(LRinv @ LRinv.T, prior.df_Rinv, prior.scale_Rinv)
        lp += matrix_normal_logpdf(
            p.A, prior.mean_A, Lrowprec=jax.lax.stop_gradient(LQinv),
            Lcolprec=jnp.diag(prior.var_col_A ** -0.5))
        return lp

    auto = jax.grad(partial_logprior)(params)
    for a, b in zip(jax.tree_util.tree_leaves(analytic),
                    jax.tree_util.tree_leaves(auto)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_unpack_grad_roundtrip():
    stat = jnp.array([1.0, 2.0, 3.0])
    g = svm.unpack_grad(stat)
    assert float(g.LRinv_vec[0]) == 1.0
    assert float(g.LQinv_vec[0]) == 2.0
    assert float(g.A[0, 0]) == 3.0


def test_generate_data_moments():
    """Latent AR(1) variance should match Q/(1-A^2); y scale ~ sqrt(R)."""
    params = svm.from_scalars(A=0.9, Q=0.19, R=1.0, dtype=jnp.float64)
    ys, xs = svm.generate_data(jax.random.PRNGKey(42), params, 20000)
    assert ys.shape == (20000, 1) and xs.shape == (20000, 1)
    var_x = float(jnp.var(xs))
    np.testing.assert_allclose(var_x, 0.19 / (1 - 0.81), rtol=0.1)


def test_project_parameters():
    params = svm.SVMParams(A=jnp.array([[1.5]]),
                           LQinv_vec=jnp.array([-2.0]),
                           LRinv_vec=jnp.array([3.0]))
    p = svm.project_parameters(params)
    assert abs(float(p.A[0, 0])) <= 0.9999
    assert float(p.LQinv_vec[0]) == 2.0
    assert float(p.LRinv_vec[0]) == 3.0


def test_sample_prior_shapes():
    prior = svm.default_prior(var=1.0, dtype=jnp.float64)
    params = svm.sample_prior(prior, jax.random.PRNGKey(0))
    assert params.A.shape == (1, 1)
    assert params.LQinv_vec.shape == (1,)
    assert np.isfinite(float(svm.logprior(prior, params)))


def test_laplace_and_ep_kernels_estimate_same_loglik():
    """Adaptive proposals must estimate the same marginal likelihood as the
    bootstrap kernel, with lower variance."""
    from sgmcmc_tpu.ops import buffered
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), params, 50)

    def loglik(kernel_name, key, N=256):
        return float(buffered.run_buffered_pf(
            svm.get_kernel(kernel_name), svm.suff_statistic, params, ys,
            key=key, n_particles=N, statistic_dim=3, smoother="filter",
            prior_mean=0.0,
            prior_var=float(svm.stationary_variance(params))).loglikelihood)

    keys = jax.random.split(jax.random.PRNGKey(1), 12)
    res = {k: np.array([loglik(k, kk) for kk in keys])
           for k in ["prior", "laplace", "ep"]}
    for name in ["laplace", "ep"]:
        np.testing.assert_allclose(res[name].mean(), res["prior"].mean(),
                                   rtol=0.03, err_msg=name)
        # adaptive proposals should not be (much) noisier than bootstrap
        assert res[name].std() < res["prior"].std() * 1.5, name
