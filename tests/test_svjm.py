"""SVJM (jump-diffusion SVM): the working model family implied by the
reference's unimportable `SVJMEPKernel`/`SVJMEPAvgKernel`
(`particle_filters/custom_kernels.py:150-381`).

Anchors: additive score vs autodiff; pJ -> 0 degenerates to the SVM;
EP / EP-avg proposal kernels estimate the same marginal likelihood as the
bootstrap kernel; fused kernel matches the gather path statistically;
end-to-end SGLD smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import svjm, svm
from sgmcmc_tpu.ops import buffered


def complete_data_loglike(params, x_t, x_next, y_next):
    trans = svjm._prior_log_density(params, x_t[None, :], x_next[None, :])[0]
    emit = svjm._reweight(params, x_t[None, :], x_next[None, :], y_next)[0]
    return trans + emit


def test_grad_statistic_matches_autodiff():
    params = svjm.from_scalars(A=0.9, Q=0.5, R=2.0, pJ=0.15, QJ=3.0,
                               dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    x_t = jax.random.normal(key, (6, 1), jnp.float64)
    x_next = 0.9 * x_t + 1.2 * jax.random.normal(jax.random.fold_in(key, 1),
                                                 (6, 1), jnp.float64)
    y = jnp.array([0.7], jnp.float64)

    stats = svjm.grad_statistic(params, x_t, x_next, y, 0)  # [6, 5]
    for i in range(6):
        g = jax.grad(complete_data_loglike)(params, x_t[i], x_next[i], y)
        np.testing.assert_allclose(float(stats[i, 0]),
                                   float(g.LRinv_vec[0]), rtol=1e-10)
        np.testing.assert_allclose(float(stats[i, 1]),
                                   float(g.LQinv_vec[0]), rtol=1e-9)
        np.testing.assert_allclose(float(stats[i, 2]),
                                   float(g.A[0, 0]), rtol=1e-10)
        np.testing.assert_allclose(float(stats[i, 3]),
                                   float(g.logit_pJ[0]), rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(float(stats[i, 4]),
                                   float(g.LQJinv_vec[0]), rtol=1e-9,
                                   atol=1e-12)


def test_grad_logprior_matches_autodiff_partials():
    """A / logit_pJ / LQJinv prior-score terms vs autodiff of the matching
    (partial, reference-convention) logprior."""
    from sgmcmc_tpu.utils.distributions import (beta_logpdf,
                                                matrix_normal_logpdf,
                                                wishart_logpdf)
    from sgmcmc_tpu.utils.linalg import tril_vector_to_mat

    params = svjm.from_scalars(A=0.8, Q=0.4, R=1.5, pJ=0.1, QJ=2.0,
                               dtype=jnp.float64)
    prior = svjm.default_prior(var=10.0, dtype=jnp.float64)
    analytic = svjm.grad_logprior(prior, params)

    def partial_logprior(p):
        LQinv = tril_vector_to_mat(p.LQinv_vec)
        LRinv = tril_vector_to_mat(p.LRinv_vec)
        LQJinv = tril_vector_to_mat(p.LQJinv_vec)
        lp = wishart_logpdf(LQinv @ LQinv.T, prior.df_Qinv, prior.scale_Qinv)
        lp += wishart_logpdf(LRinv @ LRinv.T, prior.df_Rinv,
                             prior.scale_Rinv)
        lp += wishart_logpdf(LQJinv @ LQJinv.T, prior.df_QJinv,
                             prior.scale_QJinv)
        lp += matrix_normal_logpdf(
            p.A, prior.mean_A, Lrowprec=jax.lax.stop_gradient(LQinv),
            Lcolprec=jnp.diag(prior.var_col_A ** -0.5))
        lp += beta_logpdf(p.pJ, prior.alpha_pJ, prior.beta_pJ)
        return lp

    auto = jax.grad(partial_logprior)(params)
    for a, b in zip(jax.tree_util.tree_leaves(analytic),
                    jax.tree_util.tree_leaves(auto)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_pj_zero_degenerates_to_svm():
    """With logit_pJ pinned at the projection floor, the transition density
    and the shared score components coincide with the plain SVM."""
    p_svjm = svjm.from_scalars(A=0.9, Q=0.5, R=2.0, pJ=1e-6, QJ=3.0,
                               dtype=jnp.float64)
    p_svm = svm.from_scalars(A=0.9, Q=0.5, R=2.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(3)
    x_t = jax.random.normal(key, (8, 1), jnp.float64)
    x_next = 0.9 * x_t + 0.5 * jax.random.normal(jax.random.fold_in(key, 1),
                                                 (8, 1), jnp.float64)
    y = jnp.array([0.4], jnp.float64)

    np.testing.assert_allclose(
        np.asarray(svjm._prior_log_density(p_svjm, x_t, x_next)),
        np.asarray(svm._prior_log_density(p_svm, x_t, x_next)),
        rtol=1e-5)
    s_j = np.asarray(svjm.grad_statistic(p_svjm, x_t, x_next, y, 0))
    s_s = np.asarray(svm.grad_statistic(p_svm, x_t, x_next, y, 0))
    np.testing.assert_allclose(s_j[:, :3], s_s, rtol=1e-4, atol=1e-6)


def _pf_loglik(kernel_name, params, ys, key, N):
    out = buffered.run_buffered_pf(
        svjm.get_kernel(kernel_name), svjm.grad_statistic, params, ys,
        key=key, n_particles=N, statistic_dim=svjm.STATISTIC_DIM,
        smoother="poyiadjis_N", resampler="systematic",
        resample_mode="gather", prior_mean=0.0,
        prior_var=float(svjm.stationary_variance(params)))
    return float(out.loglikelihood)


@pytest.mark.parametrize("kernel_name", ["ep", "ep_avg"])
def test_adaptive_kernels_agree_with_bootstrap(kernel_name):
    params = svjm.from_scalars(A=0.9, Q=0.3, R=1.0, pJ=0.1, QJ=2.0,
                               dtype=jnp.float64)
    T, N, R = 20, 512, 12
    ys, _ = svjm.generate_data(jax.random.PRNGKey(0), params, T)
    boot = np.array([_pf_loglik("prior", params, ys,
                                jax.random.fold_in(jax.random.PRNGKey(1), i),
                                N) for i in range(R)])
    adap = np.array([_pf_loglik(kernel_name, params, ys,
                                jax.random.fold_in(jax.random.PRNGKey(2), i),
                                N) for i in range(R)])
    se = np.sqrt(boot.std() ** 2 + adap.std() ** 2) / np.sqrt(R)
    assert abs(boot.mean() - adap.mean()) < 4 * se + 0.2, \
        (boot.mean(), adap.mean(), se)


def test_fused_statistically_matches_gather():
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    params = svjm.from_scalars(A=0.9, Q=0.5, R=1.0, pJ=0.2, QJ=2.0,
                               dtype=jnp.float32)
    T, N, R = 16, 64, 60
    ys, _ = svjm.generate_data(jax.random.PRNGKey(0), params, T)
    ys = ys.astype(jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    pv = float(svjm.stationary_variance(params))

    gather = jax.jit(lambda k: buffered.run_buffered_pf(
        svjm.KERNEL, svjm.grad_statistic, params, ys, key=k, n_particles=N,
        statistic_dim=svjm.STATISTIC_DIM, smoother="poyiadjis_N",
        resampler="systematic", resample_mode="gather",
        prior_mean=0.0, prior_var=pv))
    g = np.stack([np.asarray(gather(jax.random.fold_in(
        jax.random.PRNGKey(10), i)).mean_statistic) for i in range(R)])

    f = np.stack([np.asarray(fused_pf_score(
        svjm.FUSED, jax.random.fold_in(jax.random.PRNGKey(20), i), params,
        ys, w, N, 0.0, pv, interpret=True)[0]) for i in range(R)])

    se = np.sqrt(g.std(0) ** 2 + f.std(0) ** 2) / np.sqrt(R)
    assert np.all(np.abs(g.mean(0) - f.mean(0)) < 4 * se + 1e-2), \
        (g.mean(0), f.mean(0), se)


def test_generate_data_stationary_moments():
    params = svjm.from_scalars(A=0.7, Q=0.5, R=1.0, pJ=0.25, QJ=4.0,
                               dtype=jnp.float64)
    _, xs = svjm.generate_data(jax.random.PRNGKey(7), params, 40000)
    target = float(svjm.stationary_variance(params))
    assert abs(float(jnp.var(xs)) - target) < 0.15 * target


def test_sampler_sgld_smoke():
    from sgmcmc_tpu.inference.samplers import SVJMSampler

    true = svjm.from_scalars(A=0.9, Q=0.5, R=1.0, pJ=0.1, QJ=2.0)
    ys, _ = svjm.generate_data(jax.random.PRNGKey(0), true, 128)
    s = SVJMSampler(observations=np.asarray(ys), seed=1)
    s.parameters = true
    for _ in range(3):
        s.sample_sgld(epsilon=1e-3, subsequence_length=16, buffer_length=4,
                      N=64, kind="pf", resample_mode="gather")
        s.project_parameters()
    leaves = jax.tree_util.tree_leaves(s.parameters)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    ll = s.noisy_loglikelihood(subsequence_length=16, buffer_length=4, N=64,
                               kind="pf", resample_mode="gather")
    assert np.isfinite(ll)


def test_registry_and_exports():
    import sgmcmc_tpu
    from sgmcmc_tpu.models.registry import get_model

    api = get_model("svjm")
    assert api.grad_statistic_dim == 5
    assert sgmcmc_tpu.SVJMSampler is not None
    assert sgmcmc_tpu.SeqSVJMSampler is not None
