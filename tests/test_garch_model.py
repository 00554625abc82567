"""GARCH model: score vs autodiff, prior score vs autodiff, kernels, PF."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import garch
from sgmcmc_tpu.ops import buffered


def make_params(dtype=jnp.float64):
    return garch.from_alpha_beta_gamma(alpha=0.1, beta=0.4, gamma=0.3, R=0.5,
                                       dtype=dtype)


def complete_data_loglike(params, x_t, x_next, y_next):
    trans = garch._prior_log_density(params, x_t[None, :], x_next[None, :])[0]
    diff = y_next[0] - x_next[0]
    emit = (-0.5 * np.log(2 * np.pi) - 0.5 * diff ** 2 * params.rinv
            + jnp.log(jnp.abs(params.lrinv)))
    return trans + emit


def test_grad_statistic_matches_autodiff():
    """The hand-derived chain-rule score must equal autodiff of the
    complete-data loglikelihood in the unconstrained coordinates.

    The transition density depends on sigma2' = x_next[1] which is a
    deterministic function of (x_t, theta); the reference's statistic
    differentiates through that dependence, so autodiff must too: rebuild
    sigma2' from (theta, x_t) instead of reading the stored component.
    """
    params = make_params()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (5,), jnp.float64) * 0.5
    s2 = 0.3 + 0.1 * jax.random.uniform(jax.random.fold_in(key, 1), (5,),
                                        jnp.float64)
    x_t = jnp.stack([x, s2], axis=-1)
    y = jnp.array([0.3], jnp.float64)

    # proposal draw with the deterministic variance recursion applied
    xn = jax.random.normal(jax.random.fold_in(key, 2), (5,), jnp.float64)

    def cdl(p, x_t_i, xn_i, yy):
        s2n = p.alpha + p.beta * x_t_i[0] ** 2 + p.gamma * x_t_i[1]
        x_next_i = jnp.stack([xn_i, s2n])
        return complete_data_loglike(p, x_t_i, x_next_i, yy)

    s2_next = garch._sigma2_next(params, x_t)
    x_next = jnp.stack([xn, s2_next], axis=-1)
    stats = garch.grad_statistic(params, x_t, x_next, y, 0)
    for i in range(5):
        g = jax.grad(cdl)(params, x_t[i], xn[i], y)
        np.testing.assert_allclose(float(stats[i, 0]), float(g.LRinv_vec[0]),
                                   rtol=1e-9)
        np.testing.assert_allclose(float(stats[i, 1]), float(g.log_mu[0]),
                                   rtol=1e-9)
        np.testing.assert_allclose(float(stats[i, 2]), float(g.logit_phi[0]),
                                   rtol=1e-9)
        np.testing.assert_allclose(float(stats[i, 3]),
                                   float(g.logit_lambduh[0]), rtol=1e-9)


def test_grad_logprior_matches_reference_convention():
    """The reference's Beta-prior gradients correspond to densities in
    (1+phi)/2; check our mirror reproduces its exact formulas."""
    params = make_params()
    prior = garch.default_prior(var=1.0, dtype=jnp.float64)
    g = garch.grad_logprior(prior, params)
    mu, phi, lam = map(float, (params.mu, params.phi, params.lambduh))
    np.testing.assert_allclose(
        float(g.log_mu[0]),
        -float(prior.shape_mu) - 1 + float(prior.scale_mu) / mu, rtol=1e-12)
    np.testing.assert_allclose(
        float(g.logit_phi[0]),
        ((float(prior.alpha_phi) - 1) / (1 + phi)
         - (float(prior.beta_phi) - 1) / (1 - phi)) * phi * (1 - phi),
        rtol=1e-12)
    np.testing.assert_allclose(
        float(g.logit_lambduh[0]),
        ((float(prior.alpha_lambduh) - 1) / (1 + lam)
         - (float(prior.beta_lambduh) - 1) / (1 - lam)) * lam * (1 - lam),
        rtol=1e-12)


def test_natural_parameter_roundtrip():
    p = make_params()
    np.testing.assert_allclose(float(p.alpha), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(p.beta), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(p.gamma), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(p.R), 0.5, rtol=1e-6)


def test_generate_data_variance():
    p = make_params()
    ys, xs = garch.generate_data(jax.random.PRNGKey(1), p, 40000)
    # var(x) = stationary variance; var(y) = var(x) + R
    sv = float(garch.stationary_variance(p))
    np.testing.assert_allclose(float(jnp.var(xs)), sv, rtol=0.15)
    np.testing.assert_allclose(float(jnp.var(ys)), sv + 0.5, rtol=0.15)


def test_optimal_kernel_runs_buffered_pf():
    p = make_params()
    ys, _ = garch.generate_data(jax.random.PRNGKey(2), p, 40)
    for kernel_name in ["optimal", "prior"]:
        out = buffered.run_buffered_pf(
            garch.get_kernel(kernel_name), garch.grad_statistic, p, ys,
            key=jax.random.PRNGKey(3), n_particles=64,
            statistic_dim=4, smoother="poyiadjis_N",
            prior_mean=0.0, prior_var=float(garch.stationary_variance(p)))
        assert np.isfinite(float(out.loglikelihood))
        assert np.all(np.isfinite(np.asarray(out.mean_statistic)))


def test_optimal_vs_prior_kernel_loglik_agree():
    """Both kernels estimate the same marginal likelihood."""
    p = make_params()
    ys, _ = garch.generate_data(jax.random.PRNGKey(4), p, 60)

    def run(kernel_name, key):
        return buffered.run_buffered_pf(
            garch.get_kernel(kernel_name), garch.suff_statistic, p, ys,
            key=key, n_particles=512, statistic_dim=3, smoother="filter",
            prior_mean=0.0,
            prior_var=float(garch.stationary_variance(p))).loglikelihood

    keys = jax.random.split(jax.random.PRNGKey(5), 10)
    ll_opt = np.mean([float(run("optimal", k)) for k in keys])
    ll_pri = np.mean([float(run("prior", k)) for k in keys])
    np.testing.assert_allclose(ll_opt, ll_pri, rtol=0.02)
