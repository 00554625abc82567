"""ARPHMM: gradient vs autodiff, stacking, recovery."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import arphmm


def make_params(K=2, m=1, p=2, seed=0):
    rng = np.random.default_rng(seed)
    pi = rng.dirichlet(np.ones(K) * 4, size=K)
    D = 0.4 * rng.normal(size=(K, m, m * p)) / np.sqrt(m * p)
    R = np.stack([np.eye(m) * (0.4 + 0.2 * k) for k in range(K)])
    return arphmm.from_values(pi, D, R)


def test_stack_y_layout():
    y = jnp.arange(10.0)[:, None]
    s = arphmm.stack_y(y, 2)
    assert s.shape == (8, 3, 1)
    # row t: [y[p+t], y[p+t-1], y[t]]
    np.testing.assert_allclose(np.asarray(s[0, :, 0]), [2.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(s[5, :, 0]), [7.0, 6.0, 5.0])


def test_gradient_matches_autodiff():
    params = make_params(K=2, m=2, p=1, seed=1)
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(1), params, 15)
    analytic = arphmm.gradient_marginal_loglikelihood(params, ys)
    auto = jax.grad(lambda q: arphmm.marginal_loglikelihood(q, ys))(params)
    for name in ["logit_pi", "D", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, atol=1e-9,
            err_msg=name)


def test_generate_and_loglik_finite():
    params = make_params(K=3, m=1, p=2, seed=2)
    ys, zs = arphmm.generate_data(jax.random.PRNGKey(2), params, 100)
    assert ys.shape == (100, 3, 1)
    assert zs.shape == (100,)
    assert np.isfinite(float(arphmm.marginal_loglikelihood(params, ys)))


def test_latent_distr_and_sample():
    params = make_params(K=2, m=1, p=1, seed=3)
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(3), params, 50)
    probs = arphmm.latent_var_distr(params, ys)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-9)
    z = arphmm.latent_var_sample(params, jax.random.PRNGKey(4), ys)
    assert z.shape == (50,)


def test_prior_grad_and_sample():
    prior = arphmm.default_prior(2, 1, 2, var=5.0)
    params = arphmm.sample_prior(prior, jax.random.PRNGKey(5))
    assert np.isfinite(float(arphmm.logprior(prior, params)))
    g = arphmm.grad_logprior(prior, params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_projection_and_preconditioner_shapes():
    params = make_params(K=2, m=1, p=2, seed=6)
    p2 = arphmm.project_parameters(params)
    assert np.allclose(np.asarray(p2.logit_pi).mean(axis=1), 0.0, atol=1e-9)
    g = arphmm.gradient_marginal_loglikelihood(
        params, arphmm.generate_data(jax.random.PRNGKey(7), params, 20)[0])
    pg = arphmm.precondition(params, g)
    noise = arphmm.precondition_noise(params, jax.random.PRNGKey(8))
    corr = arphmm.correction_term(params)
    for tree in (pg, noise, corr):
        for a, b in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(params)):
            assert a.shape == b.shape


def test_gibbs_recovers_ar_coefficients():
    """Conjugate blocked Gibbs (z-FFBS + MNIW draw) concentrates around
    the generating AR coefficients (`arphmm/sampler.py:216-231`)."""
    params = make_params(K=2, m=1, p=1, seed=6)
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(7), params, 800)
    prior = arphmm.default_prior(2, 1, 1, var=10.0)
    p = arphmm.sample_prior(prior, jax.random.PRNGKey(8))
    step = jax.jit(arphmm.gibbs_step)
    Ds = []
    for i in range(60):
        p = step(jax.random.PRNGKey(100 + i), prior, p, ys)
        if i >= 20:
            Ds.append(np.sort(np.asarray(p.D).ravel()))
    est = np.mean(Ds, axis=0)
    np.testing.assert_allclose(est, np.sort(np.asarray(params.D).ravel()),
                               atol=0.25)


def test_gibbs_posterior_matches_conjugate_formula_single_state():
    """With K=1 the (D, Rinv) posterior is standard Bayesian linear
    regression: check the Gibbs draws' moments against the closed form."""
    params = make_params(K=1, m=1, p=1, seed=9)
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(10), params, 400)
    prior = arphmm.default_prior(1, 1, 1, var=100.0)
    z = np.zeros(400, dtype=np.int32)
    y0 = np.asarray(ys[:, 0, 0])
    yp = np.asarray(ys[:, 1, 0])
    # closed-form posterior mean of D (ridge with precision 1/var)
    spp = np.dot(yp, yp) + 1.0 / 100.0
    d_post = np.dot(y0, yp) / spp
    draws = [float(arphmm.gibbs_parameters_sample(
        jax.random.PRNGKey(200 + i), prior, ys, jnp.asarray(z)).D[0, 0, 0])
        for i in range(200)]
    assert abs(np.mean(draws) - d_post) < 0.02


def test_sampler_gibbs_and_scir_run():
    from sgmcmc_tpu.inference.samplers import ARPHMMSampler
    params = make_params(K=2, m=1, p=1, seed=11)
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(12), params, 120)
    s = ARPHMMSampler(observations=ys, num_states=2, m=1, p=1, seed=3)
    s.sample_gibbs()
    s.sample_sgld_scir(epsilon=0.05, subsequence_length=32, buffer_length=4)
    for leaf in jax.tree_util.tree_leaves(s.parameters):
        assert np.all(np.isfinite(np.asarray(leaf)))
