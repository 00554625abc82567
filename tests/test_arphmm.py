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
