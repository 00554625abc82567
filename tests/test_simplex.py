"""Simplex coordinate layer (`utils/simplex.py` vs `variables/probweight.py`).

Property tests: round-trips between parameterizations, chain-rule gradient
transports vs autodiff, Dirichlet prior gradients in each coordinate vs
autodiff of the logprior, and conjugate posterior moments.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.utils import simplex

PI = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.6, 0.3], [0.25, 0.25, 0.5]],
                 jnp.float64)
ALPHA = jnp.asarray([[2.0, 1.5, 1.0], [1.0, 3.0, 2.0], [0.5, 2.5, 1.5]],
                    jnp.float64)


def test_roundtrips():
    np.testing.assert_allclose(
        np.asarray(simplex.pi_from_logit(simplex.logit_from_pi(PI))),
        np.asarray(PI), rtol=1e-9)
    e = jnp.asarray([[2.0, 1.0, 0.5], [0.2, 1.2, 0.6], [1.0, 1.0, 2.0]])
    np.testing.assert_allclose(
        np.asarray(simplex.pi_from_expanded(e)),
        np.asarray(e / e.sum(axis=-1, keepdims=True)), rtol=1e-9)
    # projections keep the simplex valid
    proj = simplex.project_expanded(-e, center=True)
    np.testing.assert_allclose(np.asarray(proj.sum(-1)), 1.0, rtol=1e-9)
    cl = simplex.project_logit(simplex.logit_from_pi(PI))
    np.testing.assert_allclose(np.asarray(cl.mean(-1)), 0.0, atol=1e-12)


def test_grad_logit_transport_matches_autodiff():
    def loss_pi(pi):
        return jnp.sum(jnp.sin(pi) * jnp.arange(1.0, 10.0).reshape(3, 3))

    logit = simplex.logit_from_pi(PI)
    auto = jax.grad(lambda l: loss_pi(simplex.pi_from_logit(l)))(logit)
    pi = simplex.pi_from_logit(logit)
    manual = simplex.grad_logit_from_grad_pi(jax.grad(loss_pi)(pi), pi)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto),
                               rtol=1e-8, atol=1e-10)


def test_dirichlet_grad_logit_matches_autodiff():
    logit = simplex.logit_from_pi(PI)
    auto = jax.grad(lambda l: simplex.dirichlet_logprior(
        simplex.pi_from_logit(l), ALPHA))(logit)
    manual = simplex.dirichlet_grad_logit(simplex.pi_from_logit(logit),
                                          ALPHA)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto),
                               rtol=1e-7, atol=1e-9)
    # use_scir returns the raw Dirichlet statistic
    np.testing.assert_allclose(
        np.asarray(simplex.dirichlet_grad_logit(PI, ALPHA, use_scir=True)),
        np.asarray(ALPHA))


def test_dirichlet_grad_expanded_matches_reference_formula():
    """The expanded-coordinate gradient is e^2 * dL/de (the reference's
    expanded-mean metric, `probweight.py:462-470`)."""
    e = jnp.asarray([[2.0, 1.0, 0.5], [0.2, 1.2, 0.6], [1.0, 1.0, 2.0]],
                    jnp.float64)
    manual = simplex.dirichlet_grad_expanded(e, ALPHA)
    euclid = jax.grad(lambda ee: simplex.dirichlet_logprior(
        ee / jnp.sum(ee, axis=-1, keepdims=True), ALPHA))(e)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(e * e * euclid),
                               rtol=1e-7, atol=1e-9)


def test_dirichlet_posterior_moments():
    key = jax.random.PRNGKey(0)
    counts = jnp.asarray([[30.0, 5.0, 5.0]] * 3)
    draws = jax.vmap(lambda k: simplex.dirichlet_posterior_sample(
        k, ALPHA, counts))(jax.random.split(key, 4000))
    post_alpha = np.asarray(ALPHA + counts)
    expected = post_alpha / post_alpha.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(draws.mean(0)), expected,
                               atol=0.01)


def test_bernoulli_helpers():
    logit = jnp.asarray(0.4, jnp.float64)
    p = simplex.prob_from_logit(logit)
    np.testing.assert_allclose(
        float(simplex.logit_from_prob(p)), 0.4, rtol=1e-6)
    a, b = 2.0, 5.0
    auto = jax.grad(lambda l: simplex.beta_logprior(
        simplex.prob_from_logit(l), a, b))(logit)
    np.testing.assert_allclose(float(simplex.beta_grad_logit(logit, a, b)),
                               float(auto), rtol=1e-8)

    def loss_p(pp):
        return jnp.sin(3.0 * pp)

    auto2 = jax.grad(lambda l: loss_p(simplex.prob_from_logit(l)))(logit)
    manual2 = simplex.grad_logit_from_grad_prob(jax.grad(loss_p)(p), p)
    np.testing.assert_allclose(float(manual2), float(auto2), rtol=1e-8)
