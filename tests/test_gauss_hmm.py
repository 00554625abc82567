"""GaussHMM: brute-force path-enumeration oracle and autodiff cross-checks."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import gauss_hmm as ghmm
from sgmcmc_tpu.ops import hmm


def make_params(K=3, m=1, seed=0):
    rng = np.random.default_rng(seed)
    pi = rng.dirichlet(np.ones(K) * 3, size=K)
    mu = np.linspace(-2, 2, K)[:, None] * np.ones((1, m))
    R = np.stack([np.eye(m) * (0.3 + 0.2 * k) for k in range(K)])
    return ghmm.from_values(pi, mu, R)


def brute_force_loglik(params, ys):
    """Enumerate all K^T latent paths: independent oracle."""
    pi = np.asarray(params.pi)
    mu = np.asarray(params.mu)
    R = np.asarray(params.R)
    K = pi.shape[0]
    T = ys.shape[0]
    init = np.ones(K) / K     # default forward message
    logP = np.zeros((T, K))
    for t in range(T):
        for k in range(K):
            d = ys[t] - mu[k]
            logP[t, k] = (-0.5 * d @ np.linalg.solve(R[k], d)
                          - 0.5 * np.linalg.slogdet(2 * np.pi * R[k])[1])
    total = -np.inf
    for path in itertools.product(range(K), repeat=T):
        lp = np.log(init @ pi[:, path[0]]) + logP[0, path[0]]
        for t in range(1, T):
            lp += np.log(pi[path[t - 1], path[t]]) + logP[t, path[t]]
        total = np.logaddexp(total, lp)
    return total


def test_marginal_loglik_vs_bruteforce():
    params = make_params(K=3, m=1)
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(0), params, 6)
    ll = float(ghmm.marginal_loglikelihood(params, ys))
    expected = brute_force_loglik(params, np.asarray(ys))
    np.testing.assert_allclose(ll, expected, rtol=1e-10)


def test_gradient_matches_autodiff():
    params = make_params(K=3, m=2, seed=1)
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(1), params, 12)
    analytic = ghmm.gradient_marginal_loglikelihood(params, ys)
    auto = jax.grad(lambda p: ghmm.marginal_loglikelihood(p, ys))(params)
    for name in ["logit_pi", "mu", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, atol=1e-9,
            err_msg=name)


def test_weighted_gradient_unbiased_over_subsequences():
    from sgmcmc_tpu.ops.subsequence import subsequence_weights
    params = make_params(K=2, m=1, seed=2)
    T, S = 10, 4
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(2), params, T)
    full = ghmm.gradient_marginal_loglikelihood(params, ys)
    logP = ghmm.emission_logliks(params, ys)
    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    n_starts = T - S + 1
    for start in range(n_starts):
        w = subsequence_weights(start, S, T, "uniform", ys.dtype)
        fmsgs = hmm.forward_messages(logP[:start], params.pi,
                                     ghmm.default_forward_message(params))
        fmsg = hmm.HMMMessage(fmsgs.prob[-1], fmsgs.log_constant[-1])
        bmsgs = hmm.backward_messages(logP[start + S:], params.pi,
                                      ghmm.default_backward_message(params))
        bmsg = hmm.HMMMessage(bmsgs.prob[0], bmsgs.log_constant[0])
        g = ghmm.gradient_marginal_loglikelihood(
            params, ys[start:start + S], forward_msg=fmsg,
            backward_msg=bmsg, weights=w)
        acc = jax.tree_util.tree_map(lambda a, b: a + b / n_starts, acc, g)
    for name in ["logit_pi", "mu", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(acc, name)),
            np.asarray(getattr(full, name)), rtol=1e-5, atol=1e-7,
            err_msg=name)


def test_grad_logprior_matches_autodiff_partial():
    """mu-prior treats R as constant (reference semantics); pi in logit."""
    params = make_params(K=2, m=1, seed=3)
    prior = ghmm.default_prior(2, 1, var=4.0)
    analytic = ghmm.grad_logprior(prior, params)

    def partial_lp(p):
        pi = p.pi
        lp = jnp.sum((prior.alpha_pi - 1.0) * jnp.log(pi))
        Rinv = jax.lax.stop_gradient(p.Rinv)
        diff = p.mu - prior.mean_mu
        lp += -0.5 * jnp.sum(jnp.einsum('km,kmn,kn->k', diff, Rinv, diff)
                             / prior.var_col_mu)
        from sgmcmc_tpu.utils.distributions import wishart_logpdf
        lp += jnp.sum(jax.vmap(wishart_logpdf, in_axes=(0, None, 0))(
            p.Rinv, prior.df_Rinv, prior.scale_Rinv))
        return lp

    auto = jax.grad(partial_lp)(params)
    for name in ["logit_pi", "mu", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(analytic, name)),
            np.asarray(getattr(auto, name)), rtol=1e-6, atol=1e-9,
            err_msg=name)


def test_latent_var_distr_sums_to_one_and_tracks_truth():
    params = make_params(K=2, m=1, seed=4)
    ys, zs = ghmm.generate_data(jax.random.PRNGKey(4), params, 200)
    probs = ghmm.latent_var_distr(params, ys)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-9)
    pred = np.argmax(np.asarray(probs), axis=-1)
    acc = np.mean(pred == np.asarray(zs))
    assert max(acc, 1 - acc) > 0.7  # up to label swap


def test_ffbs_marginals_match_smoothed():
    params = make_params(K=2, m=1, seed=5)
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(5), params, 30)
    probs = np.asarray(ghmm.latent_var_distr(params, ys))
    samples = jax.vmap(lambda k: ghmm.latent_var_sample(params, k, ys))(
        jax.random.split(jax.random.PRNGKey(6), 3000))
    freq = np.asarray(samples).mean(axis=0)
    np.testing.assert_allclose(freq, probs[:, 1], atol=0.05)


def test_gibbs_recovers_means():
    params = make_params(K=2, m=1, seed=6)
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(7), params, 500)
    prior = ghmm.default_prior(2, 1, var=10.0)
    p = ghmm.sample_prior(prior, jax.random.PRNGKey(8))
    mus = []
    step = jax.jit(ghmm.gibbs_step)
    for i in range(60):
        p = step(jax.random.PRNGKey(100 + i), prior, p, ys)
        if i >= 20:
            mus.append(np.sort(np.asarray(p.mu).ravel()))
    est = np.mean(mus, axis=0)
    np.testing.assert_allclose(est, np.sort(np.asarray(params.mu).ravel()),
                               atol=0.3)


def test_scir_update_preserves_positivity():
    params = make_params(K=3, m=1, seed=7)
    a = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (3, 3))) + 1.0
    new_logit = ghmm.scir_transition_update(jax.random.PRNGKey(10), params,
                                            a, 0.1)
    assert np.all(np.isfinite(np.asarray(new_logit)))
    pi_new = jax.nn.softmax(new_logit, axis=-1)
    np.testing.assert_allclose(np.asarray(pi_new).sum(-1), 1.0, rtol=1e-9)


def test_sgld_step_runs_end_to_end():
    params = make_params(K=2, m=1, seed=8)
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(11), params, 100)
    prior = ghmm.default_prior(2, 1)
    T = 100

    @jax.jit
    def sgld(key, p):
        g_ll = ghmm.gradient_marginal_loglikelihood(p, ys)
        g = jax.tree_util.tree_map(
            lambda a, b: (a + b) / T, g_ll, ghmm.grad_logprior(prior, p))
        from sgmcmc_tpu.inference.sgmcmc import tree_random_normal
        noise = tree_random_normal(key, p, 1.0 / T)
        eps = 0.05
        new = jax.tree_util.tree_map(
            lambda pp, gg, nn: pp + eps * gg + jnp.sqrt(2 * eps) * nn,
            p, g, noise)
        return ghmm.project_parameters(new)

    p = params
    for i in range(10):
        p = sgld(jax.random.PRNGKey(i), p)
    assert np.all(np.isfinite(np.asarray(p.mu)))
