"""Sampler.predict / predictive_loglikelihood / kind='complete'."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.inference.samplers import (GARCHSampler, LGSSMSampler,
                                           SVMSampler)
from sgmcmc_tpu.models import garch as garch_mod
from sgmcmc_tpu.models import lgssm as lgssm_mod
from sgmcmc_tpu.models import svm as svm_mod
from sgmcmc_tpu.ops import kalman


def test_lgssm_pf_latent_distr_matches_exact_smoother():
    """PF elementwise smoothed means ~= exact Kalman smoothed means."""
    params = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                     R=[[0.7]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(0), params, 30)
    s = LGSSMSampler(observations=ys, parameters=params, seed=1)
    exact_mean, exact_cov = s.predict(kind="marginal")
    reps = []
    for _ in range(8):
        x_mean, x_cov = s.predict(kind="pf", N=500, pf="poyiadjis_N",
                                  kernel="optimal")
        reps.append(x_mean[:, 0])
    pf_mean = np.mean(reps, axis=0)
    rmse = np.sqrt(np.mean((pf_mean - exact_mean[:, 0]) ** 2))
    scale = np.sqrt(np.mean(exact_mean[:, 0] ** 2))
    assert rmse < 0.25 * scale + 0.1, (rmse, scale)


def test_svm_latent_distr_shapes_and_positivity():
    true = svm_mod.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, xs = svm_mod.generate_data(jax.random.PRNGKey(1), true, 50)
    s = SVMSampler(observations=ys, parameters=true, seed=2)
    x_mean, x_cov = s.predict(kind="pf", N=400)
    assert x_mean.shape == (50, 1)
    assert x_cov.shape == (50, 1, 1)
    # smoothed mean should correlate with the true latent path
    c = np.corrcoef(x_mean[:, 0], np.asarray(xs)[:, 0])[0, 1]
    assert c > 0.3, c


def test_svm_predictive_loglikelihood():
    true = svm_mod.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm_mod.generate_data(jax.random.PRNGKey(2), true, 60)
    s = SVMSampler(observations=ys, parameters=true, seed=3)
    out = s.predictive_loglikelihood(num_steps_ahead=3, N=200)
    assert out.shape == (4,)
    assert np.all(np.isfinite(out))
    # slot 0 is the loglikelihood estimate; further steps predict worse
    assert out[0] < 0


def test_garch_predictive_loglikelihood():
    true = garch_mod.from_alpha_beta_gamma(0.1, 0.4, 0.3, 0.5,
                                           dtype=jnp.float64)
    ys, _ = garch_mod.generate_data(jax.random.PRNGKey(3), true, 60)
    s = GARCHSampler(observations=ys, parameters=true, seed=4)
    out = s.predictive_loglikelihood(num_steps_ahead=2, N=200)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))


def test_lgssm_complete_kind_gradient_unbiasedness():
    """kind='complete' score averaged over many latent draws ~= exact
    Kalman gradient (Fisher identity)."""
    params = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                     R=[[0.7]])
    T = 20
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(4), params, T)
    exact = lgssm_mod.gradient_marginal_loglikelihood(params, ys)
    from jax.flatten_util import ravel_pytree
    exact_v, _ = ravel_pytree(exact)

    valid = jnp.ones((T,), ys.dtype)
    weights = jnp.ones((T,), ys.dtype)
    f = jax.jit(lambda k: lgssm_mod.windowed_complete_gradient(
        params, ys, valid, weights, 0, T, k, num_samples=8)[0])
    grads = [ravel_pytree(f(jax.random.PRNGKey(100 + i)))[0]
             for i in range(24)]
    mean_g = np.mean(np.asarray(grads), axis=0)
    se = np.std(np.asarray(grads), axis=0) / np.sqrt(len(grads))
    err = np.abs(mean_g - np.asarray(exact_v))
    assert np.all(err < 5 * se + 0.05 * np.abs(np.asarray(exact_v)) + 0.05)


def test_lgssm_sampler_complete_kind_step():
    params = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                     R=[[0.7]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(5), params, 80)
    s = LGSSMSampler(observations=ys, parameters=params, seed=6)
    for _ in range(5):
        s.sample_sgld(epsilon=0.05, kind="complete", subsequence_length=16,
                      buffer_length=4, num_samples=4)
    assert np.isfinite(float(s.parameters.A[0, 0]))
