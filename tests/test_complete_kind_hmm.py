"""kind='complete' for the HMM family (VERDICT r1 item 4).

Fisher identity oracle: E_{z ~ p(z|y)}[grad log p(y, z)] = grad log p(y),
so the complete-data score averaged over FFBS draws must match the exact
marginal gradient (`sgmcmc_sampler.py:330-362` extended beyond the LGSSM).
"""
import jax
import jax.numpy as jnp
import numpy as np

from jax.flatten_util import ravel_pytree

from sgmcmc_tpu.inference.samplers import ARPHMMSampler, GaussHMMSampler
from sgmcmc_tpu.models import arphmm, gauss_hmm


def _rel_err(a, b):
    av, _ = ravel_pytree(a)
    bv, _ = ravel_pytree(b)
    return float(jnp.linalg.norm(av - bv) / (jnp.linalg.norm(bv) + 1e-12))


def test_gauss_hmm_complete_matches_marginal_gradient():
    true = gauss_hmm.from_values(
        pi=[[0.85, 0.15], [0.25, 0.75]], mu=[[-1.5], [1.5]],
        R=np.stack([np.eye(1) * 0.4, np.eye(1) * 0.4]))
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(0), true, 150)
    exact = gauss_hmm.gradient_marginal_loglikelihood(true, ys)
    T = ys.shape[0]
    ones = jnp.ones((T,), ys.dtype)
    g, ll = jax.jit(lambda k: gauss_hmm.windowed_complete_gradient(
        true, ys, ones, ones, 0, T, k, num_samples=256))(
        jax.random.PRNGKey(1))
    assert np.isfinite(float(ll))
    assert _rel_err(g, exact) < 0.15, (g, exact)


def test_arphmm_complete_matches_marginal_gradient():
    true = arphmm.from_values(
        pi=[[0.9, 0.1], [0.2, 0.8]],
        D=np.array([[[0.7]], [[-0.6]]]),
        R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(2), true, 150)
    exact = arphmm.gradient_marginal_loglikelihood(true, ys)
    T = ys.shape[0]
    ones = jnp.ones((T,), ys.dtype)
    g, ll = jax.jit(lambda k: arphmm.windowed_complete_gradient(
        true, ys, ones, ones, 0, T, k, num_samples=256))(
        jax.random.PRNGKey(3))
    assert np.isfinite(float(ll))
    assert _rel_err(g, exact) < 0.15, (g, exact)


def test_gauss_hmm_sampler_complete_kind_end_to_end():
    true = gauss_hmm.from_values(
        pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-1.0], [1.5]],
        R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(4), true, 300)
    s = GaussHMMSampler(observations=ys, num_states=2, m=1, seed=5)
    s.parameters = true
    # buffered complete-data SGLD steps stay finite on the simplex
    for _ in range(10):
        s.sample_sgld(epsilon=0.05, kind="complete", subsequence_length=32,
                      buffer_length=8, num_samples=4)
    pi = np.asarray(s.parameters.pi)
    np.testing.assert_allclose(pi.sum(axis=1), 1.0, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(s.parameters.mu)))
    ll = s.noisy_loglikelihood(kind="complete", subsequence_length=32,
                               buffer_length=8)
    assert np.isfinite(ll)
    # Jensen: complete-data loglik at a latent draw <= marginal
    full = np.mean([s.noisy_loglikelihood(kind="complete")
                    for _ in range(5)])
    assert full < s.exact_loglikelihood()


def test_arphmm_sampler_complete_kind_end_to_end():
    true = arphmm.from_values(
        pi=[[0.9, 0.1], [0.2, 0.8]],
        D=np.array([[[0.7]], [[-0.6]]]),
        R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(6), true, 200)
    s = ARPHMMSampler(observations=ys, num_states=2, m=1, p=1, seed=7)
    s.parameters = true
    for _ in range(10):
        s.sample_sgld(epsilon=0.05, kind="complete", subsequence_length=32,
                      buffer_length=8)
    assert np.all(np.isfinite(np.asarray(s.parameters.D)))
    pi = np.asarray(s.parameters.pi)
    np.testing.assert_allclose(pi.sum(axis=1), 1.0, rtol=1e-6)


def test_complete_kind_unknown_model_raises():
    import pytest
    from sgmcmc_tpu.inference.samplers import SVMSampler
    from sgmcmc_tpu.models import svm
    p = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), p, 50)
    s = SVMSampler(ys, seed=0)
    with pytest.raises(NotImplementedError):
        s.noisy_gradient(kind="complete", subsequence_length=16)
