"""kind='marginal' buffered exact-gradient estimator (LGSSM + HMM)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.inference import sgmcmc
from sgmcmc_tpu.inference.samplers import GaussHMMSampler, LGSSMSampler
from sgmcmc_tpu.models import gauss_hmm as ghmm
from sgmcmc_tpu.models import lgssm as lgssm_mod


def test_lgssm_marginal_score_unbiased():
    """E over subsequences of the windowed marginal gradient == full grad."""
    params = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                     R=[[0.7]])
    T, S, B = 24, 6, 24  # full-T buffers -> exact boundary messages
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(0), params, T)
    full = lgssm_mod.gradient_marginal_loglikelihood(params, ys)

    W = S + 2 * B
    acc = jax.tree_util.tree_map(jnp.zeros_like, params)
    from sgmcmc_tpu.ops.subsequence import subsequence_weights
    n_starts = T - S + 1
    for start in range(n_starts):
        w = subsequence_weights(start, S, T, "uniform", ys.dtype)
        idx = start - B + jnp.arange(W)
        valid = ((idx >= 0) & (idx < T)).astype(ys.dtype)
        window = jnp.take(ys, jnp.clip(idx, 0, T - 1), axis=0)
        g, ll = lgssm_mod.windowed_marginal_gradient(params, window, valid,
                                                     w, B, S)
        assert np.isfinite(float(ll))
        acc = jax.tree_util.tree_map(lambda a, b: a + b / n_starts, acc, g)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(
            np.asarray(getattr(acc, name)),
            np.asarray(getattr(full, name)), rtol=1e-6, atol=1e-8,
            err_msg=name)


def test_lgssm_windowed_buffer_bias_decays():
    """Small buffers bias the boundary messages; bias shrinks with B."""
    params = lgssm_mod.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.3]],
                                     R=[[0.5]])
    T, S = 40, 8
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(1), params, T)
    start = 16
    from sgmcmc_tpu.ops import kalman
    from sgmcmc_tpu.ops.subsequence import subsequence_weights
    w = subsequence_weights(start, S, T, "uniform", ys.dtype)
    # truth: exact full-data boundary messages
    fmsg = kalman.forward_message(ys[:start], params.A, params.C,
                                  params.LQinv, params.LRinv,
                                  lgssm_mod.default_forward_message(params))
    bmsg = kalman.backward_message(ys[start + S:], params.A, params.C,
                                   params.LQinv, params.LRinv,
                                   lgssm_mod.default_backward_message(params))
    exact = lgssm_mod.gradient_marginal_loglikelihood(
        params, ys[start:start + S], forward_msg=fmsg, backward_msg=bmsg,
        weights=w)
    from jax.flatten_util import ravel_pytree
    exact_v, _ = ravel_pytree(exact)

    errs = {}
    for B in [0, 2, 8]:
        W = S + 2 * B
        idx = start - B + jnp.arange(W)
        valid = ((idx >= 0) & (idx < T)).astype(ys.dtype)
        window = jnp.take(ys, jnp.clip(idx, 0, T - 1), axis=0)
        g, _ = lgssm_mod.windowed_marginal_gradient(params, window, valid,
                                                    w, B, S)
        gv, _ = ravel_pytree(g)
        errs[B] = float(jnp.linalg.norm(gv - exact_v))
    assert errs[8] < errs[0], errs
    assert errs[2] < errs[0], errs


def test_lgssm_sampler_sgld_marginal_kind():
    params = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                     R=[[0.7]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(2), params, 100)
    s = LGSSMSampler(observations=ys, parameters=params, seed=3)
    for _ in range(10):
        s.sample_sgld(epsilon=0.05, kind="marginal", subsequence_length=16,
                      buffer_length=4)
    assert np.isfinite(float(s.parameters.A[0, 0]))


def test_gauss_hmm_sampler_end_to_end():
    true = ghmm.from_values(pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-1.0], [1.5]],
                            R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(3), true, 400)
    s = GaussHMMSampler(observations=ys, num_states=2, m=1, seed=4)
    s.parameters = true
    # SGLD with buffered marginal gradients
    for _ in range(20):
        s.sample_sgld(epsilon=0.1, subsequence_length=32, buffer_length=8)
    mu = np.sort(np.asarray(s.parameters.mu).ravel())
    assert np.all(np.isfinite(mu))
    # Gibbs
    for _ in range(5):
        s.sample_gibbs()
    assert np.isfinite(float(s.exact_loglikelihood()))
    # SGRLD
    for _ in range(5):
        s.sample_sgrld(epsilon=0.05, subsequence_length=32, buffer_length=8)
    assert np.all(np.isfinite(np.asarray(s.parameters.mu)))


def test_hmm_noisy_loglik_same_scale_as_exact():
    """The buffered weighted marginal loglik is a *metric*, not an unbiased
    estimator (the boundary-message log-constants are scaled by the edge
    weights, as in the reference `sgmcmc_sampler.py:150-209`); check it
    tracks the exact value's scale and sign."""
    true = ghmm.from_values(pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-1.0], [1.5]],
                            R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(5), true, 200)
    s = GaussHMMSampler(observations=ys, num_states=2, m=1, seed=6)
    s.parameters = true
    exact = s.exact_loglikelihood()
    noisy = np.mean([s.noisy_loglikelihood(subsequence_length=32,
                                           buffer_length=16)
                     for _ in range(40)])
    assert np.isfinite(noisy)
    assert 0.3 * abs(exact) < abs(noisy) < 3.0 * abs(exact), (noisy, exact)
    # full-sequence request returns the exact value
    np.testing.assert_allclose(s.noisy_loglikelihood(), exact, rtol=1e-9)


def test_gauss_hmm_scir_sgld():
    """SCIR SGLD keeps the simplex valid and the chain finite."""
    true = ghmm.from_values(pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-1.0], [1.5]],
                            R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = ghmm.generate_data(jax.random.PRNGKey(7), true, 300)
    s = GaussHMMSampler(observations=ys, num_states=2, m=1, seed=8)
    s.parameters = true
    for _ in range(15):
        s.sample_sgld_scir(epsilon=0.05, subsequence_length=32,
                           buffer_length=8)
    pi = np.asarray(s.parameters.pi)
    np.testing.assert_allclose(pi.sum(axis=1), 1.0, rtol=1e-6)
    assert np.all(pi > 0)
    assert np.all(np.isfinite(np.asarray(s.parameters.mu)))


def test_noisy_loglikelihood_kind_complete():
    """kind='complete' = complete-data loglikelihood at an FFBS draw
    (`sgmcmc_sampler.py:175-210`): stochastic, finite, and below the
    marginal loglikelihood in expectation (Jensen)."""
    import numpy as np
    from sgmcmc_tpu.inference.samplers import LGSSMSampler
    from sgmcmc_tpu.models import lgssm

    p = lgssm.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]], R=[[1.0]],
                            dtype=jnp.float64)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), p, 80)
    s = LGSSMSampler(observations=np.asarray(ys), parameters=p, seed=0)
    lls = np.array([s.noisy_loglikelihood(kind="complete",
                                          subsequence_length=20,
                                          buffer_length=4)
                    for _ in range(8)])
    assert np.all(np.isfinite(lls))
    assert lls.std() > 0.0
    assert lls.mean() < s.exact_loglikelihood()
