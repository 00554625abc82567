"""Validity-masked exact gradients on zero-padded sequences.

The SeqSampler full path (S=-1) runs every sequence at the padded T_max
with a validity mask; the masked gradient/loglik must equal the unpadded
computation exactly (this is what lets one vmapped program replace the
reference's per-sequence Python loop, `sgmcmc_sampler.py:1184-1222`).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from sgmcmc_tpu.models import arphmm, gauss_hmm, lgssm


def _assert_tree_close(a, b, rtol=1e-9):
    av, _ = ravel_pytree(a)
    bv, _ = ravel_pytree(b)
    np.testing.assert_allclose(np.asarray(av), np.asarray(bv), rtol=rtol,
                               atol=1e-10)


def _pad(ys, T_pad):
    pad = np.zeros((T_pad - ys.shape[0],) + ys.shape[1:], np.asarray(ys).dtype)
    return jnp.asarray(np.concatenate([np.asarray(ys), pad]))


def test_lgssm_padded_gradient_matches_unpadded():
    p = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), p, 37)
    T, T_pad = 37, 64
    padded = _pad(ys, T_pad)
    vld = (jnp.arange(T_pad) < T).astype(padded.dtype)
    g_pad, ll_pad = lgssm.windowed_marginal_gradient(p, padded, vld, vld,
                                                     0, T_pad)
    g = lgssm.gradient_marginal_loglikelihood(p, ys)
    ll = lgssm.marginal_loglikelihood(p, ys)
    _assert_tree_close(g_pad, g)
    np.testing.assert_allclose(float(ll_pad), float(ll), rtol=1e-9)


def test_gauss_hmm_padded_gradient_matches_unpadded():
    p = gauss_hmm.from_values(pi=[[0.9, 0.1], [0.2, 0.8]],
                              mu=[[-1.0], [1.5]],
                              R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(1), p, 41)
    T, T_pad = 41, 64
    padded = _pad(ys, T_pad)
    vld = (jnp.arange(T_pad) < T).astype(padded.dtype)
    g_pad, ll_pad = gauss_hmm.windowed_marginal_gradient(p, padded, vld, vld,
                                                         0, T_pad)
    g = gauss_hmm.gradient_marginal_loglikelihood(p, ys)
    ll = gauss_hmm.marginal_loglikelihood(p, ys)
    _assert_tree_close(g_pad, g)
    np.testing.assert_allclose(float(ll_pad), float(ll), rtol=1e-9)


def test_arphmm_padded_gradient_matches_unpadded():
    p = arphmm.from_values(pi=[[0.9, 0.1], [0.2, 0.8]],
                           D=np.array([[[0.7]], [[-0.6]]]),
                           R=np.stack([np.eye(1) * 0.3, np.eye(1) * 0.3]))
    ys, _ = arphmm.generate_data(jax.random.PRNGKey(2), p, 33)
    T, T_pad = 33, 48
    padded = _pad(ys, T_pad)
    vld = (jnp.arange(T_pad) < T).astype(jnp.float64)
    g_pad, ll_pad = arphmm.windowed_marginal_gradient(p, padded, vld, vld,
                                                      0, T_pad)
    g = arphmm.gradient_marginal_loglikelihood(p, ys)
    ll = arphmm.marginal_loglikelihood(p, ys)
    _assert_tree_close(g_pad, g)
    np.testing.assert_allclose(float(ll_pad), float(ll), rtol=1e-9)


def test_seq_lgssm_full_fit_scan_compiles_once_for_many_sequences():
    """The padded full path is one vmapped program: a SeqLGSSMSampler over
    12 ragged sequences with S=-1 must run fit_scan without per-sequence
    unrolling blowing up (smoke: finite params afterward)."""
    from sgmcmc_tpu.inference.samplers import SeqLGSSMSampler
    p = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    seqs = []
    for i in range(12):
        T_i = 20 + 3 * i
        ys, _ = lgssm.generate_data(jax.random.PRNGKey(10 + i), p, T_i)
        seqs.append(np.asarray(ys))
    s = SeqLGSSMSampler(seqs, seed=0)
    s.parameters = p
    trace = s.fit_scan("SGLD", num_iters=5, epsilon=1e-3, kind="marginal",
                       subsequence_length=-1)
    flat, _ = ravel_pytree(s.parameters)
    assert np.all(np.isfinite(np.asarray(flat)))
