"""Validity-gated FFBS draws for the kind='complete' window path.

The buffered windows of `make_marginal_score_fn` clamp out-of-range rows
(`idx` clipped into [0, T)) and mark them invalid; the FFBS latent draw
feeding the complete-data score must be conditioned ONLY on valid rows —
exactly like the gated message passes (truncated-buffer semantics,
`sgmcmc_sampler.py:259-288`).  Three properties:

1. exact invariance: changing the *contents* of invalid rows cannot
   change the draw (bitwise);
2. law: the gated draw over the valid rows matches the ungated draw on
   the truncated sequence (per-row marginal frequencies vs the exact
   smoothed marginals);
3. unbiasedness: the complete-data score averaged over gated draws on an
   edge-clipped window equals the exact windowed marginal gradient
   (Fisher identity with the same truncation semantics) — including the
   gated z_prev/x_prev transition term.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from sgmcmc_tpu.models import gauss_hmm, lgssm
from sgmcmc_tpu.ops import hmm, kalman


def _edge_window(ys, B, S, garbage):
    """[B | S | B] window at start=0: invalid prefix, valid suffix."""
    T = ys.shape[0]
    idx = np.arange(-B, S + B)
    valid = ((idx >= 0) & (idx < T)).astype(ys.dtype)
    window = np.asarray(ys)[np.clip(idx, 0, T - 1)]
    window[valid == 0] = garbage
    return jnp.asarray(window), jnp.asarray(valid)


# ---------------------------------------------------------------- HMM ----

def _hmm_problem():
    true = gauss_hmm.from_values(
        pi=[[0.85, 0.15], [0.25, 0.75]], mu=[[-1.5], [1.5]],
        R=np.stack([np.eye(1) * 0.4, np.eye(1) * 0.4]))
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(0), true, 40)
    return true, ys


def test_hmm_ffbs_invariant_to_invalid_row_contents():
    true, ys = _hmm_problem()
    B, S = 3, 8
    key = jax.random.PRNGKey(7)
    draws = []
    for garbage in (0.0, 123.0):
        window, valid = _edge_window(ys, B, S, garbage)
        z = gauss_hmm.latent_var_sample(true, key, window, valid=valid)
        draws.append(np.asarray(z))
    np.testing.assert_array_equal(draws[0], draws[1])
    # invalid prefix placeholders copy the first valid draw
    assert np.all(draws[0][:B] == draws[0][B])


def test_hmm_gated_ffbs_matches_truncated_law():
    true, ys = _hmm_problem()
    B, S = 3, 8
    window, valid = _edge_window(ys, B, S, 55.0)
    n_draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n_draws)
    zs = jax.vmap(lambda k: gauss_hmm.latent_var_sample(
        true, k, window, valid=valid))(keys)
    freq = np.asarray(jnp.mean((zs == 1).astype(jnp.float64), axis=0))
    # exact smoothed marginals of the truncated window (the valid rows)
    trunc = ys[:S + B]
    probs = np.asarray(gauss_hmm.latent_var_distr(true, trunc))[:, 1]
    np.testing.assert_allclose(freq[B:], probs, atol=0.04)


def test_hmm_complete_gradient_unbiased_on_edge_window():
    true, ys = _hmm_problem()
    B, S = 3, 8
    window, valid = _edge_window(ys, B, S, 55.0)
    weights = jnp.full((S,), 2.0, ys.dtype)   # arbitrary subseq weights
    exact, _ = jax.jit(lambda: gauss_hmm.windowed_marginal_gradient(
        true, window, valid, weights, B, S))()
    g, ll = jax.jit(lambda k: gauss_hmm.windowed_complete_gradient(
        true, window, valid, weights, B, S, k, num_samples=4096))(
        jax.random.PRNGKey(3))
    ev, _ = ravel_pytree(exact)
    gv, _ = ravel_pytree(g)
    assert np.isfinite(float(ll))
    err = float(jnp.linalg.norm(gv - ev) / (jnp.linalg.norm(ev) + 1e-12))
    assert err < 0.1, (np.asarray(gv), np.asarray(ev))


# -------------------------------------------------------------- LGSSM ----

def _lgssm_problem():
    true = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.6]], R=[[0.4]],
                               dtype=jnp.float64)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(4), true, 40)
    return true, ys


def test_lgssm_ffbs_invariant_to_invalid_row_contents():
    true, ys = _lgssm_problem()
    B, S = 3, 8
    key = jax.random.PRNGKey(9)
    draws = []
    for garbage in (0.0, 321.0):
        window, valid = _edge_window(ys, B, S, garbage)
        x = lgssm.latent_var_sample(true, key, window, valid=valid)
        draws.append(np.asarray(x))
    np.testing.assert_array_equal(draws[0], draws[1])
    assert np.all(draws[0][:B] == draws[0][B])


def test_lgssm_gated_ffbs_matches_truncated_moments():
    true, ys = _lgssm_problem()
    B, S = 3, 8
    window, valid = _edge_window(ys, B, S, 77.0)
    n_draws = 4000
    xs = lgssm.latent_var_sample(true, jax.random.PRNGKey(5), window,
                                 num_samples=n_draws, valid=valid)
    mean = np.asarray(jnp.mean(xs, axis=0))[:, 0]
    var = np.asarray(jnp.var(xs, axis=0))[:, 0]
    trunc_mean, trunc_cov = lgssm.latent_var_distr(true, ys[:S + B])
    se = np.sqrt(np.asarray(trunc_cov)[:, 0, 0] / n_draws)
    np.testing.assert_allclose(mean[B:], np.asarray(trunc_mean)[:, 0],
                               atol=float(5 * se.max()) + 1e-6)
    np.testing.assert_allclose(var[B:], np.asarray(trunc_cov)[:, 0, 0],
                               rtol=0.2)


def test_lgssm_complete_gradient_unbiased_on_edge_window():
    true, ys = _lgssm_problem()
    B, S = 3, 8
    window, valid = _edge_window(ys, B, S, 77.0)
    weights = jnp.full((S,), 1.5, ys.dtype)
    exact, _ = jax.jit(lambda: lgssm.windowed_marginal_gradient(
        true, window, valid, weights, B, S))()
    g, ll = jax.jit(lambda k: lgssm.windowed_complete_gradient(
        true, window, valid, weights, B, S, k, num_samples=4096))(
        jax.random.PRNGKey(6))
    ev, _ = ravel_pytree(exact)
    gv, _ = ravel_pytree(g)
    assert np.isfinite(float(ll))
    err = float(jnp.linalg.norm(gv - ev) / (jnp.linalg.norm(ev) + 1e-12))
    assert err < 0.1, (np.asarray(gv), np.asarray(ev))


def test_ungated_ffbs_unchanged():
    """valid=None must reproduce the original draw stream bitwise."""
    true, ys = _lgssm_problem()
    key = jax.random.PRNGKey(11)
    a = kalman.ffbs_sample(key, ys, true.A, true.C, true.LQinv, true.LRinv,
                           lgssm.default_forward_message(true))
    b = kalman.ffbs_sample(key, ys, true.A, true.C, true.LQinv, true.LRinv,
                           lgssm.default_forward_message(true),
                           valid=jnp.ones((ys.shape[0],), ys.dtype))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
