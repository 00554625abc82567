"""Discrete-state (HMM) message passing as `lax.scan`.

Rewrite of the reference's `HMMHelper` recursions
(`/root/reference/sgmcmc_ssm/models/hmm_helper.py:36-300`): forward/backward
normalized probability messages with weighted log-constants, the marginal
likelihood, posterior marginals/pairwise marginals for the gradient, FFBS
latent sampling, and predictive likelihood.  All functions take the
per-step emission log-likelihood matrix ``logP [T, K]`` (model-agnostic).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class HMMMessage(NamedTuple):
    prob: jax.Array           # [K] (forward: filtered probs;
    #                           backward: normalized likelihood vector)
    log_constant: jax.Array   # scalar


def default_forward_message(K: int, dtype=jnp.float64) -> HMMMessage:
    return HMMMessage(jnp.full((K,), 1.0 / K, dtype), jnp.zeros((), dtype))


def default_backward_message(K: int, dtype=jnp.float64) -> HMMMessage:
    return HMMMessage(jnp.full((K,), 1.0 / K, dtype),
                      jnp.log(jnp.asarray(float(K), dtype)))


def forward_messages(logP: jax.Array, Pi: jax.Array,
                     init: HMMMessage, weights=None, valid=None):
    """All filtered messages; leading axis T+1 (element 0 = init).

    Matches `_forward_messages` (`hmm_helper.py:36-74`).  ``valid`` gates
    steps (invalid steps pass the message through unchanged).
    """
    T, K = logP.shape
    dtype = logP.dtype
    if weights is None:
        weights = jnp.ones((T,), dtype)
    if valid is None:
        valid = jnp.ones((T,), dtype)

    def step(prob, inp):
        logP_t, w, v = inp
        m = jnp.max(logP_t)
        P_t = jnp.exp(logP_t - m)
        p = (prob @ Pi) * P_t
        s = jnp.sum(p)
        log_c = v * w * (m + jnp.log(s))
        p = v * (p / s) + (1.0 - v) * prob
        return p, (p, log_c)

    _, (probs, log_cs) = jax.lax.scan(step, init.prob,
                                      (logP, weights, valid))
    log_constants = init.log_constant + jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.cumsum(log_cs)])
    probs = jnp.concatenate([init.prob[None], probs])
    return HMMMessage(probs, log_constants)


def backward_messages(logP: jax.Array, Pi: jax.Array,
                      init: HMMMessage, weights=None, valid=None):
    """All backward messages; element [t] has consumed y_t..y_{T-1}
    (`hmm_helper.py:76-115`)."""
    T, K = logP.shape
    dtype = logP.dtype
    if weights is None:
        weights = jnp.ones((T,), dtype)
    if valid is None:
        valid = jnp.ones((T,), dtype)

    def step(prob, inp):
        logP_t, w, v = inp
        m = jnp.max(logP_t)
        P_t = jnp.exp(logP_t - m)
        p = Pi @ (P_t * prob)
        s = jnp.sum(p)
        log_c = v * w * (m + jnp.log(s))
        p = v * (p / s) + (1.0 - v) * prob
        return p, (p, log_c)

    _, (probs, log_cs) = jax.lax.scan(step, init.prob,
                                      (logP[::-1], weights[::-1],
                                       valid[::-1]))
    log_constants = init.log_constant + jnp.concatenate(
        [jnp.cumsum(log_cs)[::-1], jnp.zeros((1,), dtype)])
    probs = jnp.concatenate([probs[::-1], init.prob[None]])
    return HMMMessage(probs, log_constants)


def parallel_forward_messages(logP: jax.Array, Pi: jax.Array,
                              init: HMMMessage) -> HMMMessage:
    """O(log T)-depth forward filtering via associative prefix products.

    The forward recursion p_t ∝ (p_{t-1} @ Pi) ⊙ P_t is a product of
    per-step K x K matrices M_t = Pi ⊙ row(P_t), so
    `jax.lax.associative_scan` over normalized (M, log_scale) pairs
    evaluates all filtered messages in log depth — the discrete-state
    twin of `ops/kalman_parallel.py`, for the full-data HMM passes
    (exact gradients, KSD scores, offline eval).  Matches
    `forward_messages` (unweighted, all-valid) to numerical precision.
    """
    T, K = logP.shape
    dtype = logP.dtype
    m = jnp.max(logP, axis=1)                          # [T]
    Pt = jnp.exp(logP - m[:, None])                    # [T, K]
    M = Pi[None] * Pt[:, None, :]                      # [T, K, K]
    s = jnp.sum(jnp.sum(M, axis=-1), axis=-1)          # [T]
    Mn = M / s[:, None, None]
    logc = m + jnp.log(s)

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        P = Ma @ Mb
        sp = jnp.sum(jnp.sum(P, axis=-1), axis=-1)
        return (P / sp[..., None, None], ca + cb + jnp.log(sp))

    Mpre, cpre = jax.lax.associative_scan(combine, (Mn, logc))
    p_unnorm = jnp.einsum('k,tkj->tj', init.prob, Mpre)
    norm = jnp.sum(p_unnorm, axis=1)
    probs = jnp.concatenate([init.prob[None], p_unnorm / norm[:, None]])
    log_constants = jnp.concatenate(
        [jnp.zeros((1,), dtype), cpre + jnp.log(norm)]) + init.log_constant
    return HMMMessage(probs, log_constants)


def parallel_marginal_loglikelihood(logP, Pi, forward_msg: HMMMessage,
                                    backward_msg: HMMMessage) -> jax.Array:
    """Full-data marginal loglikelihood from the parallel forward filter
    (unweighted; the buffered/weighted estimators keep the sequential
    scan)."""
    fwd = parallel_forward_messages(logP, Pi, forward_msg)
    lik = fwd.prob[-1] @ backward_msg.prob
    return (fwd.log_constant[-1] + jnp.log(lik)
            + backward_msg.log_constant)


def marginal_loglikelihood(logP, Pi, forward_msg: HMMMessage,
                           backward_msg: HMMMessage, weights=None,
                           valid=None):
    """`marginal_loglikelihood` (`hmm_helper.py:117-142`).  ``valid``
    gates steps for fixed-shape padded sequences."""
    fwd = forward_messages(logP, Pi, forward_msg, weights, valid)
    last = HMMMessage(fwd.prob[-1], fwd.log_constant[-1])
    lik = last.prob @ backward_msg.prob
    w_last = 1.0 if weights is None else weights[-1]
    return last.log_constant + w_last * (jnp.log(lik)
                                         + backward_msg.log_constant)


def posterior_marginals(logP, Pi, forward_msg, backward_msg, valid=None):
    """Pairwise and singleton smoothed posteriors for every t.

    joint[t] = Pr(z_{t-1}, z_t | y) (normalized [K, K]),
    marg[t] = Pr(z_t | y) [K] — the quantities driving the gradient
    (`gauss_hmm/helper.py:175-195`).  With ``valid``, invalid steps pass
    messages through (their rows are garbage but must be weight-gated by
    the caller).
    """
    fwd = forward_messages(logP, Pi, forward_msg, valid=valid)
    bwd = backward_messages(logP, Pi, backward_msg, valid=valid)
    r = fwd.prob[:-1]                                  # [T, K]
    q = bwd.prob[1:]                                   # [T, K]
    m = jnp.max(logP, axis=-1, keepdims=True)
    P = jnp.exp(logP - m)                              # [T, K]
    joint = r[:, :, None] * Pi[None, :, :] * (P * q)[:, None, :]
    joint = joint / jnp.sum(joint, axis=(1, 2), keepdims=True)
    marg = jnp.sum(joint, axis=1)                      # [T, K]
    return joint, marg


def latent_var_distr(logP, Pi, forward_msg, backward_msg, lag=None):
    """Pr(z_t | y_{<= t+lag}) (`hmm_helper.py:200-273` latent_var_distr).

    ``lag=None`` smoothed (log-space fusion, `hmm_helper.py:214-224`);
    ``lag=0`` filtered; ``lag<0`` the filtered distribution at t+lag
    propagated ``-lag`` steps through Pi (prediction); ``lag>0`` fixed-lag
    smoothing via validity-masked backward windows over y_{t+1..t+lag}
    (fixed shapes under jit, like the LGSSM's `kalman.lagged_moments`).
    The lag origin matches this framework's LGSSM convention — lag=0 is
    the *filtered* p(z_t | y_{<=t}); the reference's indexing is shifted
    one observation earlier.
    """
    T, K = logP.shape
    fwd = forward_messages(logP, Pi, forward_msg)
    if lag is None:
        bwd = backward_messages(logP, Pi, backward_msg)
        logp = jnp.log(fwd.prob[1:] + 1e-300) + jnp.log(bwd.prob[1:]
                                                        + 1e-300)
        logp = logp - jnp.max(logp, axis=-1, keepdims=True)
        p = jnp.exp(logp)
        return p / jnp.sum(p, axis=-1, keepdims=True)
    lag = int(lag)
    if lag == 0:
        return fwd.prob[1:]
    if lag < 0:
        idx = jnp.clip(jnp.arange(T) + 1 + lag, 0, T)
        base = fwd.prob[idx]                              # [T, K]
        for _ in range(-lag):
            base = base @ Pi
        return base / jnp.sum(base, axis=-1, keepdims=True)

    # fixed-lag: filtered_t * P(y_{t+1..t+lag} | z_t), windows masked at
    # the end of the sequence
    t_idx = jnp.arange(T)[:, None] + 1 + jnp.arange(lag)[None, :]  # [T, lag]
    valid = (t_idx < T).astype(logP.dtype)
    win_logP = logP[jnp.clip(t_idx, 0, T - 1)]            # [T, lag, K]

    def one_window(wlogP, v):
        msg = backward_messages(wlogP, Pi, backward_msg, valid=v)
        return msg.prob[0]

    bprob = jax.vmap(one_window)(win_logP, valid)         # [T, K]
    logp = jnp.log(fwd.prob[1:] + 1e-300) + jnp.log(bprob + 1e-300)
    logp = logp - jnp.max(logp, axis=-1, keepdims=True)
    p = jnp.exp(logp)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def latent_var_sample(key, logP, Pi, forward_msg, backward_msg, valid=None):
    """Joint FFBS sample of z_{0:T-1} (`hmm_helper.py:269-328`), via a
    forward scan over the backward messages.

    ``valid`` gates rows with the same truncated-window semantics as the
    message passes: an invalid row is transparent — no transition or
    emission is applied across it, and its returned z is a copy of the
    neighbouring valid draw (a placeholder; callers must not condition on
    it).  The first *valid* row uses the init-message prior, exactly as
    row 0 does in the ungated case.
    """
    T, K = logP.shape
    bwd = backward_messages(logP, Pi, backward_msg, valid=valid)
    m = jnp.max(logP, axis=-1, keepdims=True)
    P = jnp.exp(logP - m)
    if valid is None:
        valid = jnp.ones((T,), logP.dtype)

    keys = jax.random.split(key, T)

    def step(carry, inp):
        z_prev, started = carry
        k, P_t, q_t, v = inp
        prior = jnp.where(started, Pi[z_prev], forward_msg.prob @ Pi)
        post = prior * jnp.where(v > 0, P_t, jnp.ones_like(P_t)) * q_t
        z = jax.random.categorical(k, jnp.log(post + 1e-300)).astype(
            jnp.int32)
        z = jnp.where(v > 0, z, z_prev)
        return (z, started | (v > 0)), z

    (_, _), zs = jax.lax.scan(
        step, (jnp.zeros((), jnp.int32), jnp.zeros((), bool)),
        (keys, P, bwd.prob[1:], valid))
    # invalid prefix rows copy the first valid draw (backward fill)
    def back(z_next, inp):
        z, v = inp
        z = jnp.where(v > 0, z, z_next)
        return z, z

    _, zs = jax.lax.scan(back, zs[-1], (zs, valid), reverse=True)
    return zs


def predictive_loglikelihood(logP, Pi, forward_msg, lag: int = 1):
    """Sum_t log p(y_t | y_{<=t-lag}) (`hmm_helper.py:144-174`)."""
    T, K = logP.shape
    obs_f = logP if lag == 0 else logP[:T - lag]
    fwd = forward_messages(obs_f, Pi, forward_msg)
    prob = fwd.prob[1:]
    Pi_lag = jnp.linalg.matrix_power(Pi, lag) if lag > 0 else jnp.eye(
        K, dtype=Pi.dtype)
    pred = prob @ Pi_lag                               # [T', K]
    m = jnp.max(logP, axis=-1)
    P = jnp.exp(logP - m[:, None])
    if lag == 0:
        lik = jnp.sum(pred * P, axis=-1)
        return jnp.sum(jnp.log(lik) + m)
    lik = jnp.sum(pred * P[lag:], axis=-1)
    return jnp.sum(jnp.log(lik) + m[lag:])


def grad_logit_pi(joint_sum: jax.Array, Pi: jax.Array) -> jax.Array:
    """Gradient of the marginal loglik wrt logit_pi given summed pairwise
    posteriors (`gauss_hmm/helper.py:206-210`):
    grad = sum_t joint_t - diag(row-sums) Pi."""
    return joint_sum - jnp.diag(jnp.sum(joint_sum, axis=1)) @ Pi


def dirichlet_grad_logit_pi(alpha: jax.Array, pi: jax.Array) -> jax.Array:
    """Dirichlet prior score in logit coordinates
    (`probweight.py:448-462`): (alpha-1) - pi * rowsum(alpha-1)."""
    a1 = alpha - 1.0
    return a1 - pi * jnp.sum(a1, axis=-1, keepdims=True)


def sample_noncentral_chi2(key, df, nonc, dtype=jnp.float64):
    """NoncentralChi2(df, nonc) via the Poisson-mixture representation:
    X ~ chi2(df + 2 J), J ~ Poisson(nonc / 2) — jittable replacement for
    `np.random.noncentral_chisquare` (`hmm_helper.py:428-431`)."""
    k1, k2 = jax.random.split(key)
    J = jax.random.poisson(k1, nonc / 2.0)
    shape = (df + 2.0 * J.astype(dtype)) / 2.0
    return 2.0 * jax.random.gamma(k2, shape, dtype=dtype)


def scir_update(key, theta: jax.Array, a: jax.Array, epsilon: float):
    """Stochastic Cox-Ingersoll-Ross exact Gamma-process update for
    simplex variables (Baker et al. 2018; `hmm_helper.py:406-442`):

    W ~ NoncentralChi2(2 a, 2 theta e^-eps / (1 - e^-eps)),
    theta' = (1 - e^-eps) W / 2.
    """
    decay = jnp.exp(-epsilon)
    W = sample_noncentral_chi2(key, 2.0 * a,
                               2.0 * theta * decay / (1.0 - decay),
                               theta.dtype)
    return 0.5 * (1.0 - decay) * W + 1e-99
