"""Simplex (transition-matrix / Bernoulli) coordinate layer, pure functions.

Functional re-derivation of `/root/reference/sgmcmc_ssm/variables/
probweight.py`: the reference stores a stochastic matrix ``pi`` in one of
three interchangeable parameterizations selected by ``pi_type``
(`probweight.py:169-390`) —

* ``logit``     — rows of ``pi`` are softmax(logit_pi) (storage used by
  this framework's HMM parameter pytrees),
* ``expanded``  — nonnegative unnormalized weights, pi = e / sum(e)
  (`get_pi_func2`; projection takes abs, `probweight.py:213-219`),
* ``pi``        — the probabilities themselves.

Here each parameterization is a pair of pure maps (to/from probabilities)
plus the chain-rule transport of a gradient dL/dpi into that coordinate,
and the Dirichlet prior pieces (`TransitionMatrixPriorHelper`,
`probweight.py:392-491`) in every coordinate.  Bernoulli helpers mirror
`probweight.py:17-166` for scalar success probabilities.

Everything is row-wise vectorized and jittable; models that want a
different storage use these maps at their parameter boundary instead of
switching class machinery at runtime.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Transition-matrix coordinates
# --------------------------------------------------------------------------


def pi_from_logit(logit_pi: jax.Array) -> jax.Array:
    """Rows of pi = softmax(logit_pi) (`get_pi_func2`, logit branch)."""
    return jax.nn.softmax(logit_pi, axis=-1)


def logit_from_pi(pi: jax.Array) -> jax.Array:
    """Centered row-wise log (`probweight.py:419`: log(pi + 1e-99); the
    mean-centering matches the reference's logit projection
    `probweight.py:208-212`)."""
    lp = jnp.log(pi + 1e-99)
    return lp - jnp.mean(lp, axis=-1, keepdims=True)


def pi_from_expanded(expanded_pi: jax.Array) -> jax.Array:
    """pi = |e| / sum(|e|) (`get_pi_func2` expanded branch with the abs
    projection of `probweight.py:213-216`)."""
    e = jnp.abs(expanded_pi)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def expanded_from_pi(pi: jax.Array) -> jax.Array:
    """The identity embedding (`set_expanded_pi_func`)."""
    return pi


def project_logit(logit_pi: jax.Array, center: bool = True) -> jax.Array:
    """Stability projection for the logit storage (`probweight.py:208-212`)."""
    if center:
        return logit_pi - jnp.mean(logit_pi, axis=-1, keepdims=True)
    return logit_pi


def project_expanded(expanded_pi: jax.Array, center: bool = False
                     ) -> jax.Array:
    """abs (+ optional row normalization) (`probweight.py:213-219`)."""
    e = jnp.abs(expanded_pi)
    if center:
        e = e / jnp.sum(e, axis=-1, keepdims=True)
    return e


def grad_logit_from_grad_pi(grad_pi: jax.Array, pi: jax.Array) -> jax.Array:
    """Transport dL/dpi into the logit coordinate.

    d logit softmax chain rule: g_logit = pi * (g_pi - sum_j g_pi_j pi_j)
    per row — the same algebra as `hmm.grad_logit_pi` applied to a raw
    pi-gradient instead of expected counts.
    """
    inner = jnp.sum(grad_pi * pi, axis=-1, keepdims=True)
    return pi * (grad_pi - inner)


def grad_expanded_from_grad_pi(grad_pi: jax.Array, expanded_pi: jax.Array
                               ) -> jax.Array:
    """Transport dL/dpi into the expanded coordinate with the reference's
    expanded-mean metric (`probweight.py:455-470`): the returned quantity
    is e_j * (e_j * dL/de_j), i.e. the Euclidean gradient dL/de scaled by
    e^2 — the mirror-descent/expanded-natural convention the reference's
    SGLD steps use for this storage.
    """
    e = jnp.abs(expanded_pi)
    s = jnp.sum(e, axis=-1, keepdims=True)
    pi = e / s
    inner = jnp.sum(grad_pi * pi, axis=-1, keepdims=True)
    # e * dL/de = pi * (g - <g, pi>) evaluated at e; times e once more
    return e * pi * (grad_pi - inner)


# --------------------------------------------------------------------------
# Dirichlet prior on rows of pi (`TransitionMatrixPriorHelper`)
# --------------------------------------------------------------------------


def dirichlet_logprior(pi: jax.Array, alpha: jax.Array) -> jax.Array:
    """sum_k log Dirichlet(pi_k | alpha_k) (`probweight.py:441-446`)."""
    lgamma = jax.scipy.special.gammaln
    lognorm = jnp.sum(lgamma(alpha), axis=-1) - lgamma(
        jnp.sum(alpha, axis=-1))
    return jnp.sum(jnp.sum((alpha - 1.0) * jnp.log(pi + 1e-16), axis=-1)
                   - lognorm)


def dirichlet_grad_logit(pi: jax.Array, alpha: jax.Array,
                         use_scir: bool = False) -> jax.Array:
    """Dirichlet grad_logprior in the logit coordinate
    (`probweight.py:448-473`): with ``use_scir`` the raw sufficient
    statistic alpha (for the SCIR exact Gamma update)."""
    if use_scir:
        return alpha
    return (alpha - 1.0) - pi * jnp.sum(alpha - 1.0, axis=-1, keepdims=True)


def dirichlet_grad_expanded(expanded_pi: jax.Array, alpha: jax.Array,
                            use_scir: bool = False) -> jax.Array:
    """Dirichlet grad_logprior in the expanded coordinate
    (`probweight.py:462-470`)."""
    if use_scir:
        return alpha
    e = jnp.abs(expanded_pi)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return ((alpha - 1.0) - e * jnp.sum(alpha - 1.0, axis=-1,
                                        keepdims=True) / s) * e


def dirichlet_sample(key, alpha: jax.Array) -> jax.Array:
    """Row-wise Dirichlet draws (`sample_prior`, `probweight.py:414-424`)."""
    g = jax.random.gamma(key, alpha)
    return g / jnp.sum(g, axis=-1, keepdims=True)


def dirichlet_posterior_sample(key, alpha: jax.Array,
                               counts: jax.Array) -> jax.Array:
    """Conjugate posterior draw given expected transition counts
    (`sample_posterior`, `probweight.py:427-439`)."""
    return dirichlet_sample(key, alpha + counts)


# --------------------------------------------------------------------------
# Bernoulli helpers (`probweight.py:17-166`)
# --------------------------------------------------------------------------


def prob_from_logit(logit_p: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(logit_p)


def logit_from_prob(p: jax.Array) -> jax.Array:
    return jnp.log(p + 1e-99) - jnp.log1p(-p + 1e-99)


def grad_logit_from_grad_prob(grad_p: jax.Array, p: jax.Array) -> jax.Array:
    """Chain rule through the sigmoid: g_logit = g_p * p * (1 - p)."""
    return grad_p * p * (1.0 - p)


def beta_logprior(p: jax.Array, a, b) -> jax.Array:
    """log Beta(p | a, b) up to the constant the reference also keeps
    (`BernoulliParamHelper` prior pieces)."""
    lgamma = jax.scipy.special.gammaln
    lognorm = lgamma(a) + lgamma(b) - lgamma(a + b)
    return jnp.sum((a - 1.0) * jnp.log(p + 1e-16)
                   + (b - 1.0) * jnp.log1p(-p + 1e-16) - lognorm)


def beta_grad_logit(logit_p: jax.Array, a, b) -> jax.Array:
    """d/d logit of log Beta(sigmoid(logit) | a, b):
    (a - 1)(1 - p) - (b - 1) p."""
    p = jax.nn.sigmoid(logit_p)
    return (a - 1.0) * (1.0 - p) - (b - 1.0) * p
