"""Distribution log-pdfs and samplers used by priors and kernels.

JAX rewrites of the reference's scipy-backed helpers
(`/root/reference/sgmcmc_ssm/_utils.py:1-87`): stable Gaussian / matrix-normal
log-densities in Cholesky-of-precision form, plus Wishart (Bartlett), inverse
gamma, and Beta sampling with explicit PRNG keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


def normal_logpdf(x: jax.Array, mean: jax.Array, Lprec: jax.Array) -> jax.Array:
    """N(x; mean, (Lprec Lprec^T)^-1) log density, Lprec lower-triangular.

    Matches `_utils.py:60-76` (which parameterizes by Lprec = chol(precision)).
    """
    diff = x - mean
    z = diff @ Lprec  # (Lprec^T diff) for symmetric quadratic form
    n = x.shape[-1]
    logdet_half = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lprec, axis1=-2, axis2=-1))), axis=-1)
    return -0.5 * n * _LOG_2PI + logdet_half - 0.5 * jnp.sum(z * z, axis=-1)


def scalar_normal_logpdf(x: jax.Array, mean: jax.Array, Lprec: jax.Array) -> jax.Array:
    """Scalar N(x; mean, Lprec^-2) log density."""
    diff = (x - mean) * Lprec
    return -0.5 * _LOG_2PI + jnp.log(jnp.abs(Lprec)) - 0.5 * diff * diff


def matrix_normal_logpdf(X: jax.Array, mean: jax.Array,
                         Lrowprec: jax.Array, Lcolprec: jax.Array) -> jax.Array:
    """Matrix-normal log density with Cholesky row/col precisions.

    MN(X; M, U, V) with U^-1 = Lrowprec Lrowprec^T, V^-1 = Lcolprec Lcolprec^T,
    matching `_utils.py:33-59`.
    """
    n, m = X.shape[-2], X.shape[-1]
    logdet_row = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lrowprec, axis1=-2, axis2=-1))), axis=-1)
    logdet_col = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lcolprec, axis1=-2, axis2=-1))), axis=-1)
    Z = jnp.swapaxes(Lrowprec, -1, -2) @ (X - mean) @ Lcolprec
    return (-0.5 * n * m * _LOG_2PI + m * logdet_row + n * logdet_col
            - 0.5 * jnp.sum(Z * Z, axis=(-2, -1)))


def sample_wishart(key: jax.Array, df: float, scale: jax.Array) -> jax.Array:
    """Wishart(df, scale) sample via the Bartlett decomposition.

    Replaces `scipy.stats.wishart.rvs` (`_utils.py:8-19`) with a jittable
    construction: W = L A A^T L^T with L = chol(scale), A lower-triangular,
    diag(A)_i^2 ~ chi2(df - i), offdiag ~ N(0, 1).
    """
    n = scale.shape[-1]
    key_diag, key_off = jax.random.split(key)
    df = jnp.asarray(df, dtype=scale.dtype)
    i = jnp.arange(n, dtype=scale.dtype)
    # chi2(k) == Gamma(k/2, scale=2)
    chi2 = 2.0 * jax.random.gamma(key_diag, (df - i) / 2.0, dtype=scale.dtype)
    A = jnp.zeros((n, n), dtype=scale.dtype)
    rows, cols = np.tril_indices(n, -1)
    if len(rows):
        off = jax.random.normal(key_off, (len(rows),), dtype=scale.dtype)
        A = A.at[rows, cols].set(off)
    A = A.at[jnp.arange(n), jnp.arange(n)].set(jnp.sqrt(chi2))
    L = jnp.linalg.cholesky(scale)
    LA = L @ A
    return LA @ LA.T


def sample_invwishart(key: jax.Array, df: float, scale: jax.Array) -> jax.Array:
    """Inverse-Wishart(df, scale): inv(Wishart(df, inv(scale)))."""
    W = sample_wishart(key, df, jnp.linalg.inv(scale))
    return jnp.linalg.inv(W)


def sample_invgamma(key: jax.Array, shape: float, scale: float,
                    dtype=jnp.float32) -> jax.Array:
    """InvGamma(shape, scale) sample (`_utils.py:21-31`)."""
    g = jax.random.gamma(key, jnp.asarray(shape, dtype), dtype=dtype)
    return jnp.asarray(scale, dtype) / g


def sample_beta(key: jax.Array, a: float, b: float, dtype=jnp.float32) -> jax.Array:
    """Beta(a, b) sample via two gammas."""
    k1, k2 = jax.random.split(key)
    x = jax.random.gamma(k1, jnp.asarray(a, dtype), dtype=dtype)
    y = jax.random.gamma(k2, jnp.asarray(b, dtype), dtype=dtype)
    return x / (x + y)


def wishart_logpdf(X: jax.Array, df: float, scale: jax.Array) -> jax.Array:
    """log pdf of Wishart(df, scale) at X."""
    n = X.shape[-1]
    df = jnp.asarray(df, dtype=X.dtype)
    scale_inv = jnp.linalg.inv(scale)
    _, logdet_X = jnp.linalg.slogdet(X)
    _, logdet_S = jnp.linalg.slogdet(scale)
    i = jnp.arange(1, n + 1, dtype=X.dtype)
    log_mgamma = (n * (n - 1) / 4.0) * jnp.log(jnp.pi) + jnp.sum(
        jax.scipy.special.gammaln((df + 1 - i) / 2.0))
    return (0.5 * (df - n - 1) * logdet_X
            - 0.5 * jnp.trace(scale_inv @ X)
            - 0.5 * df * n * jnp.log(2.0)
            - 0.5 * df * logdet_S
            - log_mgamma)


def invgamma_logpdf(x: jax.Array, shape: float, scale: float) -> jax.Array:
    """log pdf of InvGamma(shape, scale) at x."""
    shape = jnp.asarray(shape, dtype=x.dtype)
    scale = jnp.asarray(scale, dtype=x.dtype)
    return (shape * jnp.log(scale) - jax.scipy.special.gammaln(shape)
            - (shape + 1.0) * jnp.log(x) - scale / x)


def beta_logpdf(x: jax.Array, a: float, b: float) -> jax.Array:
    """log pdf of Beta(a, b) at x."""
    a = jnp.asarray(a, dtype=x.dtype)
    b = jnp.asarray(b, dtype=x.dtype)
    return ((a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x)
            - jax.scipy.special.betaln(a, b))
