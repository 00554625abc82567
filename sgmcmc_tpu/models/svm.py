"""Stochastic-volatility model (SVM), TPU-native.

x_t = A x_{t-1} + N(0, Q),   y_t ~ N(0, exp(x_t) * R)

Functional rewrite of `/root/reference/sgmcmc_ssm/models/svm/` — parameters
are a frozen pytree in the reference's coordinates (A, packed Cholesky of the
precisions LQinv_vec / LRinv_vec, `svm/parameters.py:19-61`), the bootstrap
prior kernel is a pure propose/reweight pair (`svm/kernels.py:5-64`), and the
Fisher-identity additive score is `svm_complete_data_loglike_gradient`
(`svm/helper.py:297-350`).  The model is scalar (n = m = 1) like every
reference experiment; latent particles have shape [N, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.distributions import (beta_logpdf, matrix_normal_logpdf,
                                   sample_beta, sample_wishart,
                                   wishart_logpdf)
from ..utils.linalg import tril_vector_to_mat
from .base import ParticleKernel

_LOG_2PI = 1.8378770664093453


@struct.dataclass
class SVMParams:
    """SVM parameter pytree (reference coordinates)."""
    A: jax.Array            # (1, 1) AR coefficient
    LQinv_vec: jax.Array    # (1,) chol(Q^-1)
    LRinv_vec: jax.Array    # (1,) chol(R^-1)

    # Derived quantities (scalar views) ------------------------------------
    @property
    def a(self):
        return self.A[0, 0]

    @property
    def lqinv(self):
        return self.LQinv_vec[0]

    @property
    def lrinv(self):
        return self.LRinv_vec[0]

    @property
    def qinv(self):
        return self.lqinv ** 2

    @property
    def rinv(self):
        return self.lrinv ** 2

    @property
    def Q(self):
        return 1.0 / self.qinv

    @property
    def R(self):
        return 1.0 / self.rinv

    # Reference aliases phi / sigma / tau (`svm/parameters.py:42-61`)
    @property
    def phi(self):
        return self.a

    @property
    def sigma(self):
        return 1.0 / jnp.abs(self.lqinv)

    @property
    def tau(self):
        return 1.0 / jnp.abs(self.lrinv)


def from_scalars(A: float, Q: float, R: float, dtype=jnp.float32) -> SVMParams:
    """Build params from natural (A, Q, R) scalars."""
    return SVMParams(
        A=jnp.full((1, 1), A, dtype),
        LQinv_vec=jnp.full((1,), Q ** -0.5, dtype),
        LRinv_vec=jnp.full((1,), R ** -0.5, dtype),
    )


def stationary_variance(params: SVMParams) -> jax.Array:
    """Stationary variance Q / (1 - A^2) of the latent AR(1)."""
    return params.Q / (1.0 - params.a ** 2)


# --------------------------------------------------------------------------
# Particle kernel (bootstrap / prior), `svm/kernels.py:5-64`
# --------------------------------------------------------------------------

def _sample_x0(params: SVMParams, key, n_particles, prior_mean, prior_var):
    z = jax.random.normal(key, (n_particles, 1), dtype=params.A.dtype)
    return prior_mean + jnp.sqrt(prior_var) * z


def _propose(params: SVMParams, key, x_t, y_next):
    z = jax.random.normal(key, x_t.shape, dtype=x_t.dtype)
    return params.a * x_t + z / params.lqinv


def _reweight(params: SVMParams, x_t, x_next, y_next):
    """log Pr(y_{t+1} | x_{t+1}) for emission N(0, exp(x) R)."""
    x = x_next[:, 0]
    return (-0.5 * _LOG_2PI
            - 0.5 * (y_next[0] ** 2) * jnp.exp(-x) * params.rinv
            + jnp.log(jnp.abs(params.lrinv))
            - 0.5 * x)


def _prior_log_density(params: SVMParams, x_t, x_next):
    diff = (x_next[..., 0] - params.a * x_t[..., 0])
    return (-0.5 * diff * diff * params.qinv
            - 0.5 * _LOG_2PI + jnp.log(jnp.abs(params.lqinv)))


def _prior_log_density_max(params: SVMParams):
    return -0.5 * _LOG_2PI + jnp.log(jnp.abs(params.lqinv))


KERNEL = ParticleKernel(
    sample_x0=_sample_x0,
    propose=_propose,
    reweight=_reweight,
    prior_log_density=_prior_log_density,
    prior_log_density_max=_prior_log_density_max,
    state_dim=1,
)


def get_kernel(name: str | None = None) -> ParticleKernel:
    """Kernel selection (`svm/helper.py:56-65`): only 'prior' is analytic."""
    if name in (None, "prior"):
        return KERNEL
    raise ValueError(f"Unrecognized SVM kernel '{name}'")


# --------------------------------------------------------------------------
# Additive statistics (Fisher-identity score), `svm/helper.py:297-350`
# --------------------------------------------------------------------------

STATISTIC_DIM = 3  # [grad_LRinv, grad_LQinv, grad_A]


def grad_statistic(params: SVMParams, x_t, x_next, y_next, t):
    """Per-particle gradient of log Pr(y', x' | x, theta), [N, 3]."""
    x0 = x_t[:, 0]
    x1 = x_next[:, 0]
    diff_x = x1 - params.a * x0
    grad_A = params.qinv * diff_x * x0
    grad_LQinv = 1.0 / params.lqinv - diff_x * diff_x * params.lqinv
    diff_y2 = (y_next[0] ** 2) * jnp.exp(-x1)
    grad_LRinv = 1.0 / params.lrinv - diff_y2 * params.lrinv
    return jnp.stack([grad_LRinv, grad_LQinv, grad_A], axis=-1)


def suff_statistic(params: SVMParams, x_t, x_next, y_next, t):
    """(x', x'^2, x x') Gaussian sufficient stats (`lgssm/helper.py:1338`)."""
    x0 = x_t[:, 0]
    x1 = x_next[:, 0]
    return jnp.stack([x1, x1 * x1, x0 * x1], axis=-1)


def unpack_grad(stat: jax.Array) -> SVMParams:
    """Score vector [3] -> gradient pytree (`svm/helper.py:121-126`)."""
    return SVMParams(
        A=stat[2].reshape(1, 1),
        LQinv_vec=stat[1].reshape(1),
        LRinv_vec=stat[0].reshape(1),
    )


# --------------------------------------------------------------------------
# Prior, `svm/parameters.py:63-73` (Wishart on Qinv/Rinv, matrix-normal on A)
# --------------------------------------------------------------------------

@struct.dataclass
class SVMPrior:
    """Hyperparameters (`CovariancePriorHelper`/`SquareMatrixPriorHelper`)."""
    mean_A: jax.Array        # (1, 1)
    var_col_A: jax.Array     # (1,)
    scale_Qinv: jax.Array    # (1, 1)
    df_Qinv: jax.Array       # ()
    scale_Rinv: jax.Array    # (1, 1)
    df_Rinv: jax.Array       # ()


def default_prior(var: float = 100.0, dtype=jnp.float32) -> SVMPrior:
    """`generate_default_prior` semantics (`base_parameters.py:207-213`,
    helper defaults `matrices.py` / `covariance.py:275-284`)."""
    df = 2.0 + 1.0 / var
    return SVMPrior(
        mean_A=jnp.zeros((1, 1), dtype),
        var_col_A=jnp.full((1,), var, dtype),
        scale_Qinv=jnp.full((1, 1), 1.0 / df, dtype),
        df_Qinv=jnp.asarray(df, dtype),
        scale_Rinv=jnp.full((1, 1), 1.0 / df, dtype),
        df_Rinv=jnp.asarray(df, dtype),
    )


def logprior(prior: SVMPrior, params: SVMParams) -> jax.Array:
    LQinv = tril_vector_to_mat(params.LQinv_vec)
    LRinv = tril_vector_to_mat(params.LRinv_vec)
    Qinv = LQinv @ LQinv.T
    Rinv = LRinv @ LRinv.T
    lp = wishart_logpdf(Qinv, prior.df_Qinv, prior.scale_Qinv)
    lp += wishart_logpdf(Rinv, prior.df_Rinv, prior.scale_Rinv)
    lp += matrix_normal_logpdf(
        params.A, prior.mean_A, Lrowprec=LQinv,
        Lcolprec=jnp.diag(prior.var_col_A ** -0.5))
    return lp


def grad_logprior(prior: SVMPrior, params: SVMParams) -> SVMParams:
    """Analytic prior score in the (A, LQinv_vec, LRinv_vec) coordinates.

    Matches `covariance.py:252-260` and `matrices.py:602-612` exactly —
    including the reference's convention that the matrix-normal prior on A
    contributes no gradient to LQinv (its row covariance is treated as
    constant), so this is the gradient of the *partial* logprior the
    reference samplers target.
    """
    lqinv, lrinv = params.lqinv, params.lrinv
    n = 1
    grad_LQinv = ((prior.df_Qinv - n - 1) / lqinv
                  - lqinv / prior.scale_Qinv[0, 0])
    grad_LRinv = ((prior.df_Rinv - n - 1) / lrinv
                  - lrinv / prior.scale_Rinv[0, 0])
    grad_A = -params.qinv * (params.A - prior.mean_A) / prior.var_col_A
    return SVMParams(A=grad_A,
                     LQinv_vec=grad_LQinv.reshape(1),
                     LRinv_vec=grad_LRinv.reshape(1))


def sample_prior(prior: SVMPrior, key) -> SVMParams:
    kq, kr, ka = jax.random.split(key, 3)
    Qinv = sample_wishart(kq, prior.df_Qinv, prior.scale_Qinv)
    Rinv = sample_wishart(kr, prior.df_Rinv, prior.scale_Rinv)
    lqinv = jnp.sqrt(Qinv[0, 0])
    lrinv = jnp.sqrt(Rinv[0, 0])
    # A | Q ~ MN(mean, Q, diag(var_col)) for the scalar case
    a_sd = jnp.sqrt(prior.var_col_A[0]) / lqinv
    A = prior.mean_A + a_sd * jax.random.normal(ka, (1, 1), lqinv.dtype)
    return SVMParams(A=A, LQinv_vec=lqinv.reshape(1),
                     LRinv_vec=lrinv.reshape(1))


# --------------------------------------------------------------------------
# Projection (`svm/parameters.py` via variable helpers)
# --------------------------------------------------------------------------

def project_parameters(params: SVMParams, a_threshold: float = 0.9999) -> SVMParams:
    """|A| <= threshold; reflect negative Cholesky diagonals
    (`matrices.py:465-478`, `covariance.py:64-81`)."""
    return SVMParams(
        A=jnp.clip(params.A, -a_threshold, a_threshold),
        LQinv_vec=jnp.abs(params.LQinv_vec),
        LRinv_vec=jnp.abs(params.LRinv_vec),
    )


# --------------------------------------------------------------------------
# Data generation (`svm/parameters.py:75-135`)
# --------------------------------------------------------------------------

def generate_data(key, params: SVMParams, T: int):
    """Simulate (observations [T, 1], latent [T, 1]) from the SVM."""
    k0, kx, ky = jax.random.split(key, 3)
    x0 = jnp.sqrt(stationary_variance(params)) * jax.random.normal(
        k0, (), dtype=params.A.dtype)
    zx = jax.random.normal(kx, (T,), dtype=params.A.dtype)
    zy = jax.random.normal(ky, (T,), dtype=params.A.dtype)

    def body(x_prev, z):
        zx_t, zy_t = z
        x = params.a * x_prev + jnp.sqrt(params.Q) * zx_t
        y = jnp.exp(0.5 * x) * jnp.sqrt(params.R) * zy_t
        return x, (x, y)

    _, (xs, ys) = jax.lax.scan(body, x0, (zx, zy))
    return ys[:, None], xs[:, None]
