"""Uniform model adapter: one object per model family for generic code.

Samplers, evaluators, and drivers program against this adapter instead of
the individual model modules — the functional analogue of the reference's
`SGMCMCHelper` contract (`sgmcmc_sampler.py:1427-1967`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from . import garch as garch_mod
from . import lgssm as lgssm_mod
from . import svm as svm_mod


@dataclasses.dataclass(frozen=True)
class ModelAPI:
    name: str
    get_kernel: Callable
    grad_statistic: Callable
    suff_statistic: Callable
    grad_statistic_dim: int
    suff_statistic_dim: int
    unpack_grad: Callable        # stat vector -> params-pytree gradient
    default_prior: Callable
    logprior: Callable           # (prior, params) -> scalar
    grad_logprior: Callable      # (prior, params) -> params pytree
    sample_prior: Callable       # (prior, key) -> params
    project_parameters: Callable
    generate_data: Callable      # (key, params, T) -> (ys, xs)
    prior_mean_var: Callable     # params -> (prior_mean, prior_var) for x0
    # optional exact oracle (LGSSM only)
    has_exact: bool = False
    marginal_loglikelihood: Callable | None = None
    gradient_marginal_loglikelihood: Callable | None = None
    # optional SGRLD preconditioner triple
    precondition: Callable | None = None
    precondition_noise: Callable | None = None
    correction_term: Callable | None = None

    def __hash__(self):
        return hash(self.name)


SVM = ModelAPI(
    name="svm",
    get_kernel=svm_mod.get_kernel,
    grad_statistic=svm_mod.grad_statistic,
    suff_statistic=svm_mod.suff_statistic,
    grad_statistic_dim=svm_mod.STATISTIC_DIM,
    suff_statistic_dim=3,
    unpack_grad=svm_mod.unpack_grad,
    default_prior=svm_mod.default_prior,
    logprior=svm_mod.logprior,
    grad_logprior=svm_mod.grad_logprior,
    sample_prior=svm_mod.sample_prior,
    project_parameters=svm_mod.project_parameters,
    generate_data=svm_mod.generate_data,
    prior_mean_var=lambda p: (0.0, svm_mod.stationary_variance(p)),
)

GARCH = ModelAPI(
    name="garch",
    get_kernel=garch_mod.get_kernel,
    grad_statistic=garch_mod.grad_statistic,
    suff_statistic=garch_mod.suff_statistic,
    grad_statistic_dim=garch_mod.STATISTIC_DIM,
    suff_statistic_dim=3,
    unpack_grad=garch_mod.unpack_grad,
    default_prior=garch_mod.default_prior,
    logprior=garch_mod.logprior,
    grad_logprior=garch_mod.grad_logprior,
    sample_prior=garch_mod.sample_prior,
    project_parameters=garch_mod.project_parameters,
    generate_data=garch_mod.generate_data,
    prior_mean_var=lambda p: (0.0, garch_mod.stationary_variance(p)),
)


def _lgssm_api(n: int = 1, m: int = 1) -> ModelAPI:
    dim = lgssm_mod.statistic_dim(n, m)
    return ModelAPI(
        name=f"lgssm_{n}_{m}",
        get_kernel=lgssm_mod.get_kernel,
        grad_statistic=lgssm_mod.grad_statistic,
        suff_statistic=lgssm_mod.suff_statistic,
        grad_statistic_dim=dim,
        suff_statistic_dim=(3 if n == 1 else n + 2 * n * n),
        unpack_grad=lambda stat: lgssm_mod.unpack_grad(stat, n, m),
        default_prior=lambda **kw: lgssm_mod.default_prior(n, m, **kw),
        logprior=lgssm_mod.logprior,
        grad_logprior=lgssm_mod.grad_logprior,
        sample_prior=lgssm_mod.sample_prior,
        project_parameters=lgssm_mod.project_parameters,
        generate_data=lgssm_mod.generate_data,
        prior_mean_var=lambda p: (jnp.zeros((n,), p.A.dtype),
                                  10.0 * jnp.eye(n, dtype=p.A.dtype)),
        has_exact=True,
        marginal_loglikelihood=lgssm_mod.marginal_loglikelihood,
        gradient_marginal_loglikelihood=
        lgssm_mod.gradient_marginal_loglikelihood,
        precondition=lgssm_mod.precondition,
        precondition_noise=lgssm_mod.precondition_noise,
        correction_term=lgssm_mod.correction_term,
    )


LGSSM = _lgssm_api(1, 1)


def get_model(name: str, **kwargs) -> ModelAPI:
    if name == "svm":
        return SVM
    if name == "garch":
        return GARCH
    if name == "lgssm":
        if kwargs:
            return _lgssm_api(**kwargs)
        return LGSSM
    raise ValueError(f"Unknown model '{name}'")
