"""Uniform model adapter: one object per model family for generic code.

Samplers, evaluators, and drivers program against this adapter instead of
the individual model modules — the functional analogue of the reference's
`SGMCMCHelper` contract (`sgmcmc_sampler.py:1427-1967`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from . import arphmm as arphmm_mod
from . import garch as garch_mod
from . import gauss_hmm as gauss_hmm_mod
from . import lgssm as lgssm_mod
from . import svjm as svjm_mod
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
    # optional exact-message oracle (LGSSM / HMM family)
    has_exact: bool = False
    marginal_loglikelihood: Callable | None = None
    gradient_marginal_loglikelihood: Callable | None = None
    windowed_marginal_gradient: Callable | None = None
    # kind='complete' buffered estimator (FFBS latent draw + complete-data
    # score, `sgmcmc_sampler.py:330-362`)
    windowed_complete_gradient: Callable | None = None
    latent_var_sample: Callable | None = None
    latent_var_distr: Callable | None = None
    gibbs_step: Callable | None = None
    # PF support (None for purely discrete models)
    has_pf: bool = True
    # PF predict surface (`pf_latent_var_distr` / `pf_y_distr` contract,
    # `sgmcmc_sampler.py:1895-1968`): statistic whose elementwise smoothed
    # average yields observation moments, and the moment converters.
    latent_moments: Callable | None = None   # (params, stats[T,H]) -> (m, P)
    y_statistic: Callable | None = None
    y_statistic_dim: int = 0
    y_moments: Callable | None = None        # (params, stats) -> (m, P)
    # k-step predictive loglik statistic factory (PF path) and the exact
    # message-passing predictive loglikelihood (marginal path)
    make_predictive_stat_fn: Callable | None = None
    predictive_loglikelihood: Callable | None = None
    # optional fused-window kernel bundles (ops/pallas/fused_pf.py):
    # kernel_name -> FusedModel | None
    get_fused: Callable | None = None
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
    get_fused=svm_mod.get_fused,
    latent_moments=svm_mod.latent_moments,
    y_statistic=svm_mod.y_statistic,
    y_statistic_dim=svm_mod.Y_STATISTIC_DIM,
    y_moments=svm_mod.y_moments,
    make_predictive_stat_fn=svm_mod.make_predictive_stat_fn,
)

SVJM = ModelAPI(
    name="svjm",
    get_kernel=svjm_mod.get_kernel,
    grad_statistic=svjm_mod.grad_statistic,
    suff_statistic=svjm_mod.suff_statistic,
    grad_statistic_dim=svjm_mod.STATISTIC_DIM,
    suff_statistic_dim=3,
    unpack_grad=svjm_mod.unpack_grad,
    default_prior=svjm_mod.default_prior,
    logprior=svjm_mod.logprior,
    grad_logprior=svjm_mod.grad_logprior,
    sample_prior=svjm_mod.sample_prior,
    project_parameters=svjm_mod.project_parameters,
    generate_data=svjm_mod.generate_data,
    prior_mean_var=lambda p: (0.0, svjm_mod.stationary_variance(p)),
    get_fused=svjm_mod.get_fused,
    latent_moments=svjm_mod.latent_moments,
    y_statistic=svjm_mod.y_statistic,
    y_statistic_dim=svjm_mod.Y_STATISTIC_DIM,
    y_moments=svjm_mod.y_moments,
    make_predictive_stat_fn=svjm_mod.make_predictive_stat_fn,
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
    get_fused=garch_mod.get_fused,
    latent_moments=garch_mod.latent_moments,
    y_statistic=garch_mod.y_statistic,
    y_statistic_dim=garch_mod.Y_STATISTIC_DIM,
    y_moments=garch_mod.y_moments,
    make_predictive_stat_fn=garch_mod.make_predictive_stat_fn,
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
        get_fused=(lgssm_mod.get_fused if (n == 1 and m == 1) else None),
        has_exact=True,
        marginal_loglikelihood=lgssm_mod.marginal_loglikelihood,
        gradient_marginal_loglikelihood=
        lgssm_mod.gradient_marginal_loglikelihood,
        windowed_marginal_gradient=lgssm_mod.windowed_marginal_gradient,
        windowed_complete_gradient=lgssm_mod.windowed_complete_gradient,
        latent_var_sample=lgssm_mod.latent_var_sample,
        latent_var_distr=lgssm_mod.latent_var_distr,
        gibbs_step=lgssm_mod.gibbs_step,
        latent_moments=lgssm_mod.latent_moments,
        y_statistic=lgssm_mod.suff_statistic,
        y_statistic_dim=(3 if n == 1 else n + 2 * n * n),
        y_moments=lgssm_mod.y_moments,
        make_predictive_stat_fn=lgssm_mod.make_predictive_stat_fn,
        predictive_loglikelihood=lgssm_mod.predictive_loglikelihood,
        precondition=lgssm_mod.precondition,
        precondition_noise=lgssm_mod.precondition_noise,
        correction_term=lgssm_mod.correction_term,
    )


LGSSM = _lgssm_api(1, 1)


def _hmm_dummy_kernel(*a, **k):
    raise NotImplementedError("discrete-state models have no particle filter")


def _gauss_hmm_api(num_states: int = 2, m: int = 1) -> ModelAPI:
    return ModelAPI(
        name=f"gauss_hmm_{num_states}_{m}",
        get_kernel=_hmm_dummy_kernel,
        grad_statistic=None, suff_statistic=None,
        grad_statistic_dim=0, suff_statistic_dim=0,
        unpack_grad=None,
        default_prior=lambda **kw: gauss_hmm_mod.default_prior(
            num_states, m, **kw),
        logprior=gauss_hmm_mod.logprior,
        grad_logprior=gauss_hmm_mod.grad_logprior,
        sample_prior=gauss_hmm_mod.sample_prior,
        project_parameters=gauss_hmm_mod.project_parameters,
        generate_data=gauss_hmm_mod.generate_data,
        prior_mean_var=lambda p: (0.0, 1.0),
        has_exact=True,
        marginal_loglikelihood=gauss_hmm_mod.marginal_loglikelihood,
        gradient_marginal_loglikelihood=
        gauss_hmm_mod.gradient_marginal_loglikelihood,
        windowed_marginal_gradient=gauss_hmm_mod.windowed_marginal_gradient,
        windowed_complete_gradient=gauss_hmm_mod.windowed_complete_gradient,
        latent_var_sample=gauss_hmm_mod.latent_var_sample,
        latent_var_distr=gauss_hmm_mod.latent_var_distr,
        gibbs_step=gauss_hmm_mod.gibbs_step,
        predictive_loglikelihood=gauss_hmm_mod.predictive_loglikelihood,
        precondition=gauss_hmm_mod.precondition,
        precondition_noise=gauss_hmm_mod.precondition_noise,
        correction_term=gauss_hmm_mod.correction_term,
        has_pf=False,
    )


def _arphmm_api(num_states: int = 2, m: int = 1, p: int = 1) -> ModelAPI:
    return ModelAPI(
        name=f"arphmm_{num_states}_{m}_{p}",
        get_kernel=_hmm_dummy_kernel,
        grad_statistic=None, suff_statistic=None,
        grad_statistic_dim=0, suff_statistic_dim=0,
        unpack_grad=None,
        default_prior=lambda **kw: arphmm_mod.default_prior(
            num_states, m, m * p, **kw),
        logprior=arphmm_mod.logprior,
        grad_logprior=arphmm_mod.grad_logprior,
        sample_prior=arphmm_mod.sample_prior,
        project_parameters=arphmm_mod.project_parameters,
        generate_data=arphmm_mod.generate_data,
        prior_mean_var=lambda p_: (0.0, 1.0),
        has_exact=True,
        marginal_loglikelihood=arphmm_mod.marginal_loglikelihood,
        gradient_marginal_loglikelihood=
        arphmm_mod.gradient_marginal_loglikelihood,
        windowed_marginal_gradient=arphmm_mod.windowed_marginal_gradient,
        windowed_complete_gradient=arphmm_mod.windowed_complete_gradient,
        gibbs_step=arphmm_mod.gibbs_step,
        latent_var_sample=arphmm_mod.latent_var_sample,
        latent_var_distr=arphmm_mod.latent_var_distr,
        predictive_loglikelihood=arphmm_mod.predictive_loglikelihood,
        precondition=arphmm_mod.precondition,
        precondition_noise=arphmm_mod.precondition_noise,
        correction_term=arphmm_mod.correction_term,
        has_pf=False,
    )


def _slds_api(num_states: int = 2, n: int = 1, m: int = 1) -> ModelAPI:
    """SLDS adapter (blocked-Gibbs / complete-data family; the SLDS has no
    marginal-likelihood gradients — reference contract,
    `slds/sampler.py:249`).  `generate_data` returns (y, x, z)."""
    from . import slds as slds_mod
    return ModelAPI(
        name=f"slds_{num_states}_{n}_{m}",
        get_kernel=_hmm_dummy_kernel,
        grad_statistic=None, suff_statistic=None,
        grad_statistic_dim=0, suff_statistic_dim=0,
        unpack_grad=None,
        default_prior=lambda **kw: slds_mod.default_prior(
            num_states, n, m, **kw),
        logprior=slds_mod.logprior,
        grad_logprior=slds_mod.grad_logprior,
        sample_prior=slds_mod.sample_prior,
        project_parameters=slds_mod.project_parameters,
        generate_data=slds_mod.generate_data,
        prior_mean_var=lambda p: (0.0, 1.0),
        windowed_complete_gradient=slds_mod.windowed_complete_gradient,
        gibbs_step=slds_mod.gibbs_step,
        has_pf=False,
    )


def get_model(name: str, **kwargs) -> ModelAPI:
    if name == "svm":
        return SVM
    if name == "svjm":
        return SVJM
    if name == "garch":
        return GARCH
    if name == "lgssm":
        if kwargs:
            return _lgssm_api(**kwargs)
        return LGSSM
    if name == "gauss_hmm":
        return _gauss_hmm_api(**kwargs)
    if name == "arphmm":
        return _arphmm_api(**kwargs)
    if name == "slds":
        return _slds_api(**kwargs)
    raise ValueError(f"Unknown model '{name}'")
