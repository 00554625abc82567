"""Sampler classes: reference-API surface over the functional core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.inference.samplers import (GARCHSampler, LGSSMSampler,
                                           SVMSampler)
from sgmcmc_tpu.models import lgssm as lgssm_mod
from sgmcmc_tpu.models import svm as svm_mod


@pytest.fixture(scope="module")
def svm_data():
    true = svm_mod.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm_mod.generate_data(jax.random.PRNGKey(0), true, 200)
    return true, ys


def test_svm_sampler_sgld_moves_toward_truth(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=1)
    s.parameters = svm_mod.from_scalars(A=0.3, Q=1.5, R=2.0,
                                        dtype=jnp.float64)
    for _ in range(80):
        s.sample_sgld(epsilon=0.1, N=100, subsequence_length=32,
                      buffer_length=8)
    assert float(s.parameters.A[0, 0]) > 0.5


def test_svm_sampler_fit_output_all(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=2, parameters=true)
    trace = s.fit("SGLD", num_iters=5, epsilon=0.05, output_all=True,
                  N=50, subsequence_length=16, buffer_length=2)
    assert len(trace) == 6
    assert all(np.isfinite(float(p.A[0, 0])) for p in trace)


def test_svm_fit_scan_trace(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=3, parameters=true)
    trace = s.fit_scan("SGLD", num_iters=10, epsilon=0.05, N=50,
                       subsequence_length=16, buffer_length=2)
    assert trace.A.shape[0] == 10
    assert np.all(np.isfinite(np.asarray(trace.A)))


def test_noisy_loglikelihood_and_logjoint(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=4, parameters=true)
    out = s.noisy_logjoint(return_loglike=True, N=200)
    assert np.isfinite(out["logjoint"])
    assert out["logjoint"] < out["loglikelihood"]  # logprior < 0 here


def test_sgd_and_adagrad_steps(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=5, parameters=true)
    s.step_sgd(epsilon=0.01, N=50, subsequence_length=16, buffer_length=2)
    s.step_adagrad(epsilon=0.01, N=50, subsequence_length=16,
                   buffer_length=2)
    assert np.isfinite(float(s.parameters.A[0, 0]))


def test_lgssm_sampler_exact_vs_pf_loglik():
    true = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                   R=[[0.7]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(1), true, 50)
    s = LGSSMSampler(observations=ys, parameters=true, seed=6)
    exact = s.exact_loglikelihood()
    pf_lls = [s.noisy_loglikelihood(kind="pf", N=1000, kernel="optimal")
              for _ in range(5)]
    assert abs(np.mean(pf_lls) - exact) < 0.05 * abs(exact)


def test_lgssm_gibbs_recovers_parameters():
    true = lgssm_mod.from_matrices(A=[[0.7]], C=[[1.0]], Q=[[0.4]],
                                   R=[[0.5]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(2), true, 400)
    s = LGSSMSampler(observations=ys, seed=7)
    A_samples = []
    for i in range(60):
        s.sample_gibbs()
        s.project_parameters()
        if i >= 20:
            A_samples.append(float(s.parameters.A[0, 0]))
    assert abs(np.mean(A_samples) - 0.7) < 0.15, np.mean(A_samples)


def test_lgssm_sgrld_runs():
    true = lgssm_mod.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                   R=[[0.7]])
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(3), true, 100)
    s = LGSSMSampler(observations=ys, parameters=true, seed=8)
    for _ in range(5):
        s.sample_sgrld(epsilon=0.01, N=100, subsequence_length=16,
                       buffer_length=4, kernel="optimal")
    assert np.isfinite(float(s.parameters.A[0, 0]))
    assert float(s.parameters.LQinv_vec[0]) > 0


def test_garch_sampler_runs():
    from sgmcmc_tpu.models import garch as garch_mod
    true = garch_mod.from_alpha_beta_gamma(0.1, 0.4, 0.3, 0.5,
                                           dtype=jnp.float64)
    ys, _ = garch_mod.generate_data(jax.random.PRNGKey(4), true, 150)
    s = GARCHSampler(observations=ys, parameters=true, seed=9)
    for _ in range(5):
        s.sample_sgld(epsilon=0.05, N=100, subsequence_length=16,
                      buffer_length=4)
    assert np.isfinite(float(s.parameters.log_mu[0]))


def test_simulate(svm_data):
    true, _ = svm_data
    s = SVMSampler(observations=None, parameters=true, seed=10)
    ys, xs = s.simulate(100)
    assert ys.shape == (100, 1)


def test_exact_logjoint_and_precondition_sgd_and_custom():
    """exact_logjoint (`sgmcmc_sampler.py:38-49`), SGRD
    (step_precondition_sgd, `:486-502`), and iter_type='custom'."""
    import numpy as np

    from sgmcmc_tpu.inference.samplers import LGSSMSampler
    from sgmcmc_tpu.models import lgssm

    true = lgssm.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.0)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(40), true, 200)
    s = LGSSMSampler(observations=ys, parameters=true, seed=41)
    out = s.exact_logjoint(return_loglike=True)
    assert np.isfinite(out["logjoint"])
    np.testing.assert_allclose(out["loglikelihood"],
                               s.exact_loglikelihood(), rtol=1e-12)
    assert out["logjoint"] != out["loglikelihood"]

    ll0 = s.exact_loglikelihood()
    s.parameters = lgssm.from_matrices(A=0.3, C=1.0, Q=1.5, R=2.0)
    for _ in range(50):
        s.step_precondition_sgd(0.5, kind="marginal",
                                subsequence_length=32, buffer_length=8)
        s.project_parameters()
    assert s.exact_loglikelihood() > -1e9
    assert float(np.asarray(s.parameters.A)[0, 0]) > 0.45  # moved to MAP

    s.fit("SGRD", num_iters=3, epsilon=0.1, kind="marginal",
          subsequence_length=32, buffer_length=8)
    s.fit("custom", num_iters=2, iter_funcs=[
        ("sample_sgld", dict(epsilon=0.05, kind="marginal",
                             subsequence_length=32, buffer_length=8)),
        ("project_parameters", {}),
    ])
    for leaf in jax.tree_util.tree_leaves(s.parameters):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fit_timed_records_trace_and_times():
    """`fit_timed` (`sgmcmc_sampler.py:723`): wall-clock budget, thinned
    parameter trace aligned with elapsed times."""
    true = lgssm_mod.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]],
                                   R=[[1.0]], dtype=jnp.float64)
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(3), true, 64)
    s = LGSSMSampler(observations=np.asarray(ys), parameters=true, seed=0)
    plist, times = s.fit_timed("SGD", max_time=1.0, epsilon=1e-4,
                               kind="marginal", subsequence_length=16,
                               buffer_length=2)
    assert len(plist) == len(times) >= 2
    assert times == sorted(times)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(plist[-1]))


def test_fit_evaluate_records_metrics():
    """`fit_evaluate` (`sgmcmc_sampler.py:757-894`): inline evaluator rows
    at eval_freq intervals of sampler time."""
    from sgmcmc_tpu.metrics.metric_functions import (
        noisy_logjoint_loglike_metric)

    true = lgssm_mod.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]],
                                   R=[[1.0]], dtype=jnp.float64)
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(4), true, 64)
    s = LGSSMSampler(observations=np.asarray(ys), parameters=true, seed=0)
    ev = s.fit_evaluate(
        "SGD", max_time=0.8, epsilon=1e-4, eval_freq=0.2,
        metric_functions=[noisy_logjoint_loglike_metric(
            kind="marginal", subsequence_length=16, buffer_length=2)],
        kind="marginal", subsequence_length=16, buffer_length=2)
    df = ev.get_metrics()
    assert len(df) >= 2
    assert np.all(np.isfinite(df["value"].to_numpy(float)))


def test_fit_scan_chunked_and_timed_chunked():
    """Chunked fit paths: fit_scan_chunked's chain law matches fit_scan
    sample counts and stays finite; fit_timed(chunk_iters=...) returns a
    monotone time axis."""
    import jax
    import numpy as np

    from sgmcmc_tpu.inference.samplers import LGSSMSampler
    from sgmcmc_tpu.models import lgssm

    p = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), p, 60)
    s = LGSSMSampler(observations=ys, parameters=p, seed=0)
    trace = s.fit_scan_chunked("SGLD", num_iters=25, chunk_iters=10,
                               epsilon=1e-3, kind="marginal",
                               subsequence_length=-1)
    assert len(trace) == 25
    assert all(np.isfinite(float(np.asarray(q.A)[0, 0])) for q in trace)

    s2 = LGSSMSampler(observations=ys, parameters=p, seed=0)
    params_list, times = s2.fit_timed("SGLD", max_time=1.0, epsilon=1e-3,
                                      chunk_iters=10, kind="marginal",
                                      subsequence_length=-1)
    assert len(params_list) == len(times) > 1
    assert all(b >= a for a, b in zip(times, times[1:]))
