"""Evaluators + metric functions: rows, ordering, averaging, KSD."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.evaluation import evaluator as ev
from sgmcmc_tpu.metrics import metric_functions as mf
from sgmcmc_tpu.metrics.ksd import imq_ksd
from sgmcmc_tpu.models import svm


def make_sampler():
    from sgmcmc_tpu.inference.samplers import SVMSampler
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, 60)
    return SVMSampler(observations=ys, parameters=true, seed=1), true


def test_metric_and_sample_functions_rows():
    s, true = make_sampler()
    fn = mf.metric_function_parameters(true, ["A", "LQinv_vec"], "mse")
    rows = fn(s)
    assert len(rows) == 2
    assert all(r["value"] == 0.0 for r in rows)   # params == target
    sfn = mf.sample_function_parameters(["A"])
    srows = sfn(s)
    assert srows[0]["value"] == 0.9


def test_sampler_evaluator_records_runtime():
    s, true = make_sampler()
    e = ev.SamplerEvaluator(
        s, metric_functions=[mf.metric_function_parameters(true, ["A"])])
    e.evaluate_sampler_step(["sample_sgld", "project_parameters"],
                            [dict(epsilon=0.01, N=32,
                                  subsequence_length=16, buffer_length=2),
                             {}])
    df = e.get_metrics()
    assert "runtime" in set(df["metric"])
    state = e.save_state()
    e2 = ev.SamplerEvaluator(s, init_state=state)
    assert e2.iteration == 1


def test_offline_evaluator_bisection_order():
    s, true = make_sampler()
    trace = [true] * 9
    e = ev.OfflineEvaluator(
        s, trace, metric_functions=[mf.metric_function_parameters(
            true, ["A"])])
    e.evaluate(num_to_eval=3)
    done = np.flatnonzero(e.eval_flag)
    assert 0 in done and 8 in done and 4 in done   # first, last, midpoint
    e.evaluate()
    assert e.eval_flag.all()


def test_half_average_parameters_list():
    import types
    trace = [svm.from_scalars(A=a, Q=1.0, R=1.0, dtype=jnp.float64)
             for a in [0.0, 1.0, 2.0, 3.0]]
    avg = ev.half_average_parameters_list(trace)
    # index i averages over the most recent ceil((i+1)/2) entries
    np.testing.assert_allclose(float(avg[3].A[0, 0]), (2.0 + 3.0) / 2)
    np.testing.assert_allclose(float(avg[1].A[0, 0]), 1.0)


def test_imq_ksd_decreases_for_better_samples():
    """Samples from the target (with exact scores) should have lower KSD
    than shifted samples."""
    key = jax.random.PRNGKey(0)
    x_good = jax.random.normal(key, (300, 2), jnp.float64)
    x_bad = x_good + 2.0
    score = lambda x: -x     # standard normal score
    good = float(imq_ksd(x_good, score(x_good)))
    bad = float(imq_ksd(x_bad, score(x_bad)))
    assert good < bad, (good, bad)


def test_ksd_blocking_invariance():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (100, 3), jnp.float64)
    g = -x
    a = float(imq_ksd(x, g, max_block_size=512))
    b = float(imq_ksd(x, g, max_block_size=32))
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_ks_test_traces():
    from sgmcmc_tpu.metrics.ks_test import ks_test_traces
    rng = np.random.default_rng(0)
    t1 = [svm.from_scalars(A=a, Q=1.0, R=1.0, dtype=jnp.float64)
          for a in rng.normal(0.9, 0.05, 60)]
    t2 = [svm.from_scalars(A=a, Q=1.0, R=1.0, dtype=jnp.float64)
          for a in rng.normal(0.9, 0.05, 60)]
    t3 = [svm.from_scalars(A=a, Q=1.0, R=1.0, dtype=jnp.float64)
          for a in rng.normal(0.3, 0.05, 60)]
    same = ks_test_traces(t1, t2, ["A"])
    diff = ks_test_traces(t1, t3, ["A"])
    assert same[0]["pvalue"] > 0.01
    assert diff[0]["pvalue"] < 0.01


def test_metric_compare_x_pf_fallback():
    """metric_compare_x on a PF-only model routes through the smoothed
    predict surface; at the true parameters the smoothed latent means
    track the simulated path (RMSE well below the prior sd)."""
    s, true = make_sampler()
    _, xs = svm.generate_data(jax.random.PRNGKey(0), true, 60)
    row = mf.metric_compare_x(np.asarray(xs), N=256,
                              resample_mode="gather")(s)
    assert row["metric"] == "x_rmse"
    prior_sd = float(np.sqrt(0.5 / (1 - 0.9 ** 2)))
    assert 0 < row["value"] < prior_sd, (row, prior_sd)


def test_metric_compare_z_precision_recall_arphmm():
    """NMI + precision + recall + accuracy rows from metric_compare_z on an
    ARPHMM (`metric_functions.py:419-438`: precision = sum_j max_i C_ij /
    sum C on the true-by-predicted confusion matrix, recall transposed)."""
    from sgmcmc_tpu.inference.samplers import ARPHMMSampler
    from sgmcmc_tpu.models import arphmm

    pi = np.array([[0.95, 0.05], [0.05, 0.95]])
    D = np.stack([np.array([[0.9, 0.0]]), np.array([[-0.9, 0.0]])])
    R = np.stack([np.eye(1) * 0.05, np.eye(1) * 0.05])
    params = arphmm.from_values(pi, D, R)
    ys, zs = arphmm.generate_data(jax.random.PRNGKey(5), params, 200)
    s = ARPHMMSampler(observations=ys, parameters=params, seed=0)
    rows = mf.metric_compare_z(np.asarray(zs))(s)
    by_metric = {r["metric"]: r["value"] for r in rows}
    assert {"z_nmi", "precision", "recall", "z_accuracy"} <= set(by_metric)
    for name in ("precision", "recall", "z_accuracy"):
        assert 0.0 <= by_metric[name] <= 1.0
    # well-separated states at the true parameters: near-perfect recovery
    assert by_metric["precision"] > 0.9
    assert by_metric["recall"] > 0.9
    # precision/recall upper-bound the single-permutation accuracy
    assert by_metric["precision"] >= by_metric["z_accuracy"] - 1e-12
    assert by_metric["recall"] >= by_metric["z_accuracy"] - 1e-12


def test_offline_evaluator_iter_funcs_hook():
    """Per-iteration sampler hook on OfflineEvaluator.evaluate
    (`evaluator.py:524-620`): named sampler methods run after each trace
    point's parameters load, before metrics."""
    s, true = make_sampler()
    calls = []
    s.mark = lambda tag="hook": calls.append(tag)   # ad-hoc sampler method
    trace = [true] * 3
    e = ev.OfflineEvaluator(
        s, trace,
        metric_functions=[mf.metric_function_parameters(true, ["A"])])
    e.evaluate(num_to_eval=2, iter_func_name="mark",
               iter_func_kwargs=dict(tag="a"))
    assert calls == ["a", "a"]
    e.evaluate(iter_func_name=["mark", "mark"],
               iter_func_kwargs=[dict(tag="b"), dict(tag="c")])
    assert calls == ["a", "a", "b", "c"]
    assert e.eval_flag.all()
    import pytest
    with pytest.raises(ValueError):
        e.evaluate(iter_func_name="not_a_method")
    with pytest.raises(ValueError):
        e.evaluate(iter_func_name=["mark"], iter_func_kwargs=[{}, {}])


def test_metric_function_from_sampler_and_predictive_metric():
    """Generic sampler-method metric + k-step predictive rows
    (`metric_functions.py:179-203, 383-416`)."""
    import jax
    from sgmcmc_tpu.inference.samplers import LGSSMSampler, SVMSampler
    from sgmcmc_tpu.metrics.metric_functions import (
        metric_function_from_sampler, noisy_predictive_logjoint_loglike_metric)
    from sgmcmc_tpu.models import lgssm as lgssm_mod
    from sgmcmc_tpu.models import svm as svm_mod

    p = lgssm_mod.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]], R=[[1.0]],
                                dtype=jnp.float64)
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(0), p, 50)
    s = LGSSMSampler(observations=np.asarray(ys), parameters=p, seed=0)
    row = metric_function_from_sampler("exact_loglikelihood")(s)
    assert row["metric"] == "exact_loglikelihood"
    assert np.isfinite(row["value"])
    rows = noisy_predictive_logjoint_loglike_metric(3, kind="marginal")(s)
    assert len(rows) == 1 and np.isfinite(rows[0]["value"])

    sp = svm_mod.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys2, _ = svm_mod.generate_data(jax.random.PRNGKey(1), sp, 50)
    s2 = SVMSampler(observations=np.asarray(ys2), parameters=sp, seed=0)
    rows2 = noisy_predictive_logjoint_loglike_metric(
        2, kind="pf", N=64, resample_mode="gather")(s2)
    assert len(rows2) == 3
    assert all(np.isfinite(r["value"]) for r in rows2)
