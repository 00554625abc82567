"""Smoke tests for the plotting layer (`plotting_utils.py` parity)."""
import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pandas as pd
import pytest

from sgmcmc_tpu.evaluation import plotting
from sgmcmc_tpu.inference.samplers import GARCHSampler, SVMSampler
from sgmcmc_tpu.models import garch, svm


@pytest.fixture(scope="module")
def svm_data():
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, xs = svm.generate_data(jax.random.PRNGKey(0), params, 60)
    return np.asarray(ys), np.asarray(xs), params


def test_plot_metrics_and_trace(tmp_path):
    df = pd.DataFrame({
        "iteration": [0, 1, 2, 0, 1, 2],
        "metric": ["logmse"] * 6,
        "variable": ["A"] * 3 + ["Q"] * 3,
        "value": [1.0, 0.5, 0.2, 2.0, 1.0, 0.7],
    })
    plotting.plot_metrics(df, path=str(tmp_path / "m.png"))
    plotting.plot_trace_plot(df.rename(columns={"metric": "junk"}),
                             path=str(tmp_path / "t.png"))


def test_plot_svm_data_fit(svm_data, tmp_path):
    ys, xs, params = svm_data
    sampler = SVMSampler(observations=ys, parameters=params, seed=3)
    fig, axes = plotting.plot_svm_data_fit(
        ys, true_latent_vars=xs, sampler=sampler, N=64,
        path=str(tmp_path / "svm_fit.png"))
    assert len(axes) == 2
    assert (tmp_path / "svm_fit.png").exists()


def test_plot_garch_data_fit(svm_data, tmp_path):
    params = garch.from_alpha_beta_gamma(alpha=0.1, beta=0.8, gamma=0.05,
                                         R=0.09)
    ys, xs = garch.generate_data(jax.random.PRNGKey(1), params, 60)
    sampler = GARCHSampler(observations=np.asarray(ys), parameters=params,
                           seed=4)
    fig, axes = plotting.plot_garch_data_fit(
        np.asarray(ys), true_latent_vars=np.asarray(xs), sampler=sampler,
        N=64, path=str(tmp_path / "garch_fit.png"))
    assert len(axes) == 2
    assert (tmp_path / "garch_fit.png").exists()
