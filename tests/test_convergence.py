"""Convergence diagnostics: split-R-hat / ESS / IACT on known chains."""
import numpy as np
import pytest

from sgmcmc_tpu.metrics import convergence as cv


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_iid_chains_rhat_near_one(rng):
    x = rng.standard_normal((4, 4000))
    assert abs(cv.split_rhat(x) - 1.0) < 0.02


def test_iid_chains_ess_near_total(rng):
    x = rng.standard_normal((4, 4000))
    e = cv.ess(x)
    assert 0.5 * x.size < e <= x.size
    assert cv.iact(x) < 2.0


def test_ar1_iact_matches_theory(rng):
    # AR(1) with rho=0.9: IACT = (1+rho)/(1-rho) = 19
    rho, C, N = 0.9, 4, 20000
    eps = rng.standard_normal((C, N))
    x = np.zeros((C, N))
    for t in range(1, N):
        x[:, t] = rho * x[:, t - 1] + eps[:, t]
    tau = cv.iact(x[:, 1000:])
    assert 12.0 < tau < 28.0
    assert abs(cv.split_rhat(x[:, 1000:]) - 1.0) < 0.05


def test_shifted_chains_fail_rhat(rng):
    x = rng.standard_normal((2, 2000))
    x[1] += 3.0
    assert cv.split_rhat(x) > 1.5


def test_trending_single_chain_fails_split_rhat(rng):
    # the whole point of SPLIT R-hat: a single drifting chain is caught
    x = np.linspace(0.0, 5.0, 4000) + 0.1 * rng.standard_normal(4000)
    assert cv.split_rhat(x) > 1.5


def test_single_stationary_chain_passes(rng):
    x = rng.standard_normal(4000)
    assert abs(cv.split_rhat(x) - 1.0) < 0.05
    assert cv.ess(x) > 0.5 * x.size


def test_mean_se_consistent_with_ess(rng):
    x = rng.standard_normal((4, 4000))
    m, se = cv.mean_se(x)
    expected = x.std(ddof=1) / np.sqrt(cv.ess(x))
    assert abs(se - expected) < 1e-12
    assert abs(m) < 5 * se + 0.05


def test_constant_chain_degenerate():
    x = np.ones((2, 100))
    assert cv.split_rhat(x) == 1.0


def test_convergence_summary_dict_rows(rng):
    rows = cv.convergence_summary(
        {"a": rng.standard_normal((3, 1000)),
         "b": rng.standard_normal(1000)}, burn_frac=0.5)
    by = {r["variable"]: r for r in rows}
    assert set(by) == {"a", "b"}
    assert by["a"]["num_chains"] == 3 and by["a"]["num_iters"] == 500
    assert abs(by["a"]["rhat"] - 1.0) < 0.1
    assert by["a"]["ess"] > 100
    assert by["a"]["se_mean"] > 0


def test_convergence_summary_pytree(rng):
    import jax

    from sgmcmc_tpu.models import svm as svm_mod

    # fabricate a [C=2, N=40] stacked trace of SVM parameter pytrees
    base = svm_mod.from_scalars(A=0.5, Q=1.0, R=2.0)
    trace = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[None, None] +
        0.01 * rng.standard_normal((2, 40) + np.shape(x)), base)
    rows = cv.convergence_summary(trace, burn_frac=0.25)
    names = {r["variable"] for r in rows}
    assert any("A" in n for n in names)
    assert all(np.isfinite(r["rhat"]) and r["ess"] > 0 for r in rows)
