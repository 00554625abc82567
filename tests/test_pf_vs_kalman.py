"""PF score/loglik estimates vs the exact Kalman oracle on the LGSSM.

This is the reference's central correctness harness
(`gradient_error_fig_scripts/lgssm_grad_compare.py`) turned into seeded
tests: the Fisher-identity particle smoother estimates must agree with the
exact Kalman gradient/likelihood within Monte-Carlo error, and the buffered
estimator's bias must shrink as the buffer grows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import lgssm
from sgmcmc_tpu.ops import buffered

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def setup():
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), params, 30)
    exact_ll = float(lgssm.marginal_loglikelihood(params, ys))
    exact_grad = lgssm.gradient_marginal_loglikelihood(params, ys)
    return params, ys, exact_ll, exact_grad


def run_pf(params, ys, key, smoother, n_particles=1000, kernel="optimal",
           **kw):
    return buffered.run_buffered_pf(
        lgssm.get_kernel(kernel), lgssm.grad_statistic, params, ys,
        key=key, n_particles=n_particles,
        statistic_dim=lgssm.statistic_dim(1, 1), smoother=smoother,
        prior_mean=jnp.zeros(1, ys.dtype), prior_var=10.0 * jnp.eye(1, dtype=ys.dtype),
        **kw)


@pytest.mark.parametrize("smoother", ["poyiadjis_N", "poyiadjis_N2", "paris"])
def test_pf_gradient_matches_kalman(setup, smoother):
    params, ys, _, exact = setup
    reps = 16
    f = jax.jit(jax.vmap(lambda k: run_pf(params, ys, k, smoother,
                                          n_particles=1000).mean_statistic))
    stats = np.asarray(f(jax.random.split(jax.random.PRNGKey(1), reps)))
    mean_stat = stats.mean(axis=0)
    se = stats.std(axis=0) / np.sqrt(reps)
    # stat layout: [LRinv_vec, LQinv_vec, C, A]
    expected = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])
    err = np.abs(mean_stat - expected)
    assert np.all(err < 5 * se + 0.05 * np.abs(expected) + 0.05), (
        smoother, mean_stat, expected, se)


def test_pf_loglikelihood_matches_kalman(setup):
    params, ys, exact_ll, _ = setup
    reps = 16
    f = jax.jit(jax.vmap(lambda k: run_pf(params, ys, k, "filter",
                                          n_particles=2000).loglikelihood))
    lls = np.asarray(f(jax.random.split(jax.random.PRNGKey(2), reps)))
    # PF loglik is a consistent (slightly downward-biased) estimator
    assert abs(lls.mean() - exact_ll) < 0.05 * abs(exact_ll), (
        lls.mean(), exact_ll)


def test_nemeth_shrinkage_close_to_poyiadjis(setup):
    params, ys, _, exact = setup
    f = jax.jit(jax.vmap(lambda k: run_pf(params, ys, k, "nemeth",
                                          n_particles=1000,
                                          lambduh=0.95).mean_statistic))
    stats = np.asarray(f(jax.random.split(jax.random.PRNGKey(3), 8)))
    expected = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])
    # lambda=0.95 shrinkage trades variance for bias: only a ballpark check
    err = np.abs(stats.mean(axis=0) - expected)
    assert np.all(err < 0.3 * np.abs(expected) + 0.5), (err, expected)


def test_buffered_gradient_bias_decreases_with_buffer(setup):
    """Bias of the buffered PF score (vs the weighted exact buffered Kalman
    gradient over the same window) decreases with buffer size — the paper's
    core claim (lgssm_grad_compare protocol)."""
    params, ys, _, _ = setup
    from sgmcmc_tpu.ops import kalman
    from sgmcmc_tpu.ops.subsequence import subsequence_weights
    T, S = 30, 8
    start = 11  # centered subsequence
    w = subsequence_weights(start, S, T, "uniform", ys.dtype)
    # ground truth: exact buffered gradient with FULL boundary messages
    fmsg = kalman.forward_message(ys[:start], params.A, params.C,
                                  params.LQinv, params.LRinv,
                                  lgssm.default_forward_message(params))
    bmsg = kalman.backward_message(ys[start + S:], params.A, params.C,
                                   params.LQinv, params.LRinv,
                                   lgssm.default_backward_message(params))
    exact_sub = lgssm.gradient_marginal_loglikelihood(
        params, ys[start:start + S], forward_msg=fmsg, backward_msg=bmsg,
        weights=w)
    expected = np.concatenate([
        np.asarray(exact_sub.LRinv_vec), np.asarray(exact_sub.LQinv_vec),
        np.asarray(exact_sub.C).ravel(), np.asarray(exact_sub.A).ravel()])

    reps = 48
    biases = {}
    for B in [0, 4, 11]:
        lo, hi = start - B, start + S + B
        window = ys[lo:hi]
        W = hi - lo
        step_w = np.zeros(W)
        step_w[B:B + S] = np.asarray(w)
        in_win = (step_w > 0).astype(float)

        def one(k, window=window, step_w=jnp.asarray(step_w),
                in_win=jnp.asarray(in_win)):
            return run_pf(params, window, k, "poyiadjis_N",
                          n_particles=400, step_weights=step_w,
                          in_window=in_win).mean_statistic

        stats = np.asarray(jax.jit(jax.vmap(one))(
            jax.random.split(jax.random.PRNGKey(10 + B), reps)))
        biases[B] = np.linalg.norm(stats.mean(axis=0) - expected)
    assert biases[11] < biases[0], biases
    assert biases[4] <= biases[0] * 1.2, biases


def test_vector_lgssm_pf_gradient_matches_kalman():
    """General-n path: 2-D latent LGSSM PF score vs exact Kalman gradient."""
    import numpy as onp
    rng = onp.random.default_rng(0)
    A = onp.array([[0.7, 0.1], [0.0, 0.5]])
    C = onp.eye(2)
    Q = onp.array([[0.5, 0.1], [0.1, 0.4]])
    R = onp.eye(2) * 0.6
    params = lgssm.from_matrices(A, C, Q, R)
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(1), params, 15)
    exact = lgssm.gradient_marginal_loglikelihood(params, ys)
    from jax.flatten_util import ravel_pytree

    def one(k):
        return buffered.run_buffered_pf(
            lgssm.get_kernel("optimal"), lgssm.grad_statistic, params, ys,
            key=k, n_particles=1000,
            statistic_dim=lgssm.statistic_dim(2, 2),
            smoother="poyiadjis_N",
            prior_mean=jnp.zeros(2, ys.dtype),
            prior_var=10.0 * jnp.eye(2, dtype=ys.dtype)).mean_statistic

    stats = np.asarray(jax.jit(jax.vmap(one))(
        jax.random.split(jax.random.PRNGKey(2), 12)))
    mean_stat = stats.mean(axis=0)
    se = stats.std(axis=0) / np.sqrt(12)
    expected = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])
    err = np.abs(mean_stat - expected)
    assert np.all(err < 6 * se + 0.08 * np.abs(expected) + 0.08), (
        mean_stat, expected)
