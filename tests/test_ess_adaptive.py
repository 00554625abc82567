"""ESS-adaptive resampling option (`ess_threshold`).

The reference resamples every step (`pf.py:24-27`); adaptive resampling is
a framework extension (off by default).  Correctness anchors:

* a threshold that always triggers (ESS <= N < 2N) reproduces the
  always-resample path bitwise (same keys, same draws);
* the adaptive estimator stays unbiased: PF score -> exact Kalman gradient
  (LGSSM) within Monte-Carlo error, both unfused and fused paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import lgssm, svm
from sgmcmc_tpu.ops import buffered


def _run(params, ys, key, N, ess_threshold, pv):
    return buffered.run_buffered_pf(
        svm.KERNEL, svm.grad_statistic, params, ys, key=key,
        n_particles=N, statistic_dim=3, smoother="poyiadjis_N",
        resampler="systematic", resample_mode="gather",
        prior_mean=0.0, prior_var=pv, ess_threshold=ess_threshold)


def test_always_triggering_threshold_is_bitwise_identical():
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    T, N = 24, 64
    ys, _ = svm.generate_data(jax.random.PRNGKey(1), params, T)
    ys = ys.astype(jnp.float32)
    pv = float(svm.stationary_variance(params))
    key = jax.random.PRNGKey(0)
    base = _run(params, ys, key, N, None, pv)
    gated = _run(params, ys, key, N, 2.0, pv)
    np.testing.assert_array_equal(np.asarray(base.mean_statistic),
                                  np.asarray(gated.mean_statistic))
    np.testing.assert_array_equal(np.asarray(base.loglikelihood),
                                  np.asarray(gated.loglikelihood))


def test_adaptive_actually_skips_resampling():
    """With a tiny threshold the ancestors stay the identity: particle
    paths never get rewired, so trajectories differ from always-resample
    but weights stay finite and normalized."""
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    T, N = 24, 64
    ys, _ = svm.generate_data(jax.random.PRNGKey(1), params, T)
    ys = ys.astype(jnp.float32)
    pv = float(svm.stationary_variance(params))
    key = jax.random.PRNGKey(0)
    base = _run(params, ys, key, N, None, pv)
    gated = _run(params, ys, key, N, 1e-6, pv)
    assert not np.allclose(np.asarray(base.mean_statistic),
                           np.asarray(gated.mean_statistic))
    assert np.isfinite(float(gated.loglikelihood))
    assert np.all(np.isfinite(np.asarray(gated.log_weights)))


@pytest.mark.parametrize("mode", ["gather", "fused"])
def test_adaptive_score_matches_exact_kalman_gradient(mode):
    """Unbiasedness under the gate: LGSSM PF score with ess_threshold=0.5
    -> exact marginal gradient within Monte-Carlo error."""
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                 R=[[1.0]], dtype=jnp.float64)
    T, N, R = 16, 256, 80
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), params, T)
    exact = lgssm.gradient_marginal_loglikelihood(params, ys)

    if mode == "fused":
        from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score
        exact_vec = np.array([
            float(exact.LRinv_vec[0]), float(exact.LQinv_vec[0]),
            float(exact.C[0, 0]), float(exact.A[0, 0])])
        p32 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), params)
        w = jnp.ones((T,), jnp.float32)
        fused = lgssm.get_fused("optimal")
        f = np.stack([np.asarray(fused_pf_score(
            fused, jax.random.fold_in(jax.random.PRNGKey(5), i), p32,
            ys.astype(jnp.float32), w, N, 0.0, 10.0, interpret=True,
            ess_threshold=0.5)[0]) for i in range(R)])
    else:
        kern = lgssm.get_kernel("optimal")
        run = jax.jit(lambda k: buffered.run_buffered_pf(
            kern, lgssm.grad_statistic, params, ys, key=k,
            n_particles=N, statistic_dim=lgssm.statistic_dim(1, 1),
            smoother="poyiadjis_N",
            resampler="systematic", resample_mode="gather",
            prior_mean=0.0, prior_var=10.0,
            ess_threshold=0.5).mean_statistic)
        f = np.stack([np.asarray(run(jax.random.fold_in(
            jax.random.PRNGKey(5), i))) for i in range(R)])
        g = lgssm.unpack_grad(jnp.asarray(f.mean(0)), 1, 1)
        gse = lgssm.unpack_grad(jnp.asarray(f.std(0) / np.sqrt(R)), 1, 1)
        for name in ("A", "LQinv_vec", "LRinv_vec"):
            z = (np.asarray(getattr(g, name)).ravel()
                 - np.asarray(getattr(exact, name)).ravel()) / (
                     np.asarray(getattr(gse, name)).ravel() + 1e-9)
            assert np.all(np.abs(z) < 5), (name, z)
        return

    se = f.std(0) / np.sqrt(R)
    z = (f.mean(0) - exact_vec) / (se + 1e-9)
    assert np.all(np.abs(z) < 5), (f.mean(0), exact_vec, se, z)
