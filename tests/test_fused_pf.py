"""Fused window kernel vs the unfused buffered PF (gather mode).

The fused path consumes randomness as (x0 normals, per-step proposal
normals, per-step systematic offsets).  Reconstructing exactly the draws
the unfused gather path makes lets us compare trajectories deterministically
(selections are exact; resampled values carry the bf16 hi/lo ~1e-5 error).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops import buffered
from sgmcmc_tpu.ops.pallas.fused_pf import (fused_pf_score,
                                            fused_window_batched)


def _gather_path_draws(key, params, N, W, prior_mean, prior_var):
    """Replicate run_buffered_pf's PRNG consumption, folded layout."""
    s = 8
    B = N // s

    def fold(flat):                      # [N] -> [s, B], j = s*p + q
        return flat.reshape(B, s).T

    key_init, key_steps = jax.random.split(key)
    z0 = jax.random.normal(key_init, (N, 1), jnp.float32)
    x0 = prior_mean + jnp.sqrt(prior_var) * z0
    step_keys = jax.random.split(key_steps, W)
    xis, zs = [], []
    for t in range(W):
        kr, kp = jax.random.split(step_keys[t])
        xis.append(jax.random.uniform(kr, (), jnp.float32))
        zs.append(fold(jax.random.normal(kp, (N, 1), jnp.float32)[:, 0]))
    return (fold(x0[:, 0])[None], jnp.stack(zs)[None, :, :, :],
            jnp.stack(xis)[None])


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_matches_gather_deterministically(seed):
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    T, N = 24, 64
    ys, _ = svm.generate_data(jax.random.PRNGKey(1), params, T)
    ys = ys.astype(jnp.float32)
    pv = float(svm.stationary_variance(params))
    key = jax.random.PRNGKey(seed)

    ref = buffered.run_buffered_pf(
        svm.KERNEL, svm.grad_statistic, params, ys, key=key,
        n_particles=N, statistic_dim=3, smoother="poyiadjis_N",
        resampler="systematic", resample_mode="gather",
        prior_mean=0.0, prior_var=pv)

    x0, normals, xi = _gather_path_draws(key, params, N, T, 0.0, pv)
    pvec = svm._fused_pack(params).astype(jnp.float32)[None]
    w = jnp.ones((1, T), jnp.float32)
    ms, ll = fused_window_batched(
        svm.FUSED, pvec, x0, normals, ys[None, :, 0], w, xi,
        chain_block=1, interpret=True)
    np.testing.assert_allclose(np.asarray(ms[0]),
                               np.asarray(ref.mean_statistic),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(ll[0]), float(ref.loglikelihood),
                               rtol=1e-4)


def test_fused_statistically_matches_gather():
    """Score estimator means agree within Monte-Carlo error."""
    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    T, N, R = 20, 64, 60
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), params, T)
    ys = ys.astype(jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    pv = float(svm.stationary_variance(params))

    gather = jax.jit(lambda k: buffered.run_buffered_pf(
        svm.KERNEL, svm.grad_statistic, params, ys, key=k, n_particles=N,
        statistic_dim=3, smoother="poyiadjis_N", resampler="systematic",
        resample_mode="gather", prior_mean=0.0, prior_var=pv))
    g = np.stack([np.asarray(gather(jax.random.fold_in(
        jax.random.PRNGKey(10), i)).mean_statistic) for i in range(R)])

    f = np.stack([np.asarray(fused_pf_score(
        svm.FUSED, jax.random.fold_in(jax.random.PRNGKey(20), i), params,
        ys, w, N, 0.0, pv, interpret=True)[0]) for i in range(R)])

    se = np.sqrt(g.std(0) ** 2 + f.std(0) ** 2) / np.sqrt(R)
    assert np.all(np.abs(g.mean(0) - f.mean(0)) < 4 * se + 1e-3), \
        (g.mean(0), f.mean(0), se)


def test_fused_vmap_collapses_to_batch():
    """vmap over chains must give the same numbers as the direct batch."""
    params = svm.from_scalars(A=0.8, Q=0.7, R=1.2, dtype=jnp.float32)
    T, N, C = 12, 32, 4
    ys, _ = svm.generate_data(jax.random.PRNGKey(2), params, T)
    ys = ys.astype(jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    pv = float(svm.stationary_variance(params))
    keys = jax.random.split(jax.random.PRNGKey(5), C)

    ms_v, ll_v = jax.vmap(lambda k: fused_pf_score(
        svm.FUSED, k, params, ys, w, N, 0.0, pv, interpret=True))(keys)
    ms_s = jnp.stack([fused_pf_score(svm.FUSED, k, params, ys, w, N,
                                     0.0, pv, interpret=True)[0]
                      for k in keys])
    np.testing.assert_allclose(np.asarray(ms_v), np.asarray(ms_s),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kernel_name", ["optimal", "prior"])
def test_garch_fused_statistically_matches_gather(kernel_name):
    """GARCH (2-D particle state, deterministic sigma^2 carry) fused vs
    unfused score means within Monte-Carlo error."""
    from sgmcmc_tpu.models import garch
    params = garch.from_alpha_beta_gamma(0.1, 0.6, 0.2, R=0.5,
                                         dtype=jnp.float32)
    T, N, R = 20, 64, 60
    ys, _ = garch.generate_data(jax.random.PRNGKey(0), params, T)
    ys = ys.astype(jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    pv = float(garch.stationary_variance(params))

    kern = garch.get_kernel(kernel_name)
    fused = garch.get_fused(kernel_name)
    gather = jax.jit(lambda k: buffered.run_buffered_pf(
        kern, garch.grad_statistic, params, ys, key=k, n_particles=N,
        statistic_dim=4, smoother="poyiadjis_N", resampler="systematic",
        resample_mode="gather", prior_mean=0.0, prior_var=pv))
    g = np.stack([np.asarray(gather(jax.random.fold_in(
        jax.random.PRNGKey(10), i)).mean_statistic) for i in range(R)])

    f = np.stack([np.asarray(fused_pf_score(
        fused, jax.random.fold_in(jax.random.PRNGKey(20), i), params,
        ys, w, N, 0.0, pv, interpret=True)[0]) for i in range(R)])

    se = np.sqrt(g.std(0) ** 2 + f.std(0) ** 2) / np.sqrt(R)
    assert np.all(np.abs(g.mean(0) - f.mean(0)) < 4 * se + 1e-3), \
        (g.mean(0), f.mean(0), se)


@pytest.mark.parametrize("kernel_name", ["optimal", "prior"])
def test_lgssm_fused_matches_exact_kalman_gradient(kernel_name):
    """Fused PF score on the full window -> exact marginal gradient
    (the Kalman oracle, the reference's own correctness anchor:
    `gradient_error_fig_scripts/lgssm_grad_compare.py:59-79`)."""
    from sgmcmc_tpu.models import lgssm
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                 R=[[1.0]], dtype=jnp.float64)
    T, N, R = 16, 256, 80
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), params, T)
    exact = lgssm.gradient_marginal_loglikelihood(params, ys)
    exact_vec = np.array([
        float(exact.LRinv_vec[0]), float(exact.LQinv_vec[0]),
        float(exact.C[0, 0]), float(exact.A[0, 0])])

    p32 = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                 params)
    w = jnp.ones((T,), jnp.float32)
    fused = lgssm.get_fused(kernel_name)
    f = np.stack([np.asarray(fused_pf_score(
        fused, jax.random.fold_in(jax.random.PRNGKey(5), i), p32,
        ys.astype(jnp.float32), w, N, 0.0, 10.0, interpret=True)[0])
        for i in range(R)])
    se = f.std(0) / np.sqrt(R)
    z = (f.mean(0) - exact_vec) / (se + 1e-9)
    assert np.all(np.abs(z) < 5), (f.mean(0), exact_vec, se, z)


def test_fused_score_fn_integration():
    """make_pf_score_fn(resample_mode='fused') drives an SGLD chain."""
    from sgmcmc_tpu.inference import sgmcmc
    T = 60
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
    ys = ys.astype(jnp.float32)
    cfg = sgmcmc.PFScoreConfig(
        n_particles=32, subsequence_length=16, buffer_length=4,
        minibatch_size=1, smoother="poyiadjis_N", resampler="systematic",
        resample_mode="fused")
    score = sgmcmc.make_pf_score_fn(
        svm.KERNEL, svm.grad_statistic, 3, svm.unpack_grad, cfg, T,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        fused_model=svm.FUSED)
    grad, ll = score(jax.random.PRNGKey(3), true, ys)
    assert np.isfinite(float(ll))
    for leaf in jax.tree_util.tree_leaves(grad):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sampler_api_reaches_fused_kernel_options():
    """qp_merge / pipeline / rng flow from the high-level Sampler API into
    the fused kernel (PFScoreConfig plumbing), and pipelining is a pure
    reordering: bitwise-identical gradients at the same key."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgmcmc_tpu.inference.samplers import SVMSampler
    from sgmcmc_tpu.models import svm

    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, 64)
    kw = dict(N=32, subsequence_length=8, buffer_length=2,
              resampler="systematic", resample_mode="fused")

    def grad_with(**opts):
        s = SVMSampler(observations=ys, parameters=true, seed=9)
        return s.noisy_gradient(**kw, **opts)

    base = grad_with()
    piped = grad_with(pipeline=True)
    merged = grad_with(qp_merge=2, pipeline=True)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(piped)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for leaf in jax.tree_util.tree_leaves(merged):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_interleave_bitwise_identical():
    """Two-chain-block interleave (r5 perf probe, PFScoreConfig
    plumbing): a pure schedule reordering — bitwise-identical stat/ll
    on a vmapped chain batch (interpret mode exercises CB >= 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgmcmc_tpu.models import svm
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, 32)
    window = jnp.asarray(ys[:16], jnp.float32).reshape(16)
    sw = jnp.ones((16,), jnp.float32)
    pm, pv = 0.0, float(svm.stationary_variance(true))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)

    def run(il):
        f = jax.vmap(lambda k: fused_pf_score(
            svm.FUSED, k, true, window, sw, 32, pm, pv,
            interpret=True, interleave=il))
        return f(keys)

    s0, l0 = run(False)
    s1, l1 = run(True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
