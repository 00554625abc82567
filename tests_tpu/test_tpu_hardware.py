"""RUN_TPU=1 hardware lane: the `scripts/tpu_check_*.py` assertions as a
mechanical pytest module (VERDICT r3 weak #4) — fused-vs-gather
statistical agreement on the live chip, bitwise resample exactness,
in-kernel RNG agreement, sharded-path config forwarding (the 990cf56
regression class), and a coarse throughput floor.

All programs are small (T<=50, N<=256 for the statistical checks) so the
lane is dominated by first-compiles (~1-40 s each, cached after).
"""
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

R = 256          # replicate chains per estimator for the z-tests
Z_LIMIT = 5.0    # |z| < 5 on a mean over 256 replicates


def _model(name):
    if name == "svm":
        from sgmcmc_tpu.models import svm as m
        params = m.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
        return m, params, m.KERNEL, m.FUSED
    if name == "garch":
        from sgmcmc_tpu.models import garch as m
        params = m.from_alpha_beta_gamma(0.1, 0.6, 0.2, R=0.5,
                                         dtype=jnp.float32)
        return m, params, m.OPTIMAL_KERNEL, m.FUSED
    if name == "svjm":
        from sgmcmc_tpu.models import svjm as m
        params = m.from_scalars(A=0.9, Q=0.5, R=1.0, pJ=0.15, QJ=2.0,
                                dtype=jnp.float32)
        return m, params, m.KERNEL, m.FUSED
    if name == "lgssm":
        from sgmcmc_tpu.models import lgssm as m
        params = m.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]],
                                 R=[[1.0]], dtype=jnp.float32)
        return m, params, m.OPTIMAL_KERNEL, m.FUSED
    raise ValueError(name)


@pytest.mark.parametrize("name", ["svm", "garch", "svjm", "lgssm"])
def test_fused_vs_gather_statistical_agreement(name):
    """Mean Poyiadjis-O(N) score over R replicate chains: the fused Pallas
    window kernel and the unfused pallas2-resample path must agree within
    Monte-Carlo error on the real chip (scripts/tpu_check_fused_*.py)."""
    from sgmcmc_tpu.ops import buffered
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    m, params, kernel, fused = _model(name)
    T, N = 50, 256
    ys, _ = m.generate_data(jax.random.PRNGKey(0), params, T)
    ys = jnp.asarray(ys, jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    # lgssm's x0 prior is the fixed 10*I of the registry convention
    # (models/registry.py prior_mean_var); the nonlinear models use the
    # stationary variance
    pv = 10.0 if name == "lgssm" else float(m.stationary_variance(params))

    keys = jax.random.split(jax.random.PRNGKey(1), R)
    ms_f, ll_f = jax.jit(jax.vmap(lambda k: fused_pf_score(
        fused, k, params, ys, w, N, 0.0, pv)))(keys)
    ms_f, ll_f = np.asarray(ms_f), np.asarray(ll_f)

    stat_dim = (m.statistic_dim(1, 1) if name == "lgssm"
                else m.STATISTIC_DIM)

    def unfused(k):
        o = buffered.run_buffered_pf(
            kernel, m.grad_statistic, params, ys, key=k, n_particles=N,
            statistic_dim=stat_dim, smoother="poyiadjis_N",
            resampler="systematic", resample_mode="pallas2",
            prior_mean=0.0, prior_var=pv)
        return o.mean_statistic, o.loglikelihood

    keys2 = jax.random.split(jax.random.PRNGKey(2), R)
    ms_u, ll_u = jax.jit(jax.vmap(unfused))(keys2)
    ms_u, ll_u = np.asarray(ms_u), np.asarray(ll_u)

    assert np.all(np.isfinite(ms_f)) and np.all(np.isfinite(ll_f))
    se = np.sqrt(ms_f.std(0) ** 2 + ms_u.std(0) ** 2) / np.sqrt(R) + 1e-9
    z = (ms_f.mean(0) - ms_u.mean(0)) / se
    z_ll = (ll_f.mean() - ll_u.mean()) / np.sqrt(
        ll_f.std() ** 2 / R + ll_u.std() ** 2 / R + 1e-12)
    assert np.all(np.abs(z) < Z_LIMIT), (name, z)
    assert abs(z_ll) < Z_LIMIT, (name, z_ll)


def test_resample_selections_bitwise_exact():
    """Two-level Pallas resample selections == gather index semantics,
    bitwise, on hardware (guards XLA excess-precision elision of the bf16
    hi/lo CDF splits; scripts/tpu_check_resample.py)."""
    from sgmcmc_tpu.ops.pallas import resample as rs

    for N in [256, 1024]:
        for K in [1, 4, 8]:
            key = jax.random.PRNGKey(K + N)
            lw = jax.random.normal(key, (N,), jnp.float32)
            cdf = rs.weights_cdf(lw)
            pos = rs.resample_positions(
                "systematic", jax.random.fold_in(key, 2), N, cdf.dtype)
            tags = (jnp.arange(N, dtype=jnp.float32)[:, None]
                    * jnp.ones((1, K), jnp.float32))
            g = np.asarray(rs.resample_apply_gather(pos, cdf, tags))
            p2 = np.asarray(rs.resample_apply_pallas2(pos, cdf, tags))
            pb = np.asarray(rs.resample_apply_pallas2_batched(
                pos[None], cdf[None], tags[None], chain_block=1)[0])
            assert np.array_equal(g, p2), (N, K)
            assert np.array_equal(g, pb), (N, K)


def test_kernel_rng_vs_host_statistical():
    """rng='kernel' (hardware PRNG + in-kernel Box-Muller) and rng='host'
    give the same mean SVM score within MC error
    (scripts/tpu_check_kernel_rng.py)."""
    from sgmcmc_tpu.models import svm
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    T, N, C = 40, 256, 512
    ys, _ = svm.generate_data(jax.random.PRNGKey(1), params, T)
    ys = ys.astype(jnp.float32)
    w = jnp.ones((T,), jnp.float32)
    pv = float(svm.stationary_variance(params))

    def batch(rng):
        f = jax.jit(jax.vmap(lambda k: fused_pf_score(
            svm.FUSED, k, params, ys, w, N, 0.0, pv, rng=rng)[0]))
        return np.asarray(f(jax.random.split(jax.random.PRNGKey(7), C)))

    h, k = batch("host"), batch("kernel")
    se = np.sqrt(h.std(0) ** 2 / C + k.std(0) ** 2 / C) + 1e-9
    z = (h.mean(0) - k.mean(0)) / se
    assert np.all(np.abs(z) < Z_LIMIT), z


def test_sharded_step_executes_with_kernel_rng():
    """The distributed sharded step with rng='kernel' runs the true fused
    kernel on a 1-device mesh and produces finite updates — the execution
    half of the 990cf56 regression (the structural config-forwarding
    assertion runs in the CPU suite, tests/test_parallel.py)."""
    from jax.sharding import Mesh

    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.models import svm
    from sgmcmc_tpu.parallel import training

    T, C = 200, 64
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float32)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
    ys = ys.astype(jnp.float32)
    cfg = sgmcmc.PFScoreConfig(
        n_particles=256, subsequence_length=32, buffer_length=8,
        smoother="poyiadjis_N", resampler="systematic",
        resample_mode="auto", rng="kernel")
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("chain", "particle"))
    prior = svm.default_prior()
    step = training.make_distributed_sgld_step(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        lambda p: svm.grad_logprior(prior, p), cfg, T, mesh, epsilon=0.1,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        project_fn=svm.project_parameters, fused_model=svm.FUSED)
    keys = jax.random.split(jax.random.PRNGKey(3), C)
    params = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0, dtype=jnp.float32))
    with mesh:
        new, ll = jax.jit(step)(keys, params, ys)
        lls = np.asarray(ll)
    assert np.all(np.isfinite(lls))
    assert np.all(np.isfinite(np.asarray(new.A)))


def test_fused_throughput_floor():
    """Coarse regression tripwire: the flagship fused SVM config at 2048
    chains must exceed 20k aggregate SGLD steps/s (measured 40.5k,
    BENCH_NOTES per-model table; a 2x regression fails)."""
    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.models import svm

    N_CHAINS, ITERS, T = 2048, 10, 1000
    key = jax.random.PRNGKey(0)
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.fold_in(key, 1), true, T)
    cfg = sgmcmc.PFScoreConfig(
        n_particles=1024, subsequence_length=40, buffer_length=10,
        smoother="poyiadjis_N", resampler="systematic",
        resample_mode="auto", rng="kernel")
    score = sgmcmc.make_pf_score_fn(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        cfg, T, prior_mean_var_fn=lambda p: (0.0,
                                             svm.stationary_variance(p)),
        fused_model=svm.FUSED)
    prior = svm.default_prior()
    gf = sgmcmc.make_noisy_grad_fn(
        score, lambda p: svm.grad_logprior(prior, p), T)

    def chain_step(k, p, obs):
        new, ll = sgmcmc.sgld_step(k, p, obs, gf, epsilon=0.1, T=T)
        return svm.project_parameters(new), ll

    def iters(keys, params, obs):
        def body(p, i):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            return jax.vmap(chain_step, in_axes=(0, 0, None))(ks, p, obs)
        return jax.lax.scan(body, params,
                            jnp.arange(ITERS, dtype=jnp.int32))

    fit = jax.jit(iters)
    keys = jax.random.split(jax.random.fold_in(key, 2), N_CHAINS)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_CHAINS,) + x.shape),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0))
    p, ll = fit(keys, params0, ys)
    float(jnp.sum(ll[-1]))          # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    p, ll = fit(keys, p, ys)
    float(jnp.sum(ll[-1]))
    dt = time.perf_counter() - t0
    steps_per_s = N_CHAINS * ITERS / dt
    print(f"\n[throughput] {steps_per_s:.0f} aggregate SGLD steps/s")
    assert steps_per_s > 20000.0, steps_per_s
