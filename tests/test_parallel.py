"""Mesh-sharded PF and training step on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sgmcmc_tpu.inference import sgmcmc
from sgmcmc_tpu.models import lgssm, svm
from sgmcmc_tpu.parallel import pf_shard, sharding, training


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return sharding.make_mesh(n_chain_devices=4, n_particle_devices=2)


def test_sharded_pf_gradient_matches_kalman(mesh):
    """Particle-sharded Poyiadjis O(N) score ~= exact Kalman gradient."""
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(0), params, 20)
    exact = lgssm.gradient_marginal_loglikelihood(params, ys)
    expected = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])

    n_total, n_shards = 512, 2

    def local(key, obs):
        return pf_shard.run_buffered_pf_sharded(
            lgssm.get_kernel("optimal"), lgssm.grad_statistic, params, obs,
            key=key, n_local=n_total // n_shards,
            statistic_dim=lgssm.statistic_dim(1, 1),
            smoother="poyiadjis_N",
            prior_mean=jnp.zeros(1, ys.dtype),
            prior_var=10.0 * jnp.eye(1, dtype=ys.dtype))

    f = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                  out_specs=(P(), P()), check_vma=False)
    # out_specs P() would require replicated outputs; mean_stat/loglik are
    # psum-reduced so they are replicated — assert via one shard
    f = jax.jit(f)

    reps = 12
    stats = []
    for i in range(reps):
        mean_stat, ll = f(jax.random.PRNGKey(100 + i), ys)
        stats.append(np.asarray(mean_stat))
        assert np.isfinite(float(ll))
    mean_stat = np.mean(stats, axis=0)
    se = np.std(stats, axis=0) / np.sqrt(reps)
    err = np.abs(mean_stat - expected)
    assert np.all(err < 5 * se + 0.05 * np.abs(expected) + 0.05), (
        mean_stat, expected, se)


def test_sharded_pf_loglik_matches_kalman(mesh):
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(1), params, 20)
    exact_ll = float(lgssm.marginal_loglikelihood(params, ys))

    def local(key, obs):
        return pf_shard.run_buffered_pf_sharded(
            lgssm.get_kernel("optimal"), lgssm.suff_statistic, params, obs,
            key=key, n_local=256, statistic_dim=3, smoother="filter",
            prior_mean=jnp.zeros(1, ys.dtype),
            prior_var=10.0 * jnp.eye(1, dtype=ys.dtype))

    f = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P()),
                          out_specs=(P(), P()), check_vma=False))
    lls = [float(f(jax.random.PRNGKey(200 + i), ys)[1]) for i in range(10)]
    assert abs(np.mean(lls) - exact_ll) < 0.05 * abs(exact_ll)


def test_distributed_sgld_step_runs_and_is_deterministic(mesh):
    """8 chains over a (4, 2) mesh; identical keys -> identical chains."""
    T = 64
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
    prior = svm.default_prior(dtype=jnp.float64)
    cfg = sgmcmc.PFScoreConfig(n_particles=64, subsequence_length=16,
                               buffer_length=4, smoother="poyiadjis_N")
    step = training.make_distributed_sgld_step(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        lambda p: svm.grad_logprior(prior, p), cfg, T, mesh, epsilon=0.05,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        project_fn=svm.project_parameters)

    n_chains = 8
    same_key = jax.random.PRNGKey(7)
    keys = jnp.broadcast_to(same_key, (n_chains,) + same_key.shape)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0, dtype=jnp.float64))
    new, ll = jax.jit(step)(keys, params0, ys)
    for leaf in jax.tree_util.tree_leaves(new):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr))
        # all chains identical since keys identical
        np.testing.assert_allclose(arr, np.broadcast_to(arr[:1], arr.shape),
                                   rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(ll)))


def test_distributed_fit_moves_toward_truth(mesh):
    T = 256
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(3), true, T)
    prior = svm.default_prior(dtype=jnp.float64)
    cfg = sgmcmc.PFScoreConfig(n_particles=64, subsequence_length=32,
                               buffer_length=8, smoother="poyiadjis_N")
    step = training.make_distributed_sgld_step(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        lambda p: svm.grad_logprior(prior, p), cfg, T, mesh, epsilon=0.1,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        project_fn=svm.project_parameters)
    fit = training.make_distributed_fit(step, num_iters=60)

    n_chains = 8
    keys = jax.random.split(jax.random.PRNGKey(4), n_chains)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape),
        svm.from_scalars(A=0.2, Q=1.5, R=2.5, dtype=jnp.float64))
    final, ll = fit(keys, params0, ys)
    A_final = np.asarray(final.A)[:, 0, 0]
    assert np.all(np.isfinite(A_final))
    # chains differ (different keys) and drift toward truth 0.9 from 0.2
    assert A_final.std() > 0
    assert A_final.mean() > 0.5, A_final


def test_initialize_multi_host_single_process():
    """`initialize_multi_host` bootstraps jax.distributed and returns the
    global chain mesh (run in a subprocess — the distributed client is
    process-global state)."""
    import subprocess
    import sys

    code = (
        "import os;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=4';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from sgmcmc_tpu.parallel.sharding import initialize_multi_host;"
        "mesh = initialize_multi_host("
        "coordinator_address='localhost:12431', num_processes=1,"
        "process_id=0);"
        "assert dict(mesh.shape) == {'chain': 4, 'particle': 1};"
        "assert jax.process_count() == 1;"
        "print('ok')")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=240,
                         env={**__import__('os').environ,
                              "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_sharded_paris_matches_kalman(mesh):
    """Particle-sharded PaRIS score ~= exact Kalman gradient (sharded
    feature-gap item: VERDICT r1 #3)."""
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(5), params, 16)
    exact = lgssm.gradient_marginal_loglikelihood(params, ys)
    expected = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])

    def local(key, obs):
        return pf_shard.run_buffered_pf_sharded(
            lgssm.get_kernel("optimal"), lgssm.grad_statistic, params, obs,
            key=key, n_local=256, statistic_dim=lgssm.statistic_dim(1, 1),
            smoother="paris", n_tilde=2,
            prior_mean=jnp.zeros(1, ys.dtype),
            prior_var=10.0 * jnp.eye(1, dtype=ys.dtype))

    f = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P()),
                          out_specs=(P(), P()), check_vma=False))
    reps = 12
    stats = []
    for i in range(reps):
        mean_stat, ll = f(jax.random.PRNGKey(300 + i), ys)
        stats.append(np.asarray(mean_stat))
        assert np.isfinite(float(ll))
    mean_stat = np.mean(stats, axis=0)
    se = np.std(stats, axis=0) / np.sqrt(reps)
    err = np.abs(mean_stat - expected)
    assert np.all(err < 5 * se + 0.05 * np.abs(expected) + 0.05), (
        mean_stat, expected, se)


def test_sharded_n2_bw_chunk_matches_dense(mesh):
    """bw_chunk streaming of the sharded [N_loc, N] block changes only GEMM
    tiling: chunked == dense for identical keys."""
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(6), params, 10)

    def make(bw_chunk):
        def local(key, obs):
            return pf_shard.run_buffered_pf_sharded(
                lgssm.get_kernel("optimal"), lgssm.grad_statistic, params,
                obs, key=key, n_local=128,
                statistic_dim=lgssm.statistic_dim(1, 1),
                smoother="poyiadjis_N2", bw_chunk=bw_chunk,
                prior_mean=jnp.zeros(1, ys.dtype),
                prior_var=10.0 * jnp.eye(1, dtype=ys.dtype))
        return jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P()),
                                 out_specs=(P(), P()), check_vma=False))

    key = jax.random.PRNGKey(77)
    dense_stat, dense_ll = make(None)(key, ys)
    chunk_stat, chunk_ll = make(32)(key, ys)
    np.testing.assert_allclose(np.asarray(chunk_stat),
                               np.asarray(dense_stat), rtol=1e-6)
    np.testing.assert_allclose(float(chunk_ll), float(dense_ll), rtol=1e-9)


def test_sharded_ess_threshold_matches_kalman(mesh):
    """Globally-ESS-gated adaptive resampling stays a valid estimator:
    sharded filter loglik with ess_threshold ~= exact Kalman loglik."""
    params = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]], R=[[0.7]])
    ys, _ = lgssm.generate_data(jax.random.PRNGKey(8), params, 20)
    exact_ll = float(lgssm.marginal_loglikelihood(params, ys))

    def local(key, obs):
        return pf_shard.run_buffered_pf_sharded(
            lgssm.get_kernel("optimal"), lgssm.suff_statistic, params, obs,
            key=key, n_local=256, statistic_dim=3, smoother="filter",
            ess_threshold=0.5,
            prior_mean=jnp.zeros(1, ys.dtype),
            prior_var=10.0 * jnp.eye(1, dtype=ys.dtype))

    f = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P()),
                          out_specs=(P(), P()), check_vma=False))
    lls = [float(f(jax.random.PRNGKey(400 + i), ys)[1]) for i in range(10)]
    assert abs(np.mean(lls) - exact_ll) < 0.05 * abs(exact_ll), (
        np.mean(lls), exact_ll)


def test_island_fused_distributed_step(mesh):
    """island_fused: the fused Pallas window kernel runs per particle shard
    (interpret mode on CPU) and the psum-averaged island scores drive a
    working SGLD step."""
    T = 32
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.PRNGKey(9), true, T)
    prior = svm.default_prior()
    cfg = sgmcmc.PFScoreConfig(n_particles=32, subsequence_length=8,
                               buffer_length=2, smoother="poyiadjis_N",
                               resampler="systematic",
                               resample_mode="fused")
    step = training.make_distributed_sgld_step(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        lambda p: svm.grad_logprior(prior, p), cfg, T, mesh, epsilon=0.05,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        project_fn=svm.project_parameters, fused_model=svm.get_fused(None),
        island_fused=True)
    n_chains = 8
    keys = jax.random.split(jax.random.PRNGKey(10), n_chains)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32),
                                   (n_chains,) + jnp.shape(x)),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0))
    new, ll = jax.jit(step)(keys, params0, jnp.asarray(ys, jnp.float32))
    for leaf in jax.tree_util.tree_leaves(new):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.all(np.isfinite(np.asarray(ll)))


def test_island_fused_expectation_matches_single_island_filter(mesh):
    """Statistical contract of island_fused (`parallel/training.py`): the
    psum-average of P independent per-island fused filters has the SAME
    expectation as one island-size filter — so the island-mode smoother
    bias is exactly the Poyiadjis bias at N = island size (Vergé et al.
    2015; measured curve in scripts/island_bias_sweep.json).  Verified on
    the LGSSM against both the single-island fused estimator and the
    exact Kalman gradient oracle."""
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    W, n_loc = 12, 16
    params64 = lgssm.from_matrices(A=[[0.8]], C=[[1.0]], Q=[[0.5]],
                                   R=[[0.7]])
    ys64, _ = lgssm.generate_data(jax.random.PRNGKey(21), params64, W)
    exact = lgssm.gradient_marginal_loglikelihood(params64, ys64)
    exact_vec = np.concatenate([
        np.asarray(exact.LRinv_vec), np.asarray(exact.LQinv_vec),
        np.asarray(exact.C).ravel(), np.asarray(exact.A).ravel()])

    fm = lgssm.get_fused(None)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params64)
    ys = jnp.asarray(ys64, jnp.float32).reshape(W, 1)
    step_w = jnp.ones((W,), jnp.float32)

    def island_local(key):
        # the exact structure of training.py's island branch: fold the
        # particle-axis index into the key, run the per-shard fused
        # filter, psum-average
        k = jax.random.fold_in(key, jax.lax.axis_index("particle"))
        stat, ll = fused_pf_score(fm, k, params, ys, step_w, n_loc,
                                  jnp.zeros((), jnp.float32),
                                  jnp.asarray(10.0, jnp.float32),
                                  lambduh=1.0, interpret=True)
        Pn = 2.0
        return (jax.lax.psum(stat, "particle") / Pn,
                jax.lax.psum(ll, "particle") / Pn)

    island = jax.jit(shard_map(island_local, mesh=mesh, in_specs=P(),
                               out_specs=(P(), P()), check_vma=False))

    def single(key):
        return fused_pf_score(fm, key, params, ys, step_w, n_loc,
                              jnp.zeros((), jnp.float32),
                              jnp.asarray(10.0, jnp.float32),
                              lambduh=1.0, interpret=True)

    single = jax.jit(single)

    reps = 24
    isl, sgl = [], []
    for i in range(reps):
        s_i, _ = island(jax.random.PRNGKey(500 + i))
        s_s, _ = single(jax.random.PRNGKey(900 + i))
        isl.append(np.asarray(s_i, np.float64))
        sgl.append(np.asarray(s_s, np.float64))
    isl, sgl = np.stack(isl), np.stack(sgl)
    # same expectation: island average vs single island-size filter
    se = np.sqrt(isl.var(axis=0) / reps + sgl.var(axis=0) / reps)
    diff = np.abs(isl.mean(axis=0) - sgl.mean(axis=0))
    assert np.all(diff < 5 * se + 0.05), (isl.mean(0), sgl.mean(0), se)
    # and both see the Kalman oracle through the N=16 Poyiadjis bias:
    # loose sanity bound (the TPU-measured curve at N=64 is already
    # max|bias| < 0.1; N=16 here only needs the right order of magnitude)
    bias = np.abs(isl.mean(axis=0) - exact_vec)
    se_i = np.sqrt(isl.var(axis=0) / reps)
    assert np.all(bias < 5 * se_i + 0.30 * np.abs(exact_vec) + 0.30), (
        isl.mean(0), exact_vec)


def test_island_bias_curve_artifact():
    """Regression-lock on the measured island-bias curve
    (`scripts/island_bias_sweep.json`, TPU-measured): bias decays with
    island size, and the recommended minimum island size (256, the
    `make_distributed_sgld_step` warning threshold) keeps the island bias
    at or below the Nemeth lambda=0.95 bias the reference ships as a
    default smoother trade."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "island_bias_sweep.json")
    with open(path) as f:
        data = json.load(f)
    if "rows" in data:          # legacy flat (lgssm-only) layout
        data = {"lgssm": data}
    assert "lgssm" in data      # the r4 layout is one entry per model
    for model, result in data.items():
        rows = {(r["label"], r["N"]): r for r in result["rows"]}
        island = sorted((n, r["max_abs_bias"])
                        for (lbl, n), r in rows.items()
                        if lbl.startswith("island"))
        assert len(island) >= 4, model
        # monotone decay across the sweep; the large-island tail sits at
        # the replicate-noise floor (se ~ bias there), so allow 1.5x
        # point-to-point jitter
        sizes, biases = zip(*island)
        assert biases[-1] < 0.25 * biases[0], (model, island)
        assert all(b2 < b1 * 1.5 for b1, b2 in zip(biases, biases[1:])), \
            (model, island)
        nemeth = rows[("nemeth lambda=0.95 (gather)", 1024)]["max_abs_bias"]
        bias_256 = dict(island)[256]
        assert bias_256 <= nemeth * 1.1, (model, bias_256, nemeth)


def test_island_fused_small_island_warns(mesh):
    """make_distributed_sgld_step warns when island_fused would run with
    < 256 particles per device (the measured bias-curve threshold)."""
    import warnings

    cfg = sgmcmc.PFScoreConfig(n_particles=32, subsequence_length=8,
                               buffer_length=2, smoother="poyiadjis_N",
                               resampler="systematic",
                               resample_mode="fused")
    prior = svm.default_prior()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        training.make_distributed_sgld_step(
            svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM,
            svm.unpack_grad, lambda p: svm.grad_logprior(prior, p), cfg,
            32, mesh, epsilon=0.05, fused_model=svm.get_fused(None),
            island_fused=True)
    assert any("island size" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]


def _run_two_process(child: str, pattern: str, attempts: int = 2):
    """Spawn two coordinated child processes on a fresh port and return
    the two matched floats.  The bind-then-close port pick is a TOCTOU
    race (another process can claim the port before gloo binds it), so a
    failed attempt retries once with a new port before failing."""
    import os
    import re
    import socket
    import subprocess
    import sys

    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    cwd = os.path.join(os.path.dirname(__file__), "..")
    last = None
    for _ in range(attempts):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, "-c", child, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=cwd) for i in range(2)]
        try:
            outs = [p.communicate(timeout=280)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()           # exact child PIDs, never a pattern
            last = "timeout (port race?)"
            continue
        vals = [re.search(pattern, o) for o in outs]
        if all(p.returncode == 0 for p in procs) and all(vals):
            return [float(v.group(1)) for v in vals]
        last = [o[-2000:] for o in outs]
    raise AssertionError(f"two-process run failed: {last}")


def test_two_process_distributed_step_agrees():
    """TRUE multi-process validation: two OS processes, each with 4
    virtual CPU devices, form one 8-device global mesh via
    `initialize_multi_host` (gloo coordinator), run the distributed SGLD
    step on globally-sharded chain states, and all-reduce the summed
    loglikelihood across hosts — both processes must see the identical
    scalar.  Exercises the cross-host collective path the single-process
    coordinator test cannot."""
    import textwrap

    child = textwrap.dedent("""
        import os, sys
        pid = int(sys.argv[1]); port = sys.argv[2]
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from sgmcmc_tpu.parallel.sharding import (initialize_multi_host,
                                                  shard_chain_states)
        from sgmcmc_tpu.parallel import training
        from sgmcmc_tpu.inference import sgmcmc
        from sgmcmc_tpu.models import svm

        mesh = initialize_multi_host(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2
        assert len(jax.devices()) == 8
        T = 32
        true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
        ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
        prior = svm.default_prior()
        cfg = sgmcmc.PFScoreConfig(n_particles=16, subsequence_length=8,
                                   buffer_length=2,
                                   smoother="poyiadjis_N")
        step = training.make_distributed_sgld_step(
            svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM,
            svm.unpack_grad, lambda p: svm.grad_logprior(prior, p), cfg,
            T, mesh, epsilon=0.05,
            prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
            project_fn=svm.project_parameters)
        keys = jax.random.split(jax.random.PRNGKey(1), 8)
        params0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (8,) + x.shape),
            svm.from_scalars(A=0.5, Q=1.0, R=2.0))
        keys = shard_chain_states(mesh, keys)
        params0 = shard_chain_states(mesh, params0)

        @jax.jit
        def run(k, p, o):
            new, ll = step(k, p, o)
            return new, jnp.sum(ll)     # cross-process all-reduce

        new, tot = run(keys, params0, ys)
        print(f"total_ll {float(tot):.9f}", flush=True)
    """)
    a, b = _run_two_process(child, r"total_ll (-?\d+\.\d+)")
    assert a == b, (a, b)
    assert np.isfinite(a)


def test_two_process_cross_host_particle_sharding_agrees():
    """Particle axis CROSSING the host boundary: 2 processes x 4 devices,
    mesh (chain=4, particle=2) with each particle pair spanning both
    processes — the PF's internal psum/all_gather (global resampling
    comb, log-normalization) run as real cross-process collectives.
    Both processes must compute the identical all-reduced loglik."""
    import textwrap

    child = textwrap.dedent("""
        import os, sys
        pid = int(sys.argv[1]); port = sys.argv[2]
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from sgmcmc_tpu.parallel.sharding import (initialize_multi_host,
                                                  make_mesh,
                                                  shard_chain_states)
        from sgmcmc_tpu.parallel import training
        from sgmcmc_tpu.inference import sgmcmc
        from sgmcmc_tpu.models import svm

        initialize_multi_host(coordinator_address=f"127.0.0.1:{port}",
                              num_processes=2, process_id=pid)
        devs = jax.devices()
        grid = [[devs[i], devs[4 + i]] for i in range(4)]
        mesh = make_mesh(n_chain_devices=4, n_particle_devices=2,
                         devices=[d for row in grid for d in row])
        T = 24
        true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
        ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
        prior = svm.default_prior()
        cfg = sgmcmc.PFScoreConfig(n_particles=32, subsequence_length=8,
                                   buffer_length=2,
                                   smoother="poyiadjis_N")
        step = training.make_distributed_sgld_step(
            svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM,
            svm.unpack_grad, lambda p: svm.grad_logprior(prior, p), cfg,
            T, mesh, epsilon=0.05,
            prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
            project_fn=svm.project_parameters)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        params0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (4,) + x.shape),
            svm.from_scalars(A=0.5, Q=1.0, R=2.0))
        keys = shard_chain_states(mesh, keys)
        params0 = shard_chain_states(mesh, params0)

        @jax.jit
        def run(k, p, o):
            new, ll = step(k, p, o)
            return new, jnp.sum(ll)

        new, tot = run(keys, params0, ys)
        print(f"ptotal {float(tot):.9f}", flush=True)
    """)
    a, b = _run_two_process(child, r"ptotal (-?\d+\.\d+)")
    assert a == b and np.isfinite(a), (a, b)


def test_sharded_path_forwards_fused_kernel_config(monkeypatch):
    """990cf56 regression class: `make_distributed_sgld_step` must forward
    the PFScoreConfig's rng / ess_threshold / qp_merge / pipeline into the
    fused Pallas kernel — a silently-dropped `rng='kernel'` once streamed
    host normals and cost 3.5% on hardware (BENCH_NOTES).  Structural
    check on the CPU mesh; the execution half runs in the RUN_TPU lane
    (tests_tpu/test_tpu_hardware.py)."""
    from sgmcmc_tpu.ops.pallas import fused_pf

    captured = {}
    orig = fused_pf.fused_pf_score

    def spy(*args, **kw):
        for k in ("rng", "ess_threshold", "qp_merge", "pipeline"):
            captured[k] = kw.get(k)
        # execute with host RNG (the in-kernel TPU PRNG does not exist on
        # the CPU interpret path); the assertion is about what the
        # sharded builder FORWARDED, which is already captured
        kw["rng"] = "host"
        return orig(*args, **kw)

    monkeypatch.setattr(fused_pf, "fused_pf_score", spy)
    T = 64
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, T)
    prior = svm.default_prior(dtype=jnp.float64)
    cfg = sgmcmc.PFScoreConfig(
        n_particles=64, subsequence_length=16, buffer_length=4,
        smoother="poyiadjis_N", resampler="systematic", rng="kernel",
        ess_threshold=0.5, qp_merge=2, pipeline=True,
        resample_mode="fused")    # force the fused path off-TPU (interpret)
    mesh1 = sharding.make_mesh(n_chain_devices=2, n_particle_devices=1)
    step = training.make_distributed_sgld_step(
        svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM, svm.unpack_grad,
        lambda p: svm.grad_logprior(prior, p), cfg, T, mesh1, epsilon=0.05,
        prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
        project_fn=svm.project_parameters, fused_model=svm.FUSED)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + x.shape),
        svm.from_scalars(A=0.5, Q=1.0, R=2.0, dtype=jnp.float64))
    new, ll = jax.jit(step)(keys, params0, ys)
    assert np.all(np.isfinite(np.asarray(ll)))
    assert captured == dict(rng="kernel", ess_threshold=0.5, qp_merge=2,
                            pipeline=True), captured
