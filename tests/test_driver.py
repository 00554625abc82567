"""End-to-end experiment-driver smoke test (setup -> fit -> eval -> ksd ->
process_out -> plots) in a temp directory with tiny sizes."""
import os

import numpy as np
import pandas as pd
import pytest

from sgmcmc_tpu.experiments import config as cfg
from sgmcmc_tpu.experiments import driver


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("exp"))


def make_args(exp_dir, **over):
    argv = ["--path", exp_dir, "--model", "svm", "--T", "64",
            "--T_test", "64"]
    args = driver.build_parser().parse_args(argv)
    for k, v in over.items():
        setattr(args, k, v)
    return args


def small_grid():
    return cfg.parameter_grid(dict(
        iter_type=["SGLD"], epsilon=[0.1], subsequence_length=[16],
        buffer_length=[4], steps_per_iteration=[2], pf=["poyiadjis_N"],
        N=[32], name=["TEST"], max_time=[3], checkpoint_num_iters=[5]))


def test_full_pipeline(exp_dir):
    args = make_args(exp_dir, max_time=3.0, eval_N=64, ksd_N=32,
                     num_to_eval=4, max_ksd_samples=5)
    options_list = driver.do_setup(args, sampler_grid=small_grid())
    assert len(options_list) == 2  # x init_methods {prior, truth}
    assert os.path.exists(os.path.join(exp_dir, "in", "options.csv"))

    for o in options_list:
        driver.do_fit(args, o)
        trace_path = os.path.join(exp_dir, "out", "fit",
                                  f"{o['experiment_id']}_parameters.p")
        assert os.path.exists(trace_path)
    # single-chain fits emit split-chain convergence rows once the trace
    # is long enough (>= 8 recorded iterates; the first option's budget
    # is compile-dominated, the second runs warm-cache)
    o = options_list[-1]
    conv = pd.read_csv(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_convergence.csv"))
    assert {"variable", "rhat", "ess", "iact"} <= set(conv.columns)
    assert np.all(np.isfinite(conv["rhat"]))
    assert (conv["num_chains"] == 1).all()

    driver.do_eval(args, options_list[0], "half_avg_train")
    eval_path = os.path.join(exp_dir, "out", "eval",
                             "0_half_avg_train_metrics.csv")
    assert os.path.exists(eval_path)
    df = pd.read_csv(eval_path)
    assert {"metric", "variable", "value"} <= set(df.columns)
    assert np.all(np.isfinite(df["value"]))

    driver.do_eval_ksd(args, options_list[0])
    ksd_path = os.path.join(exp_dir, "out", "trace_eval", "0_ksd.csv")
    ksd = pd.read_csv(ksd_path)
    assert np.all(np.isfinite(ksd["value"]))

    agg = driver.do_process_out(args, options_list)
    assert agg is not None and len(agg) > 0

    driver.do_make_plots(args, options_list)
    figs = os.listdir(os.path.join(exp_dir, "processed", "figures"))
    assert len(figs) > 0

    driver.do_make_scripts(args, options_list)
    scripts = os.listdir(os.path.join(exp_dir, "scripts"))
    assert any(s.startswith("fit_script") for s in scripts)
    assert "run_all.sh" in scripts


def test_fit_resume(exp_dir):
    """Crash-checkpoint resume: rerunning fit picks up saved state."""
    args = make_args(exp_dir, max_time=1.0)
    options_list = driver.do_setup(args, sampler_grid=small_grid())
    o = options_list[0]
    driver.do_fit(args, o)
    state_path = os.path.join(exp_dir, "scratch",
                              f"fit_{o['experiment_id']}_state.p")
    assert os.path.exists(state_path)
    from sgmcmc_tpu.io import checkpoint as ckpt
    it1 = ckpt.load_pickle(state_path)["iteration"]
    driver.do_fit(args, o)     # resumes and adds more iterations
    it2 = ckpt.load_pickle(state_path)["iteration"]
    assert it2 >= it1


def test_hmm_models_full_pipeline(tmp_path):
    """`--model gauss_hmm` / `arphmm` through the L6 driver: setup -> fit
    (Gibbs + SGLD + SCIR grid) -> eval -> trace_eval(ksd) -> process_out
    (beyond-reference: the reference ships no HMM driver)."""
    for model in ["gauss_hmm", "arphmm"]:
        exp_dir = str(tmp_path / model)
        args = make_args(exp_dir, max_time=2.0, eval_N=32, ksd_N=32,
                         num_to_eval=3, max_ksd_samples=4)
        args.model = model
        args.T = 48
        args.T_test = 48
        # prior init: truth-init makes the logmse parameter metrics an
        # exact -inf (log10 of zero error) at iteration 0
        args.init_methods = ["prior"]
        grid = cfg.parameter_grid([
            dict(iter_type=["Gibbs"], name=["GIBBS"], max_time=[2],
                 checkpoint_num_iters=[5]),
            dict(iter_type=["SGLD"], kind=["marginal"], epsilon=[0.05],
                 subsequence_length=[16], buffer_length=[4],
                 steps_per_iteration=[2], name=["SGLD"], max_time=[2],
                 checkpoint_num_iters=[5]),
            dict(iter_type=["SCIR"], epsilon=[0.05],
                 subsequence_length=[16], buffer_length=[4],
                 steps_per_iteration=[2], name=["SCIR"], max_time=[2],
                 checkpoint_num_iters=[5]),
        ])
        options_list = driver.do_setup(args, sampler_grid=grid)
        assert len(options_list) == 3
        for o in options_list:
            driver.do_fit(args, o)
        driver.do_eval(args, options_list[1], "half_avg_train")
        eval_csv = os.path.join(
            exp_dir, "out", "eval",
            f"{options_list[1]['experiment_id']}_half_avg_train_metrics.csv")
        df = pd.read_csv(eval_csv)
        assert np.all(np.isfinite(df["value"]))
        driver.do_eval_ksd(args, options_list[1])
        ksd = pd.read_csv(os.path.join(
            exp_dir, "out", "trace_eval",
            f"{options_list[1]['experiment_id']}_ksd.csv"))
        assert set(ksd["variable"]) == set(driver.KSD_VARIABLES[model])
        assert np.all(np.isfinite(ksd["value"]))
        driver.do_eval_ks_test(args, options_list[1], options_list)
        kst = pd.read_csv(os.path.join(
            exp_dir, "out", "trace_eval",
            f"{options_list[1]['experiment_id']}_kstest.csv"))
        assert np.all(np.isfinite(kst["pvalue"]))
        agg = driver.do_process_out(args, options_list)
        assert agg is not None and len(agg) > 0


def test_slds_full_pipeline(tmp_path):
    """`--model slds` through the L6 driver: setup -> fit (Gibbs +
    complete-data SGLD) -> eval -> trace_eval(ksd) -> process_out
    (beyond-reference: the reference's slds/sampler.py is broken)."""
    exp_dir = str(tmp_path / "slds")
    args = make_args(exp_dir, max_time=2.0, eval_N=32, ksd_N=32,
                     num_to_eval=3, max_ksd_samples=4)
    args.model = "slds"
    args.T = 48
    args.T_test = 48
    args.init_methods = ["prior"]
    grid = cfg.parameter_grid([
        dict(iter_type=["Gibbs"], name=["GIBBS"], max_time=[2],
             checkpoint_num_iters=[5]),
        dict(iter_type=["SGLD"], epsilon=[0.02], subsequence_length=[16],
             buffer_length=[4], steps_per_iteration=[2], latent_draws=[1],
             latent_burnin=[2], name=["SGLD_COMPLETE"], max_time=[2],
             checkpoint_num_iters=[5]),
    ])
    options_list = driver.do_setup(args, sampler_grid=grid)
    assert len(options_list) == 2
    from sgmcmc_tpu.io import checkpoint as ckpt
    data = ckpt.load_pickle(os.path.join(exp_dir, "in", "data.p"))
    assert "latent_z" in data                  # (y, x, z) setup
    for o in options_list:
        driver.do_fit(args, o)
    driver.do_eval(args, options_list[1], "half_avg_train")
    df = pd.read_csv(os.path.join(
        exp_dir, "out", "eval",
        f"{options_list[1]['experiment_id']}_half_avg_train_metrics.csv"))
    assert np.all(np.isfinite(df["value"]))
    driver.do_eval_ksd(args, options_list[1])
    ksd = pd.read_csv(os.path.join(
        exp_dir, "out", "trace_eval",
        f"{options_list[1]['experiment_id']}_ksd.csv"))
    assert set(ksd["variable"]) == set(driver.KSD_VARIABLES["slds"])
    assert np.all(np.isfinite(ksd["value"]))
    driver.do_eval_ks_test(args, options_list[1], options_list)
    agg = driver.do_process_out(args, options_list)
    assert agg is not None and len(agg) > 0


def test_convert_gradient_exact_chain_rule():
    """Natural-coordinate scores from `convert_gradient` must equal
    autodiff of the same scalar function expressed in natural coordinates
    (the reference's converters use ad-hoc Jacobian factors; ours are the
    exact chain rule — documented delta)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgmcmc_tpu.experiments.driver import convert_gradient
    from sgmcmc_tpu.models import garch, lgssm, svm

    # SVM: (phi, sigma, tau) with LQinv = 1/sigma, LRinv = 1/tau
    p = svm.from_scalars(A=0.7, Q=0.5, R=1.3, dtype=jnp.float64)

    def f_storage(q):
        return (jnp.sum(q.A ** 2) + jnp.sum(jnp.sin(q.LQinv_vec))
                + jnp.sum(q.LRinv_vec ** 3))

    g = jax.grad(f_storage)(p)
    vals, gn = convert_gradient("svm", p, g)

    def f_nat(phi, sigma, tau):
        return (phi ** 2 + jnp.sin(1.0 / sigma) + (1.0 / tau) ** 3)

    gp, gs, gt = jax.grad(f_nat, argnums=(0, 1, 2))(
        jnp.float64(vals.phi[0]), jnp.float64(vals.sigma[0]),
        jnp.float64(vals.tau[0]))
    np.testing.assert_allclose(gn.phi[0], float(gp), rtol=1e-10)
    np.testing.assert_allclose(gn.sigma[0], float(gs), rtol=1e-10)
    np.testing.assert_allclose(gn.tau[0], float(gt), rtol=1e-10)

    # LGSSM: (A, Q, R) with Q = LQinv^-2
    pl = lgssm.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.1)
    gl = jax.grad(lambda q: jnp.sum(jnp.cos(q.LQinv_vec))
                  + jnp.sum(q.LRinv_vec ** 2))(pl)
    valsl, gnl = convert_gradient("lgssm", pl, gl)
    gQ = jax.grad(lambda Q: jnp.cos(Q ** -0.5))(jnp.float64(valsl.Q[0]))
    gR = jax.grad(lambda R: (R ** -0.5) ** 2)(jnp.float64(valsl.R[0]))
    np.testing.assert_allclose(gnl.Q[0], float(gQ), rtol=1e-10)
    np.testing.assert_allclose(gnl.R[0], float(gR), rtol=1e-10)

    # GARCH: tau = 1/LRinv, rest passthrough
    pg = garch.from_alpha_beta_gamma(alpha=0.1, beta=0.4,
                                 gamma=0.3, R=0.5,
                                 dtype=jnp.float64)
    gg = jax.grad(lambda q: jnp.sum(q.LRinv_vec ** 2)
                  + jnp.sum(q.log_mu))(pg)
    valsg, gng = convert_gradient("garch", pg, gg)
    gtau = jax.grad(lambda t: (1.0 / t) ** 2)(jnp.float64(valsg.tau[0]))
    np.testing.assert_allclose(gng.tau[0], float(gtau), rtol=1e-10)
    np.testing.assert_allclose(gng.log_mu, np.ravel(np.asarray(gg.log_mu)))


def test_ksd_state_resume(exp_dir):
    """KSD grad state checkpoints and resumes (the reference's KSD-state
    protocol, `svm/driver.py:968-999, 1068-1075`): a pre-existing state
    with a huge stored score must survive into the averaged output."""
    import jax
    import jax.numpy as jnp

    from sgmcmc_tpu.io import checkpoint as ckpt
    from sgmcmc_tpu.models import svm

    args = make_args(exp_dir, max_time=3.0, eval_N=64, ksd_N=32,
                     num_to_eval=3, max_ksd_samples=5, ksd_passes=1)
    options = ckpt.load_pickle(os.path.join(exp_dir, "in", "options.p"))
    o = options[0]
    trace = ckpt.load_trace(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
    plist = trace["parameters_list"]
    n = min(5, len(plist) - len(plist) // 3)
    big = svm.SVMParams(A=jnp.full((1, 1), 1e6),
                        LQinv_vec=jnp.full((1,), 1e6),
                        LRinv_vec=jnp.full((1,), 1e6))
    state_path = os.path.join(exp_dir, "scratch",
                              f"ksd_{o['experiment_id']}_state.p")
    ckpt.save_pickle(state_path,
                     dict(grad_sums=[big] + [None] * (n - 1), cur_index=1))
    driver.do_eval_ksd(args, o)
    csv = pd.read_csv(os.path.join(
        exp_dir, "out", "trace_eval", f"{o['experiment_id']}_ksd.csv"))
    assert float(csv["value"].max()) > 1e4   # the stored score dominated
    assert not os.path.exists(state_path)    # cleaned up on completion


def test_tqdm_to_logger_routes_progress_lines():
    """`TqdmToLogger` parity shim (`driver_utils.py:145-165`)."""
    import io
    import logging

    from sgmcmc_tpu.experiments.script_builder import TqdmToLogger

    logger = logging.getLogger("tqdm_test")
    logger.setLevel(logging.INFO)
    stream = io.StringIO()
    logger.addHandler(logging.StreamHandler(stream))
    out = TqdmToLogger(logger)
    out.write(" 50%|#####     | 5/10\r")
    out.flush()
    out.write("")
    out.flush()          # empty buffers are not logged
    assert stream.getvalue().strip() == "50%|#####     | 5/10"


def test_fit_eval_freq_throttles_metrics(tmp_path):
    """`eval_freq` is SECONDS between metric evaluations
    (`svm/driver.py:460-474`): with a huge eval_freq only the first
    in-loop evaluation fires, while parameters are still recorded every
    iteration; eval_freq=0 evaluates every iteration."""
    from sgmcmc_tpu.io import checkpoint as ckpt

    for freq, expect_sparse in [(10 ** 6, True), (0, False)]:
        exp_dir = str(tmp_path / f"freq_{freq}")
        args = make_args(exp_dir, max_time=30.0)
        grid = cfg.parameter_grid(dict(
            iter_type=["SGLD"], epsilon=[0.1], subsequence_length=[16],
            buffer_length=[4], steps_per_iteration=[1], pf=["poyiadjis_N"],
            N=[16], name=["T"], max_time=[30], max_num_iters=[20],
            eval_freq=[freq], checkpoint_num_iters=[10 ** 6]))
        options_list = driver.do_setup(args, sampler_grid=grid)
        o = options_list[0]
        driver.do_fit(args, o)
        trace = ckpt.load_trace(os.path.join(
            exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
        n_iters = len(trace["parameters_list"]) - 1
        df = pd.read_csv(os.path.join(
            exp_dir, "out", "fit", f"{o['experiment_id']}_metrics.csv"))
        # iteration 0 row comes from SamplerEvaluator init; in-loop rows
        # are throttled by eval_freq
        n_eval_iters = df["iteration"].nunique()
        assert n_iters >= 3
        if expect_sparse:
            # init row + first in-loop eval + forced final-iteration eval
            assert n_eval_iters <= 3, (n_eval_iters, n_iters)
            assert df["iteration"].max() == n_iters, (
                df["iteration"].max(), n_iters)   # final metrics exist
        else:
            assert n_eval_iters >= n_iters, (n_eval_iters, n_iters)


def test_multichain_fit_pipeline(tmp_path):
    """--num_chains 32: the fit phase runs 32 vmapped chains through
    `fit_scan(num_chains=...)`, writes convergence diagnostics
    (split-R-hat/ESS per coordinate), and the downstream eval/process_out
    phases work unchanged on the chain-0 trace view."""
    exp_dir = str(tmp_path / "mc")
    args = make_args(exp_dir, max_time=5.0, eval_N=32, num_to_eval=2,
                     num_chains=32)
    args.init_methods = ["prior"]
    grid = cfg.parameter_grid(dict(
        iter_type=["SGLD"], epsilon=[0.05], subsequence_length=[16],
        buffer_length=[4], steps_per_iteration=[1], pf=["poyiadjis_N"],
        N=[16], name=["MC"], max_time=[5], max_num_iters=[12],
        checkpoint_num_iters=[4]))
    options_list = driver.do_setup(args, sampler_grid=grid)
    o = options_list[0]
    driver.do_fit(args, o)

    from sgmcmc_tpu.io import checkpoint as ckpt
    trace = ckpt.load_trace(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
    assert trace["num_chains"] == 32
    assert trace["chain_parameters"].A.shape[0] == 32
    n = trace["chain_parameters"].A.shape[1]
    assert len(trace["parameters_list"]) == n + 1   # init + chain-0 trace
    # overdispersed prior inits: chains start at distinct parameters
    a0 = np.asarray(trace["chain_parameters"].A[:, 0, 0, 0])
    assert len(np.unique(a0)) > 16

    conv = pd.read_csv(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_convergence.csv"))
    assert {"variable", "rhat", "ess", "iact", "se_mean"} <= set(
        conv.columns)
    assert np.all(np.isfinite(conv["rhat"]))
    assert np.all(conv["ess"] > 0)
    assert conv["num_chains"].iloc[0] == 32

    # resume: a second do_fit call continues the saved stacked chains
    it1 = n
    driver.do_fit(args, o)
    trace2 = ckpt.load_trace(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
    assert trace2["chain_parameters"].A.shape[1] >= it1

    # downstream phases on the chain-0 view
    driver.do_eval(args, o, "half_avg_train")
    df = pd.read_csv(os.path.join(
        exp_dir, "out", "eval",
        f"{o['experiment_id']}_half_avg_train_metrics.csv"))
    assert np.all(np.isfinite(df["value"]))
    agg = driver.do_process_out(args, options_list)
    assert agg is not None
    assert "rhat" in agg.columns           # convergence rows aggregated


def test_multichain_rejects_gibbs(tmp_path):
    exp_dir = str(tmp_path / "mcg")
    args = make_args(exp_dir, max_time=1.0, num_chains=4)
    args.model = "lgssm"
    grid = cfg.parameter_grid(dict(iter_type=["Gibbs"], name=["GIBBS"],
                                   max_time=[1]))
    options_list = driver.do_setup(args, sampler_grid=grid)
    with pytest.raises(ValueError, match="gradient iter_type"):
        driver.do_fit(args, options_list[0])


def test_eval_predictive_metric_rows(tmp_path):
    """--eval_predictive k adds held-out k-step predictive rows
    (`svm/driver.py:602-603`): slot 0 = filter loglik on PF models."""
    exp_dir = str(tmp_path / "pred")
    args = make_args(exp_dir, max_time=2.0, eval_N=32, num_to_eval=2)
    args.eval_predictive = 2
    options_list = driver.do_setup(args, sampler_grid=small_grid())
    o = options_list[0]
    driver.do_fit(args, o)
    driver.do_eval(args, o, "half_avg_train")
    df = pd.read_csv(os.path.join(
        exp_dir, "out", "eval",
        f"{o['experiment_id']}_half_avg_train_metrics.csv"))
    pred = {f"{k}_pred_loglikelihood" for k in range(3)}
    assert pred <= set(df["metric"]), sorted(set(df["metric"]))
    assert np.all(np.isfinite(
        df[df["metric"].isin(pred)]["value"]))


def test_eval_chains_pooled(tmp_path):
    """--eval_chains pooled consumes every chain of a multi-chain trace
    (VERDICT r5 #7): the pooled OfflineEvaluator list is C x n long and
    the eval/trace_eval phases produce finite metrics from it."""
    exp_dir = str(tmp_path / "pool")
    args = make_args(exp_dir, max_time=4.0, eval_N=32, num_to_eval=2,
                     num_chains=8, eval_chains="pooled")
    args.init_methods = ["prior"]
    grid = cfg.parameter_grid(dict(
        iter_type=["SGLD"], epsilon=[0.05], subsequence_length=[16],
        buffer_length=[4], steps_per_iteration=[1], pf=["poyiadjis_N"],
        N=[16], name=["POOL"], max_time=[4], max_num_iters=[9],
        checkpoint_num_iters=[9]))
    options_list = driver.do_setup(args, sampler_grid=grid)
    o = options_list[0]
    driver.do_fit(args, o)

    from sgmcmc_tpu.io import checkpoint as ckpt
    trace = ckpt.load_trace(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
    n = trace["chain_parameters"].A.shape[1]

    # helper semantics: pooled list is C*n long; burn/half-avg per chain
    pooled, times = driver._eval_params_list(args, trace)
    assert len(pooled) == 8 * n == len(times)
    burned, _ = driver._eval_params_list(args, trace, burn_frac=1 / 3)
    assert len(burned) == 8 * (n - int(n / 3))
    # chain-0 mode unchanged
    args0 = make_args(exp_dir, eval_chains="0")
    solo, _ = driver._eval_params_list(args0, trace)
    assert len(solo) == n + 1

    driver.do_eval(args, o, "half_avg_train")
    df = pd.read_csv(os.path.join(
        exp_dir, "out", "eval",
        f"{o['experiment_id']}_half_avg_train_metrics.csv"))
    assert np.all(np.isfinite(df["value"]))


def test_fit_multichain_particle_devices(tmp_path):
    """--num_particle_devices 2 routes the multichain fit through the
    public fit_scan(mesh) distributed path (VERDICT r5 #4) on the
    virtual 8-device CPU mesh."""
    exp_dir = str(tmp_path / "pdev")
    args = make_args(exp_dir, max_time=4.0, num_chains=8,
                     num_particle_devices=2)
    args.init_methods = ["prior"]
    grid = cfg.parameter_grid(dict(
        iter_type=["SGLD"], epsilon=[0.05], subsequence_length=[16],
        buffer_length=[4], steps_per_iteration=[1], pf=["poyiadjis_N"],
        N=[16], name=["PDEV"], max_time=[4], max_num_iters=[6],
        checkpoint_num_iters=[6]))
    options_list = driver.do_setup(args, sampler_grid=grid)
    o = options_list[0]
    driver.do_fit(args, o)
    from sgmcmc_tpu.io import checkpoint as ckpt
    trace = ckpt.load_trace(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_parameters.p"))
    A = np.asarray(trace["chain_parameters"].A)
    assert A.shape[0] == 8
    assert np.all(np.isfinite(A))
    conv = pd.read_csv(os.path.join(
        exp_dir, "out", "fit", f"{o['experiment_id']}_convergence.csv"))
    assert "rhat_rank" in conv.columns
