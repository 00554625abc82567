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
