"""TPU check + micro-bench for the fused-kernel qp_merge option.

Verifies that qp_merge in {2, 4, 8} reproduces qp_merge=1 bitwise on the
flagship SVM fused bundle, then times the full SGLD step at each setting.

Run: nohup timeout 1200 python -u scripts/tpu_check_qp_merge.py > /tmp/qpm.log 2>&1 &
"""
import sys
import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.inference import sgmcmc
from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

N = 1024
W = 60
CHAINS = 2048
ITERS = 20
T = 1000


def main():
    key = jax.random.PRNGKey(0)
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.fold_in(key, 1), true, T)
    window = ys[:W].reshape(W)
    step_w = jnp.ones((W,), jnp.float32)
    pm, pv = 0.0, svm.stationary_variance(true)

    # ---- correctness: qp_merge variants must match qp_merge=1 bitwise
    ref = None
    for qpm in (1, 2, 4, 8):
        f = jax.jit(lambda k, p, qpm=qpm: fused_pf_score(
            svm.FUSED, k, p, window, step_w, N, pm, pv, qp_merge=qpm))
        stat, ll = f(jax.random.fold_in(key, 2), true)
        stat, ll = np.asarray(stat), float(ll)
        if ref is None:
            ref = (stat, ll)
            print(f"qp_merge=1: stat={stat}, ll={ll}")
        else:
            same = np.array_equal(stat, ref[0]) and ll == ref[1]
            print(f"qp_merge={qpm}: bitwise_equal={same} "
                  f"max|d|={np.abs(stat - ref[0]).max():.3e} "
                  f"dll={abs(ll - ref[1]):.3e}")

    # ---- timing: full SGLD step at each setting
    prior = svm.default_prior()
    for qpm in (1, 2, 4, 8):
        cfg = sgmcmc.PFScoreConfig(
            n_particles=N, subsequence_length=40, buffer_length=10,
            smoother="poyiadjis_N", resampler="systematic",
            resample_mode="auto", rng="kernel", qp_merge=qpm)
        score_fn = sgmcmc.make_pf_score_fn(
            svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM,
            svm.unpack_grad, cfg, T,
            prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
            fused_model=svm.FUSED)
        grad_fn = sgmcmc.make_noisy_grad_fn(
            score_fn, lambda p: svm.grad_logprior(prior, p), T)

        def chain_step(k, p, obs):
            new, ll = sgmcmc.sgld_step(k, p, obs, grad_fn, epsilon=0.1, T=T)
            return svm.project_parameters(new), ll

        def multi(keys, params, obs):
            def body(p, i):
                ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
                p, ll = jax.vmap(chain_step, in_axes=(0, 0, None))(ks, p,
                                                                   obs)
                return p, ll
            return jax.lax.scan(body, params,
                                jnp.arange(ITERS, dtype=jnp.int32))

        fit = jax.jit(multi, donate_argnums=(1,))
        keys = jax.random.split(jax.random.fold_in(key, 3), CHAINS)
        params0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (CHAINS,) + x.shape).copy(),
            svm.from_scalars(A=0.5, Q=1.0, R=2.0))
        try:
            p, ll = fit(keys, params0, ys)
            float(jnp.sum(ll[-1]))
            t0 = time.perf_counter()
            p, ll = fit(keys, p, ys)
            float(jnp.sum(ll[-1]))
            dt = time.perf_counter() - t0
            print(f"qp_merge={qpm}: {CHAINS * ITERS / dt:.0f} steps/s "
                  f"({dt * 1e3:.1f} ms)")
        except Exception as e:
            print(f"qp_merge={qpm}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
