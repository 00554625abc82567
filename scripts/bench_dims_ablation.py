"""Per-model fused-kernel floor ablation (VERDICT r3 weak #5).

Question: are GARCH's -13% and SVJM's -22% fused-SGLD throughput vs SVM
(BENCH_NOTES per-model table) structural — the kernel's work scales with
the carried-state rows D and statistic rows H through the gather matrix
R = (2K s + 3 s) with K = D + H + loglik — or tunable model-op cost?

Method: time the standalone fused window at the flagship shape (W=60,
N=1024, 2048 chains, in-kernel RNG) for (a) the real model bundles and
(b) DUMMY bundles with trivial elementwise ops at controlled (D, H, Z)
dims.  If dummy(D,H) tracks the real model at the same dims, the gap is
the dims; any residual is the model's transcendentals.

Run on TPU: python scripts/bench_dims_ablation.py
Prints one JSON line per row.
"""
import argparse
import json
import time

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from sgmcmc_tpu.ops.pallas.fused_pf import FusedModel, fused_pf_score

W, N, CHAINS, ITERS = 60, 1024, 2048, 10


def make_dummy(D, H, Z):
    """Trivial-elementwise-op bundle at controlled dims (the r2 'dummy
    ops' ablation, now per-dims).  4 packed params."""
    def pack(params):
        return jnp.stack(list(params))

    def propose(pvec, z, x, y):
        return [x[d] * pvec[0] + z[d % Z] * pvec[1] for d in range(D)]

    def reweight(pvec, x, xn, y):
        return -(y - xn[0]) * (y - xn[0]) * pvec[2]

    def stat(pvec, x, xn, y):
        return [xn[0] * pvec[3] if h % 2 else xn[0] + y
                for h in range(H)]

    def init(z, pm, pv):
        base = z[0] * jnp.sqrt(pv) + pm
        return [base if d % Z == 0 else base * 0.5 for d in range(D)]

    return FusedModel(n_state=D, n_stat=H, n_param=4, pack_params=pack,
                      propose=propose, reweight=reweight, stat=stat,
                      init=init, n_noise=Z)


def real_bundle(name):
    if name == "svm":
        from sgmcmc_tpu.models import svm as m
        return m.get_fused(None), m.from_scalars(A=0.9, Q=0.5, R=1.0), \
            float(m.stationary_variance(
                m.from_scalars(A=0.9, Q=0.5, R=1.0)))
    if name == "garch":
        from sgmcmc_tpu.models import garch as m
        p = m.from_alpha_beta_gamma(0.1, 0.4, 0.3, R=0.5)
        return m.get_fused(None), p, float(m.stationary_variance(p))
    if name == "svjm":
        from sgmcmc_tpu.models import svjm as m
        p = m.from_scalars(A=0.9, Q=0.5, R=1.0, pJ=0.1, QJ=2.0)
        return m.get_fused(None), p, float(m.stationary_variance(p))
    if name == "lgssm":
        from sgmcmc_tpu.models import lgssm as m
        p = m.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.5]], R=[[1.0]])
        # fixed 10*I x0 prior (models/registry.py prior_mean_var)
        return m.get_fused(None), p, 10.0
    raise ValueError(name)


def time_bundle(label, fm, params, pv, rng):
    ys = jax.random.normal(jax.random.PRNGKey(2), (W, 1), jnp.float32)
    step_w = jnp.ones((W,), jnp.float32)
    interpret = jax.default_backend() != "tpu"

    f = jax.jit(jax.vmap(lambda k: fused_pf_score(
        fm, k, params, ys, step_w, N, 0.0, pv, rng=rng,
        interpret=interpret)[0]))
    keys = jax.random.split(jax.random.PRNGKey(3), CHAINS)
    out = f(keys)
    float(out[0, 0])      # sync via host transfer (block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(keys)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    us = dt / CHAINS * 1e6
    print(json.dumps({
        "label": label, "D": fm.n_state, "H": fm.n_stat,
        "Z": fm.noise_dims, "us_per_chain_window": round(us, 4),
        "windows_per_s": round(CHAINS / dt, 1)}), flush=True)
    return us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rng", default="kernel"
                    if jax.default_backend() == "tpu" else "host")
    args = ap.parse_args()

    print("# real model bundles", flush=True)
    for name in ["svm", "lgssm", "garch", "svjm"]:
        fm, params, pv = real_bundle(name)
        time_bundle(f"real:{name}", fm, params, pv, args.rng)

    print("# dummy bundles at controlled dims "
          "(svm=(1,3,1) lgssm=(1,3,1) garch=(2,4,1) svjm=(1,5,2))",
          flush=True)
    dummy_params = tuple(jnp.float32(v) for v in (0.9, 0.7, 0.5, 0.3))
    for (D, H, Z) in [(1, 3, 1), (1, 4, 1), (1, 5, 1), (2, 3, 1),
                      (2, 4, 1), (1, 5, 2), (2, 5, 2)]:
        time_bundle(f"dummy:D{D}H{H}Z{Z}", make_dummy(D, H, Z),
                    dummy_params, 1.0, args.rng)


if __name__ == "__main__":
    main()
