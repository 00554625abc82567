"""Hardware check: two-level resample selections must be bitwise-equal to
gather semantics on a real TPU (guards against XLA excess-precision
elision of the bf16 splits — see `_round_bf16`).  Run manually:

    python scripts/tpu_check_resample.py
"""
import sys
import pathlib

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.ops.pallas import resample as rs


def main():
    bad = 0
    for N in [256, 1024, 4096]:
        for K in [1, 3, 4, 6, 8]:
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
            ok = np.array_equal(g, p2) and np.array_equal(g, pb)
            print(f"N={N} K={K} exact={ok}")
            bad += not ok
    if bad:
        raise SystemExit(f"{bad} mismatching configurations")
    print("all exact")


if __name__ == "__main__":
    main()
