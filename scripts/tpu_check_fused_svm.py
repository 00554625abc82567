import sys, json
import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score
from sgmcmc_tpu.ops import buffered

params = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
T = 50
ys, _ = svm.generate_data(jax.random.PRNGKey(0), params, T)
ys = ys.astype(jnp.float32)
w = jnp.ones((T,), jnp.float32)
N = 256
pv = float(svm.stationary_variance(params))
R = 256

# fused on real TPU, vmapped over keys (collapses into chain batches)
keys = jax.random.split(jax.random.PRNGKey(1), R)
ms_f, ll_f = jax.jit(jax.vmap(lambda k: fused_pf_score(
    svm.FUSED, k, params, ys, w, N, 0.0, pv)))(keys)
ms_f = np.asarray(ms_f); ll_f = np.asarray(ll_f)

# unfused pallas2 on TPU
keys2 = jax.random.split(jax.random.PRNGKey(2), R)
def unfused(k):
    o = buffered.run_buffered_pf(
        svm.KERNEL, svm.grad_statistic, params, ys, key=k, n_particles=N,
        statistic_dim=3, smoother="poyiadjis_N", resampler="systematic",
        resample_mode="pallas2", prior_mean=0.0, prior_var=pv)
    return o.mean_statistic, o.loglikelihood
ms_u, ll_u = jax.jit(jax.vmap(unfused))(keys2)
ms_u = np.asarray(ms_u); ll_u = np.asarray(ll_u)

se = np.sqrt(ms_f.std(0)**2 + ms_u.std(0)**2) / np.sqrt(R)
print("fused  stat:", ms_f.mean(0), "ll:", ll_f.mean())
print("unfused stat:", ms_u.mean(0), "ll:", ll_u.mean())
print("z-scores:", (ms_f.mean(0) - ms_u.mean(0)) / se,
      (ll_f.mean() - ll_u.mean()) / np.sqrt(ll_f.std()**2/R + ll_u.std()**2/R))
print("all finite:", np.all(np.isfinite(ms_f)), np.all(np.isfinite(ll_f)))
