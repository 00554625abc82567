import sys, json, time
import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from sgmcmc_tpu.models import garch
from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score
from sgmcmc_tpu.ops import buffered

params = garch.from_alpha_beta_gamma(0.1, 0.6, 0.2, R=0.5)
T = 50
ys, _ = garch.generate_data(jax.random.PRNGKey(0), params, T)
ys = ys.astype(jnp.float32)
w = jnp.ones((T,), jnp.float32)
N = 256
pv = float(garch.stationary_variance(params))
R = 256
keys = jax.random.split(jax.random.PRNGKey(1), R)
ms_f, ll_f = jax.jit(jax.vmap(lambda k: fused_pf_score(
    garch.FUSED, k, params, ys, w, N, 0.0, pv)))(keys)
ms_f = np.asarray(ms_f); ll_f = np.asarray(ll_f)
keys2 = jax.random.split(jax.random.PRNGKey(2), R)
def unfused(k):
    o = buffered.run_buffered_pf(
        garch.OPTIMAL_KERNEL, garch.grad_statistic, params, ys, key=k,
        n_particles=N, statistic_dim=4, smoother="poyiadjis_N",
        resampler="systematic", resample_mode="pallas2",
        prior_mean=0.0, prior_var=pv)
    return o.mean_statistic, o.loglikelihood
ms_u, ll_u = jax.jit(jax.vmap(unfused))(keys2)
ms_u = np.asarray(ms_u); ll_u = np.asarray(ll_u)
se = np.sqrt(ms_f.std(0)**2 + ms_u.std(0)**2) / np.sqrt(R)
print("fused  :", ms_f.mean(0), "ll", ll_f.mean())
print("unfused:", ms_u.mean(0), "ll", ll_u.mean())
print("z:", (ms_f.mean(0)-ms_u.mean(0))/se)
print("finite:", np.all(np.isfinite(ms_f)))
