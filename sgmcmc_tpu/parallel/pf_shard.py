"""Particle-axis-sharded particle smoothers (the TP axis of SG-MCMC).

Shards a single particle filter's N particles across the ``particle`` mesh
axis.  Each device owns N/P particles; per step the (small) filter state —
log-weights, particles, per-particle statistics — is `all_gather`'d over ICI
so every device resamples its local slice from the *global* ancestor
distribution and computes its local slice of the new state.  For the
Poyiadjis O(N^2) smoother this is the natural row decomposition of the
backward-weight matmul: each device computes its [N/P, N] block.

Statistical parity: resampling draws from the full N-particle categorical
(keys decorrelated by `axis_index`); systematic resampling uses a globally
coherent comb (device p takes stratum offsets p*N/P .. (p+1)*N/P - 1 of a
shared uniform), so the sharded filter equals the single-device filter in
distribution.

Cross-references: single-device versions in `sgmcmc_tpu/ops/smoothers.py`;
reference recursions at
`/root/reference/sgmcmc_ssm/particle_filters/pf.py:84-258`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.base import ParticleKernel, StatisticFn
from ..ops.smoothers import PFCarry, PFStepInput


def _global_categorical(key, all_log_w, n_local, axis_name):
    """Each device samples n_local global ancestor indices."""
    p_idx = jax.lax.axis_index(axis_name)
    key = jax.random.fold_in(key, p_idx)
    return jax.random.categorical(key, all_log_w, shape=(n_local,))


def _global_systematic(key, all_log_w, n_local, axis_name):
    """Globally coherent systematic comb: one shared uniform, device p takes
    strata [p*n_local, (p+1)*n_local)."""
    n = all_log_w.shape[0]
    p_idx = jax.lax.axis_index(axis_name)
    u0 = jax.random.uniform(key, (), dtype=all_log_w.dtype)  # same on all
    pos = (p_idx * n_local + jnp.arange(n_local, dtype=all_log_w.dtype)
           + u0) / n
    w = jnp.exp(all_log_w - jnp.max(all_log_w))
    cdf = jnp.cumsum(w / jnp.sum(w))
    idx = jnp.searchsorted(cdf, pos, side="left")
    return jnp.clip(idx, 0, n - 1)


_SHARD_RESAMPLERS = {
    "multinomial": _global_categorical,
    "systematic": _global_systematic,
}


def make_sharded_smoother_step(kernel: ParticleKernel, stat_fn: StatisticFn,
                               smoother: str, axis_name: str = "particle",
                               resampler: str = "multinomial",
                               lambduh: float = 0.95):
    """Smoother step over local particle shards with ICI collectives.

    Carry arrays are the local shards: particles [N_loc, D], log_weights
    [N_loc], statistics [N_loc, H].
    """
    if resampler not in _SHARD_RESAMPLERS:
        raise ValueError(f"sharded resampler must be one of "
                         f"{sorted(_SHARD_RESAMPLERS)}")
    draw = _SHARD_RESAMPLERS[resampler]
    if smoother == "poyiadjis_N":
        smoother, lambduh = "nemeth", 1.0
    if smoother not in ("nemeth", "poyiadjis_N2", "filter"):
        raise ValueError(f"Unsupported sharded smoother '{smoother}'")

    def step(params, carry: PFCarry, inp: PFStepInput) -> PFCarry:
        n_local = carry.particles.shape[0]
        p_idx = jax.lax.axis_index(axis_name)
        # gather the global filter state (small: N x (D + 1 + H))
        all_x = jax.lax.all_gather(carry.particles, axis_name, tiled=True)
        all_w = jax.lax.all_gather(carry.log_weights, axis_name, tiled=True)

        key_res, key_prop = jax.random.split(inp.key)
        idx = draw(key_res, all_w, n_local, axis_name)
        parents = jnp.take(all_x, idx, axis=0)
        key_prop = jax.random.fold_in(key_prop, p_idx)
        new_x = kernel.propose(params, key_prop, parents, inp.y)
        new_w = kernel.reweight(params, parents, new_x, inp.y)

        scale = inp.weight * inp.in_window
        h = stat_fn(params, parents, new_x, inp.y, inp.t)  # [N_loc, H]

        if smoother == "filter":
            all_new_w = jax.lax.all_gather(new_w, axis_name, tiled=True)
            probs_loc = jnp.exp(new_w - jnp.max(all_new_w))
            denom = jax.lax.psum(jnp.sum(probs_loc), axis_name)
            stats = carry.statistics + scale * jax.lax.psum(
                jnp.sum(h * (probs_loc / denom)[:, None], axis=0), axis_name)
        else:
            all_s = jax.lax.all_gather(carry.statistics, axis_name,
                                       tiled=True)
            if smoother == "nemeth":
                probs = jax.nn.softmax(all_w)
                S_bar = probs @ all_s                       # [H]
                stats = (lambduh * jnp.take(all_s, idx, axis=0)
                         + (1.0 - lambduh) * S_bar[None, :]
                         + scale * h)
            else:  # poyiadjis_N2: local [N_loc, N] block of backward weights
                def row(x_next_i):
                    x_b = jnp.broadcast_to(x_next_i[None, :], all_x.shape)
                    return all_w + kernel.prior_log_density(params, all_x, x_b)

                log_bw = jax.vmap(row)(new_x)               # [N_loc, N]
                bw = jax.nn.softmax(log_bw, axis=-1)
                smoothed = bw @ all_s                        # [N_loc, H]

                def h_row(x_next_i, bw_row):
                    x_b = jnp.broadcast_to(x_next_i[None, :], all_x.shape)
                    hp = stat_fn(params, all_x, x_b, inp.y, inp.t)
                    return bw_row @ hp

                h_term = jax.vmap(h_row)(new_x, bw)
                stats = smoothed + scale * h_term

        # global loglik increment log(mean(exp(new_w)))
        m = jax.lax.pmax(jnp.max(new_w), axis_name)
        total = jax.lax.psum(jnp.sum(jnp.exp(new_w - m)), axis_name)
        n_total = jax.lax.psum(jnp.asarray(n_local, new_w.dtype), axis_name)
        inc = m + jnp.log(total) - jnp.log(n_total)
        loglik = carry.loglik + inp.weight * inp.in_window * inc
        return PFCarry(new_x, new_w, stats, loglik)

    return step


def run_buffered_pf_sharded(kernel: ParticleKernel, stat_fn: StatisticFn,
                            params, observations, *, key, n_local: int,
                            statistic_dim: int, smoother: str = "poyiadjis_N",
                            step_weights=None, in_window=None,
                            prior_mean=0.0, prior_var=1.0,
                            resampler: str = "multinomial",
                            lambduh: float = 0.95,
                            axis_name: str = "particle"):
    """Sharded analogue of `ops.buffered.run_buffered_pf`.

    Must be called inside a `shard_map` region with ``axis_name`` bound;
    returns (mean_statistic [H] (globally reduced), loglikelihood).
    """
    W = observations.shape[0]
    dtype = observations.dtype
    if step_weights is None:
        step_weights = jnp.ones((W,), dtype)
    if in_window is None:
        in_window = (step_weights > 0).astype(dtype)

    step = make_sharded_smoother_step(kernel, stat_fn, smoother, axis_name,
                                      resampler, lambduh)

    key_init, key_steps = jax.random.split(key)
    key_init = jax.random.fold_in(key_init, jax.lax.axis_index(axis_name))
    x0 = kernel.sample_x0(params, key_init, n_local, prior_mean, prior_var)
    x0 = x0.astype(dtype)
    carry0 = PFCarry(x0, jnp.zeros((n_local,), dtype),
                     jnp.zeros((n_local, statistic_dim), dtype)
                     if smoother != "filter"
                     else jnp.zeros((statistic_dim,), dtype),
                     jnp.zeros((), dtype))

    xs = PFStepInput(
        key=jax.random.split(key_steps, W),
        y=observations,
        weight=step_weights,
        in_window=in_window,
        t=jnp.arange(W, dtype=jnp.int32),
    )

    def body(carry, inp):
        return step(params, carry, inp), None

    carry, _ = jax.lax.scan(body, carry0, xs)

    if smoother == "filter":
        mean_stat = carry.statistics
    else:
        m = jax.lax.pmax(jnp.max(carry.log_weights), axis_name)
        w_loc = jnp.exp(carry.log_weights - m)
        denom = jax.lax.psum(jnp.sum(w_loc), axis_name)
        mean_stat = jax.lax.psum(
            jnp.sum(carry.statistics * w_loc[:, None], axis=0), axis_name
        ) / denom
    return mean_stat, carry.loglik
