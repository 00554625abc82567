"""Fused resample-apply Pallas kernel — the PF hot op on TPU.

Resampling is the particle filter's bottleneck on TPU when expressed as
cumsum + searchsorted + gather (tiny per-chain ops with minor-dim gathers;
measured ~10x the cost of the whole rest of the step).  This kernel uses the
one-hot reformulation: with inclusive CDF ``c_j`` and resampling positions
``u_i`` (sorted or not), the ancestor selection matrix is

    P[i, j] = [c_{j-1} <= u_i < c_j] = M[i, j-1] - M[i, j],
    M[i, j] = [u_i >= c_j],  M[i, -1] := 1

and applying resampling to any per-particle value matrix V [N, K] is
``P @ V`` — an MXU matmul.  The kernel generates P tile-by-tile in VMEM
(never materializing the [N, N] matrix in HBM) and accumulates the dot.

Works for multinomial (u iid uniform), stratified (u_i = (i + xi_i)/N) and
systematic (u_i = (i + xi)/N) resampling — the scheme only changes ``u``.
It is exactly equivalent (bitwise, same u) to index-based resampling with
``idx_i = searchsorted(c, u_i, 'right')``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_kernel(pos_ref, cdf_ref, vals_ref, out_ref):
    """One (i-tile) block: out_T [K, TI] = vals_T [K, N] . P^T [N, TI].

    All refs keep the particle axis N (or its TI tile) as the minor (lane)
    dimension so no block pads a tiny minor dim up to 128 lanes.  The
    one-hot matrix P (entries 0/1) is exact in bf16, so the contraction
    runs at full MXU bf16 throughput; to keep the *values* near-f32-exact
    each f32 row is split into hi + lo bf16 rows (~16 mantissa bits) and
    the two products are summed in f32 — the extra rows are nearly free
    since the MXU pads the K dimension anyway.
    """
    pos = pos_ref[:]                     # [1, TI]
    cdf = cdf_ref[:]                     # [1, N]
    pos_col = pos.reshape(pos.shape[1], 1)           # [TI, 1]
    M = (pos_col >= cdf).astype(jnp.bfloat16)        # [TI, N]
    # Mshift[:, j] = M[:, j-1], with col 0 = 1  (c_{-1} = 0 <= u always)
    ones = jnp.ones_like(M[:, :1])
    Mshift = jnp.concatenate([ones, M[:, :-1]], axis=1)
    P = Mshift - M                                   # one-hot rows, exact

    vals = vals_ref[:]                               # [K, N] f32
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hilo = jnp.concatenate([hi, lo], axis=0)         # [2K, N]
    # contract over N: [2K, N] x [TI, N] -> [2K, TI]
    out = jax.lax.dot_general(hilo, P, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    K = vals.shape[0]
    out_ref[:] = out[:K] + out[K:]


@functools.partial(jax.jit, static_argnames=("tile",))
def resample_apply_pallas(pos: jax.Array, cdf: jax.Array, vals: jax.Array,
                          tile: int = 1024) -> jax.Array:
    """out[i] = vals[idx(i)] with idx(i) = #{j : cdf_j <= pos_i}.

    pos [N], cdf [N] (inclusive, cdf[-1] ~ 1), vals [N, K] -> [N, K].
    """
    N, K = vals.shape
    tile = min(tile, N)
    grid = (N // tile,)
    out_t = pl.pallas_call(
        _resample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
    )(pos.reshape(1, N), cdf.reshape(1, N), vals.T)
    return out_t.T


def resample_apply_xla(pos: jax.Array, cdf: jax.Array,
                       vals: jax.Array) -> jax.Array:
    """Pure-XLA fallback of the same one-hot matmul (materializes M)."""
    M = (pos[:, None] >= cdf[None, :]).astype(vals.dtype)
    Mshift = jnp.concatenate([jnp.ones_like(M[:, :1]), M[:, :-1]], axis=1)
    return (Mshift - M) @ vals


def resample_apply_gather(pos: jax.Array, cdf: jax.Array,
                          vals: jax.Array) -> jax.Array:
    """Index-based reference implementation (CPU-friendly)."""
    idx = jnp.clip(jnp.searchsorted(cdf, pos, side="right"),
                   0, vals.shape[0] - 1)
    return jnp.take(vals, idx, axis=0)


def resample_positions(scheme: str, key: jax.Array, n: int, dtype):
    """Resampling positions u [n] for each scheme."""
    if scheme == "multinomial":
        return jax.random.uniform(key, (n,), dtype)
    if scheme == "systematic":
        u0 = jax.random.uniform(key, (), dtype)
        return (jnp.arange(n, dtype=dtype) + u0) / n
    if scheme == "stratified":
        u = jax.random.uniform(key, (n,), dtype)
        return (jnp.arange(n, dtype=dtype) + u) / n
    raise ValueError(f"Unrecognized resampling scheme '{scheme}'")


def weights_cdf(log_weights: jax.Array) -> jax.Array:
    """Inclusive normalized CDF of exp(log_weights); degenerate (all -inf)
    weight vectors fall back to the uniform CDF instead of NaN."""
    m = jnp.max(log_weights)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(log_weights - m)
    cdf = jnp.cumsum(w)
    n = log_weights.shape[0]
    uniform = (jnp.arange(1, n + 1, dtype=cdf.dtype)) / n
    return jnp.where(cdf[-1] > 0, cdf / jnp.where(cdf[-1] > 0, cdf[-1], 1.0),
                     uniform)


# The one-hot matmul is O(N^2) per step; index-based resampling is O(N log N)
# with poor constants on TPU.  Measured crossover is around N ~ 8k.
PALLAS_MAX_PARTICLES = 8192


def default_mode(n_particles: int | None = None) -> str:
    """TPU gets the fused kernel up to the O(N^2) crossover; CPU/GPU and
    very large N keep index semantics."""
    if jax.default_backend() != "tpu":
        return "gather"
    if n_particles is not None and n_particles > PALLAS_MAX_PARTICLES:
        return "gather"
    return "pallas"


def resample_apply(key: jax.Array, log_weights: jax.Array, vals: jax.Array,
                   scheme: str = "systematic",
                   mode: str = "pallas") -> jax.Array:
    """Resample rows of ``vals`` [N, K] according to ``log_weights``.

    mode: 'pallas' (fused TPU kernel), 'xla' (dense one-hot matmul),
    'gather' (searchsorted + take — index semantics, CPU default),
    'auto' (backend-dependent default).
    """
    n = log_weights.shape[0]
    if mode == "auto":
        mode = default_mode(n)
    cdf = weights_cdf(log_weights)
    pos = resample_positions(scheme, key, n, cdf.dtype)
    if mode == "pallas":
        return resample_apply_pallas(pos, cdf,
                                     vals.astype(jnp.float32)).astype(
                                         vals.dtype)
    if mode == "xla":
        return resample_apply_xla(pos, cdf, vals)
    if mode == "gather":
        return resample_apply_gather(pos, cdf, vals)
    raise ValueError(f"Unrecognized resample mode '{mode}'")
