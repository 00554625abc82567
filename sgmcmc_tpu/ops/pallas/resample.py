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


# ---------------------------------------------------------------------------
# Two-level (hierarchical) one-hot resample-apply
# ---------------------------------------------------------------------------
#
# The dense kernel above costs O(N^2) compares on the VPU plus an
# effectively O(N^2 * 128) MXU contraction (the K value-rows pad to a full
# 128-row tile).  The two-level kernel splits the ancestor index as
# idx = s*b + o (B = N/s blocks of s particles):
#
#   1. block one-hot  B1[p, i] = [b_i == p] from compares against the B-1
#      block-boundary CDF values (exact f32),
#   2. ONE matmul  G = W1 @ B1  gathers, per output particle, its block's
#      s values (bf16 hi/lo split) AND the block's s CDF entries (bf16
#      hi/mid/lo split — three bf16 pieces reconstruct any f32 exactly,
#      so within-block compares remain bitwise-exact),
#   3. within-block one-hot from s exact compares and an s-row reduction.
#
# Cost: O(N*B) compares + an [s*(2K+3), B] x [B, N] matmul — about 8x fewer
# MXU tiles and 8x fewer VPU compares than the dense kernel at N=1024, with
# identical (gather) selection semantics.

def _round_bf16(x32: jax.Array) -> jax.Array:
    """Round f32 to bf16 precision, keeping f32 dtype.

    MUST be `lax.reduce_precision`: a plain `astype(bf16).astype(f32)`
    round-trip is legally elided by XLA under
    ``--xla_allow_excess_precision`` (the TPU default here), which
    silently zeroes the residuals of the splits below and destroys both
    selection exactness and value accuracy.
    """
    return jax.lax.reduce_precision(x32, exponent_bits=8, mantissa_bits=7)


def _split3(x32: jax.Array):
    """Three bf16 pieces whose ordered f32 sum reconstructs x32 bitwise.

    XLA (outside-kernel) version — uses reduce_precision so the rounding
    cannot be elided."""
    hi = _round_bf16(x32)
    r1 = x32 - hi
    mid = _round_bf16(r1)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _split3_kernel(x32: jax.Array):
    """In-Pallas-kernel variant of `_split3`: Mosaic has no
    reduce_precision lowering but honors explicit astype round-trips
    (verified on hardware — the fused kernel matches gather selections)."""
    hi = x32.astype(jnp.bfloat16)
    r1 = x32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _two_level_operands(cdf: jax.Array, vals: jax.Array, s: int):
    """Build the fused gather matrix W1 [(2K+3)s, B] and boundaries [B, 1].

    W1 rows: K*s value-hi rows, K*s value-lo rows, then 3*s CDF piece rows;
    W1[k*s + q, p] = piece(vals[s*p + q, k]), cdf rows analogous.
    """
    N, K = vals.shape
    B = N // s
    v32 = vals.astype(jnp.float32)
    vhi_f = _round_bf16(v32)            # elision-proof (see _round_bf16)
    vhi = vhi_f.astype(jnp.bfloat16)
    vlo = (v32 - vhi_f).astype(jnp.bfloat16)

    def value_rows(x):                       # [N, K] -> [K*s, B]
        return x.reshape(B, s, K).transpose(2, 1, 0).reshape(K * s, B)

    c32 = cdf.astype(jnp.float32)
    chi, cmid, clo = _split3(c32)

    def cdf_rows(c):                         # [N] -> [s, B]
        return c.reshape(B, s).T

    W1 = jnp.concatenate([
        value_rows(vhi), value_rows(vlo),
        cdf_rows(chi), cdf_rows(cmid), cdf_rows(clo)], axis=0)
    bnd = jnp.concatenate([
        c32[s - 1::s][:B - 1],
        jnp.full((1,), jnp.inf, jnp.float32)])
    return W1, bnd[:, None]


def _resample2_kernel(s: int, K: int, pos_ref, bnd_ref, w1_ref, out_ref):
    """One N-tile: two-level selection entirely in VMEM.

    pos [1, TN] f32; bnd [B, 1] f32; w1 [(2K+3)s, B] bf16; out [K, TN] f32.
    """
    pos = pos_ref[:]                                   # [1, TN]
    bnd = bnd_ref[:]                                   # [B, 1]
    M1 = (pos >= bnd).astype(jnp.bfloat16)             # [B, TN]
    ones = jnp.ones_like(M1[:1])
    B1 = jnp.concatenate([ones, M1[:-1]], axis=0) - M1  # block one-hot
    G = jax.lax.dot_general(w1_ref[:], B1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    Ks = K * s
    vals = G[:Ks] + G[Ks:2 * Ks]                       # [K*s, TN] f32
    c = (G[2 * Ks:2 * Ks + s] + G[2 * Ks + s:2 * Ks + 2 * s]) \
        + G[2 * Ks + 2 * s:2 * Ks + 3 * s]             # exact f32 cdf rows
    M2 = (pos >= c).astype(jnp.float32)                # [s, TN]
    ones2 = jnp.ones_like(M2[:1])
    P2 = jnp.concatenate([ones2, M2[:-1]], axis=0) - M2
    Z = vals * jnp.concatenate([P2] * K, axis=0)       # [K*s, TN]
    out_ref[:] = Z.reshape(K, s, Z.shape[-1]).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("s", "tile", "interpret"))
def resample_apply_pallas2(pos: jax.Array, cdf: jax.Array, vals: jax.Array,
                           s: int = 8, tile: int = 1024,
                           interpret: bool = False) -> jax.Array:
    """Two-level fused resample-apply; same selection semantics as gather."""
    N, K = vals.shape
    assert N % s == 0, "two-level kernel needs N divisible by s"
    B = N // s
    W1, bnd = _two_level_operands(cdf, vals, s)
    tile = min(tile, N)
    grid = (N // tile,)
    R = W1.shape[0]
    out_t = pl.pallas_call(
        functools.partial(_resample2_kernel, s, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        interpret=interpret,
    )(pos.reshape(1, N).astype(jnp.float32), bnd, W1)
    return out_t.T


def _resample2_batched_kernel(s: int, K: int, pos_ref, bnd_ref, w1_ref,
                              out_ref):
    """CB chains per grid point — amortizes per-invocation overhead.

    pos [CB, 1, TN]; bnd [CB, B, 1]; w1 [CB, R, B]; out [CB, K, TN].
    """
    pos = pos_ref[:]
    bnd = bnd_ref[:]
    M1 = (pos >= bnd).astype(jnp.bfloat16)              # [CB, B, TN]
    ones = jnp.ones_like(M1[:, :1])
    B1 = jnp.concatenate([ones, M1[:, :-1]], axis=1) - M1
    G = jax.lax.dot_general(w1_ref[:], B1,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    Ks = K * s
    vals = G[:, :Ks] + G[:, Ks:2 * Ks]                  # [CB, K*s, TN]
    c = (G[:, 2 * Ks:2 * Ks + s] + G[:, 2 * Ks + s:2 * Ks + 2 * s]) \
        + G[:, 2 * Ks + 2 * s:2 * Ks + 3 * s]
    M2 = (pos >= c).astype(jnp.float32)                 # [CB, s, TN]
    ones2 = jnp.ones_like(M2[:, :1])
    P2 = jnp.concatenate([ones2, M2[:, :-1]], axis=1) - M2
    Z = vals * jnp.concatenate([P2] * K, axis=1)        # [CB, K*s, TN]
    CB, _, TN = Z.shape
    out_ref[:] = Z.reshape(CB, K, s, TN).sum(axis=2)


@functools.partial(jax.jit,
                   static_argnames=("s", "chain_block", "interpret"))
def resample_apply_pallas2_batched(pos: jax.Array, cdf: jax.Array,
                                   vals: jax.Array, s: int = 8,
                                   chain_block: int = 4,
                                   interpret: bool = False) -> jax.Array:
    """Chain-batched two-level resample-apply.

    pos [C, N]; cdf [C, N]; vals [C, N, K] -> [C, N, K].  Grid is
    (C / chain_block,); each grid point resamples ``chain_block`` chains.
    """
    C, N, K = vals.shape
    assert N % s == 0 and C % chain_block == 0
    B = N // s
    W1, bnd = jax.vmap(lambda c, v: _two_level_operands(c, v, s))(cdf, vals)
    R = W1.shape[1]
    CB = chain_block
    out = pl.pallas_call(
        functools.partial(_resample2_batched_kernel, s, K),
        grid=(C // CB,),
        in_specs=[
            pl.BlockSpec((CB, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, R, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, K, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, K, N), jnp.float32),
        interpret=interpret,
    )(pos.reshape(C, 1, N).astype(jnp.float32), bnd, W1)
    return out.transpose(0, 2, 1)


def _pick_chain_block(C: int, n: int) -> int:
    """Largest power-of-two block <= 8 dividing C, bounded by VMEM at
    large N (the [CB, B, N] one-hot and [CB, 128, N] G must fit)."""
    cap = max(1, min(8, (4096 * 1024) // max(n * n // 2, 1) or 1))
    cb = 1
    while cb * 2 <= min(8, C) and C % (cb * 2) == 0 and cb * 2 <= cap:
        cb *= 2
    return cb


@jax.custom_batching.custom_vmap
def _resample2_auto(pos, cdf, vals):
    """Two-level resample-apply whose vmap collapses into the
    chain-batched kernel (one grid point per `chain_block` chains)."""
    return resample_apply_pallas2(pos, cdf, vals, s=TWO_LEVEL_S)


@jax.custom_batching.custom_vmap
def _resample2_flat(pos, cdf, vals):
    C, N, K = vals.shape
    return resample_apply_pallas2_batched(
        pos, cdf, vals, s=TWO_LEVEL_S,
        chain_block=_pick_chain_block(C, N))


def _bcast(x, batched, axis_size):
    return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)


@_resample2_auto.def_vmap
def _resample2_auto_vmap(axis_size, in_batched, pos, cdf, vals):
    pos = _bcast(pos, in_batched[0], axis_size)
    cdf = _bcast(cdf, in_batched[1], axis_size)
    vals = _bcast(vals, in_batched[2], axis_size)
    return _resample2_flat(pos, cdf, vals), True


@_resample2_flat.def_vmap
def _resample2_flat_vmap(axis_size, in_batched, pos, cdf, vals):
    """Nested vmaps flatten into one big chain batch."""
    pos = _bcast(pos, in_batched[0], axis_size)
    cdf = _bcast(cdf, in_batched[1], axis_size)
    vals = _bcast(vals, in_batched[2], axis_size)
    C2, C1 = vals.shape[:2]
    out = _resample2_flat(pos.reshape(C2 * C1, -1),
                          cdf.reshape(C2 * C1, -1),
                          vals.reshape((C2 * C1,) + vals.shape[2:]))
    return out.reshape((C2, C1) + out.shape[1:]), True


def resample_apply_xla2(pos: jax.Array, cdf: jax.Array, vals: jax.Array,
                        s: int = 8) -> jax.Array:
    """Pure-XLA mirror of the two-level arithmetic (CPU-testable)."""
    N, K = vals.shape
    B = N // s
    W1, bnd = _two_level_operands(cdf, vals, s)
    pos32 = pos.astype(jnp.float32)[None, :]            # [1, N]
    M1 = (pos32 >= bnd).astype(jnp.float32)             # [B, N]
    B1 = jnp.concatenate([jnp.ones_like(M1[:1]), M1[:-1]], axis=0) - M1
    G = W1.astype(jnp.float32) @ B1                     # [(2K+3)s, N]
    Ks = K * s
    vals_g = G[:Ks] + G[Ks:2 * Ks]
    c = (G[2 * Ks:2 * Ks + s] + G[2 * Ks + s:2 * Ks + 2 * s]) \
        + G[2 * Ks + 2 * s:2 * Ks + 3 * s]
    M2 = (pos32 >= c).astype(jnp.float32)
    P2 = jnp.concatenate([jnp.ones_like(M2[:1]), M2[:-1]], axis=0) - M2
    Z = vals_g * jnp.concatenate([P2] * K, axis=0)
    return Z.reshape(K, s, N).sum(axis=1).T


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


# The dense one-hot matmul is O(N^2) per step; the two-level kernel is
# O(N^2 / s); index-based resampling is O(N log N) with poor constants on
# TPU.  Crossover to gather moves out by ~s relative to the dense kernel.
PALLAS_MAX_PARTICLES = 8192
PALLAS2_MAX_PARTICLES = 65536
TWO_LEVEL_S = 8


def default_mode(n_particles: int | None = None) -> str:
    """TPU gets the fused two-level kernel up to the O(N^2/s) crossover;
    CPU/GPU and very large N keep index semantics."""
    if jax.default_backend() != "tpu":
        return "gather"
    if n_particles is not None:
        if n_particles > PALLAS2_MAX_PARTICLES:
            return "gather"
        if n_particles % TWO_LEVEL_S != 0:
            return "pallas" if n_particles <= PALLAS_MAX_PARTICLES \
                else "gather"
    return "pallas2"


def resample_apply(key: jax.Array, log_weights: jax.Array, vals: jax.Array,
                   scheme: str = "systematic",
                   mode: str = "pallas") -> jax.Array:
    """Resample rows of ``vals`` [N, K] according to ``log_weights``.

    mode: 'pallas2' (fused two-level TPU kernel — the fast path),
    'pallas' (fused dense one-hot kernel), 'xla' / 'xla2' (unfused mirrors),
    'gather' (searchsorted + take — index semantics, CPU default),
    'auto' (backend-dependent default).  All modes have identical
    selection semantics for the same key.
    """
    n = log_weights.shape[0]
    if mode == "auto":
        mode = default_mode(n)
    if mode == "pallas2" and n % TWO_LEVEL_S != 0:
        mode = "pallas"
    cdf = weights_cdf(log_weights)
    pos = resample_positions(scheme, key, n, cdf.dtype)
    if mode == "pallas2":
        return _resample2_auto(pos, cdf,
                               vals.astype(jnp.float32)).astype(vals.dtype)
    if mode == "pallas":
        return resample_apply_pallas(pos, cdf,
                                     vals.astype(jnp.float32)).astype(
                                         vals.dtype)
    if mode == "xla":
        return resample_apply_xla(pos, cdf, vals)
    if mode == "xla2":
        return resample_apply_xla2(pos, cdf, vals.astype(jnp.float32),
                                   s=TWO_LEVEL_S).astype(vals.dtype)
    if mode == "gather":
        return resample_apply_gather(pos, cdf, vals)
    raise ValueError(f"Unrecognized resample mode '{mode}'")
