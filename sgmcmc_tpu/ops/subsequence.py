"""Buffered-subsequence sampling with unbiasedness weights.

Jittable rewrite of `random_subsequence_and_weights`
(`/root/reference/sgmcmc_ssm/sgmcmc_sampler.py:1969-2017`) and
`_random_subsequence_and_buffers` (`sgmcmc_sampler.py:259-288`).

The 'uniform' weights are the paper's correctness linchpin: index ``t`` is
covered by ``n(t) = min(t+1, S, T-S+1, T-t)`` of the ``T-S+1`` equally likely
subsequences, so weighting by ``(T-S+1)/n(t)`` makes
``E[sum_t w_t g_t] = sum_t g_t`` exactly.  We use this closed form (the
reference's three-branch approximation at `sgmcmc_sampler.py:1998-2007`
computes the same numbers).

Fixed-shape windowing: the reference clips buffers independently at the two
sequence ends, giving data-dependent window lengths.  Under XLA we keep a
static window ``W = S + 2B`` and slide it inside ``[0, T]``
(``window_start = clip(start - B, 0, T - W)``), so a subsequence near an edge
gets the surplus buffer on the other side.  Buffering only controls the bias
of the boundary-message approximation, so a longer buffer is never worse;
the in-window weights (and hence unbiasedness over subsequence choice) are
unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SubsequenceWindow(NamedTuple):
    window_start: jax.Array   # int32: absolute start of the buffered window
    t1: jax.Array             # int32: relative start of the subsequence
    tL: jax.Array             # int32: relative end (exclusive)
    weights: jax.Array        # [S] unbiasedness weights


def coverage_counts(start, S: int, T: int, dtype=jnp.float32) -> jax.Array:
    """n(t) = number of length-S subsequences of [0, T) containing t,
    for t = start..start+S-1 (exact closed form)."""
    t = start + jnp.arange(S)
    n = jnp.minimum(jnp.minimum(t + 1, S), jnp.minimum(T - S + 1, T - t))
    return n.astype(dtype)


def subsequence_weights(start, S: int, T: int, partition_style: str = "uniform",
                        dtype=jnp.float32) -> jax.Array:
    """Unbiasedness weights for a subsequence starting at ``start``."""
    if partition_style == "uniform":
        return (T - S + 1) / coverage_counts(start, S, T, dtype)
    if partition_style == "strict":
        return jnp.full((S,), T / S, dtype)
    if partition_style == "naive":
        return jnp.full((S,), T / S, dtype)
    raise ValueError(f"Unrecognized partition_style = '{partition_style}'")


def sample_subsequence(key: jax.Array, S: int, T: int,
                       partition_style: str = "uniform",
                       dtype=jnp.float32):
    """Draw a random subsequence start and its weights.

    Returns ``(start, weights[S])``; 'strict' draws a partition block
    (requires S | T), 'uniform'/'naive' draw uniformly from T-S+1 starts.
    """
    if partition_style == "strict":
        if T % S != 0:
            raise ValueError(f"S={S} does not evenly divide T={T}")
        start = jax.random.randint(key, (), 0, T // S) * S
    else:
        start = jax.random.randint(key, (), 0, T - S + 1)
    return start, subsequence_weights(start, S, T, partition_style, dtype)


def sample_buffered_window(key: jax.Array, S: int, buffer_length: int, T: int,
                           partition_style: str = "uniform",
                           dtype=jnp.float32) -> SubsequenceWindow:
    """Sample a subsequence and lay out its fixed-shape buffered window.

    Static window length ``W = S + 2*buffer_length`` (clipped to T);
    ``buffer_length == -1`` buffers to the whole sequence
    (`_random_subsequence_and_buffers`, `sgmcmc_sampler.py:259-266`).
    """
    if buffer_length == -1:
        buffer_length = T
    W = min(S + 2 * buffer_length, T)
    start, weights = sample_subsequence(key, S, T, partition_style, dtype)
    window_start = jnp.clip(start - buffer_length, 0, T - W)
    t1 = start - window_start
    return SubsequenceWindow(window_start.astype(jnp.int32),
                             t1.astype(jnp.int32),
                             (t1 + S).astype(jnp.int32), weights)


def window_length(S: int, buffer_length: int, T: int) -> int:
    """Static buffered-window length."""
    if S == -1 or S >= T:
        return T
    if buffer_length == -1:
        return T
    return min(S + 2 * buffer_length, T)


def slice_window(observations: jax.Array, window_start, W: int) -> jax.Array:
    """Gather a fixed-length window of observations starting at window_start."""
    return jax.lax.dynamic_slice_in_dim(observations, window_start, W, axis=0)
