"""Subsequence scheduler: unbiasedness weights and window layout.

The 'uniform' weights are the paper's correctness linchpin
(reference `sgmcmc_sampler.py:1994-2008`); we check them against both the
exact combinatorial count and the reference's branchy formula re-derived in
NumPy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.ops import subsequence


def brute_force_counts(start, S, T):
    """Count subsequences of length S in [0, T) covering each t."""
    t = np.arange(start, start + S)
    counts = np.zeros(S)
    for s in range(0, T - S + 1):
        covered = (t >= s) & (t < s + S)
        counts += covered
    return counts


@pytest.mark.parametrize("T,S", [(100, 16), (50, 10), (20, 20), (37, 5)])
def test_uniform_weights_match_bruteforce(T, S):
    for start in range(0, T - S + 1):
        w = np.asarray(subsequence.subsequence_weights(start, S, T, "uniform",
                                                       jnp.float64))
        counts = brute_force_counts(start, S, T)
        np.testing.assert_allclose(w, (T - S + 1) / counts, rtol=1e-12)


@pytest.mark.parametrize("T,S", [(100, 16), (64, 8)])
def test_uniform_weights_unbiased(T, S):
    """E_start[sum of w_t over windows containing t] / (T-S+1) == 1 per t."""
    acc = np.zeros(T)
    for start in range(0, T - S + 1):
        w = np.asarray(subsequence.subsequence_weights(start, S, T, "uniform",
                                                       jnp.float64))
        acc[start:start + S] += w
    np.testing.assert_allclose(acc / (T - S + 1), np.ones(T), rtol=1e-12)


def reference_uniform_weights(subsequence_start, S, T):
    """Reference's three-branch formula (`sgmcmc_sampler.py:1994-2008`)."""
    subsequence_end = subsequence_start + S
    t = np.arange(subsequence_start, subsequence_end)
    if subsequence_end <= 2 * S:
        num_sequences = np.min(
            np.array([t + 1, np.ones_like(t) * min(S, T - S + 1)]), axis=0)
    elif subsequence_start >= T - 2 * S - 1:
        num_sequences = np.min(
            np.array([T - t, np.ones_like(t) * min(S, T - S + 1)]), axis=0)
    else:
        num_sequences = np.ones(S) * S
    return np.ones(S) * (T - S + 1) / num_sequences


@pytest.mark.parametrize("T,S", [(100, 16), (1000, 40)])
def test_matches_reference_formula(T, S):
    for start in range(0, T - S + 1, 7):
        ours = np.asarray(subsequence.subsequence_weights(start, S, T,
                                                          "uniform",
                                                          jnp.float64))
        theirs = reference_uniform_weights(start, S, T)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_strict_and_naive_weights():
    w = subsequence.subsequence_weights(0, 10, 100, "strict", jnp.float64)
    np.testing.assert_allclose(np.asarray(w), 10.0)
    w = subsequence.subsequence_weights(3, 10, 100, "naive", jnp.float64)
    np.testing.assert_allclose(np.asarray(w), 10.0)


def test_buffered_window_layout():
    key = jax.random.PRNGKey(0)
    T, S, B = 100, 16, 10
    W = subsequence.window_length(S, B, T)
    assert W == 36
    for i in range(50):
        win = subsequence.sample_buffered_window(
            jax.random.fold_in(key, i), S, B, T)
        ws, t1, tL = int(win.window_start), int(win.t1), int(win.tL)
        assert 0 <= ws <= T - W
        assert tL - t1 == S
        assert 0 <= t1 and tL <= W
        # the subsequence itself must sit at its true absolute position
        start = ws + t1
        assert 0 <= start <= T - S


def test_window_length_edge_cases():
    assert subsequence.window_length(-1, 5, 100) == 100
    assert subsequence.window_length(16, -1, 100) == 100
    assert subsequence.window_length(16, 100, 100) == 100
    assert subsequence.window_length(100, 0, 100) == 100


def test_strict_sampling_aligned():
    key = jax.random.PRNGKey(1)
    for i in range(20):
        start, w = subsequence.sample_subsequence(
            jax.random.fold_in(key, i), 10, 100, "strict")
        assert int(start) % 10 == 0
