"""Resampling kernels: distributional correctness and shape/jit sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.ops import resampling


@pytest.mark.parametrize("name", ["multinomial", "systematic", "stratified"])
def test_resampler_counts_match_weights(name):
    """Mean ancestor counts must be proportional to normalized weights."""
    key = jax.random.PRNGKey(0)
    n = 64
    log_w = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float64))
    probs = np.asarray(resampling.normalize_log_weights(log_w))
    resampler = jax.jit(resampling.get_resampler(name))

    reps = 200
    batch = jax.jit(jax.vmap(resampler, in_axes=(0, None)))
    idx = np.asarray(batch(jax.random.split(key, reps), log_w))
    counts = np.bincount(idx.ravel(), minlength=n)
    freq = counts / (reps * n)
    # systematic/stratified are nearly exact; multinomial needs MC slack
    atol = 0.012 if name == "multinomial" else 0.002
    np.testing.assert_allclose(freq, probs, atol=atol)


@pytest.mark.parametrize("name", ["multinomial", "systematic", "stratified"])
def test_resampler_shapes_and_range(name):
    key = jax.random.PRNGKey(1)
    log_w = jax.random.normal(key, (128,))
    idx = resampling.get_resampler(name)(key, log_w)
    assert idx.shape == (128,)
    assert idx.dtype == jnp.int32
    assert int(idx.min()) >= 0 and int(idx.max()) < 128


def test_degenerate_weights_pick_single_particle():
    key = jax.random.PRNGKey(2)
    log_w = jnp.full((32,), -jnp.inf).at[7].set(0.0)
    for name in resampling.RESAMPLERS:
        idx = resampling.get_resampler(name)(key, log_w)
        assert np.all(np.asarray(idx) == 7), name


def test_ess():
    log_w = jnp.zeros((16,))
    assert np.isclose(float(resampling.effective_sample_size(log_w)), 16.0)
    log_w = jnp.full((16,), -jnp.inf).at[0].set(0.0)
    assert np.isclose(float(resampling.effective_sample_size(log_w)), 1.0)


def test_multinomial_large_n_inverse_cdf_path():
    """Above _CATEGORICAL_MAX_N multinomial switches to iid-uniform
    inverse-CDF sampling (same law, O(n + N) memory): counts must still be
    proportional to the weights, and degenerate weights must collapse."""
    key = jax.random.PRNGKey(3)
    n = resampling._CATEGORICAL_MAX_N * 2
    # weights concentrated on a few indices so frequencies are testable
    log_w = jnp.full((n,), -jnp.inf).at[0].set(jnp.log(0.5)) \
        .at[n // 2].set(jnp.log(0.25)).at[n - 1].set(jnp.log(0.25))
    idx = np.asarray(jax.jit(resampling.multinomial_resampling)(key,
                                                                log_w))
    assert idx.shape == (n,) and idx.dtype == np.int32
    freq0 = (idx == 0).mean()
    freq_mid = (idx == n // 2).mean()
    freq_last = (idx == n - 1).mean()
    assert abs(freq0 - 0.5) < 0.02
    assert abs(freq_mid - 0.25) < 0.02
    assert abs(freq_last - 0.25) < 0.02
    assert freq0 + freq_mid + freq_last == 1.0
