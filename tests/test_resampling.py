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
