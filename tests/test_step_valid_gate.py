"""Validity gating of padded PF windows: outputs must be invariant to the
CONTENTS of invalid rows (the gate freezes the carry, so fake observations
beyond the true sequence end cannot leak into the estimate) — exact, not
statistical, because the PRNG stream is identical for both runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops.buffered import run_buffered_pf

W, T_REAL, N = 24, 16, 64


def _padded(fill):
    ys = jax.random.normal(jax.random.PRNGKey(0), (T_REAL, 1), jnp.float32)
    pad = jnp.full((W - T_REAL, 1), fill, jnp.float32)
    return jnp.concatenate([ys, pad])


@pytest.mark.parametrize("smoother", ["poyiadjis_N", "paris", "filter"])
def test_gather_path_invariant_to_padding(smoother):
    p = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    valid = (jnp.arange(W) < T_REAL).astype(jnp.float32)

    def run(obs):
        out = run_buffered_pf(
            svm.KERNEL, svm.grad_statistic, p, obs,
            key=jax.random.PRNGKey(1), n_particles=N, statistic_dim=3,
            smoother=smoother, step_weights=valid, in_window=valid,
            step_valid=valid)
        return np.asarray(out.mean_statistic), float(out.loglikelihood)

    s_a, ll_a = run(_padded(0.0))
    s_b, ll_b = run(_padded(37.5))
    np.testing.assert_array_equal(s_a, s_b)
    assert ll_a == ll_b


def test_fused_valid_gate_invariant_to_padding():
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score
    p = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    valid = (jnp.arange(W) < T_REAL).astype(jnp.float32)

    def run(obs):
        stat, ll = fused_pf_score(
            svm.FUSED, jax.random.PRNGKey(2), p, obs, valid, N, 0.0, 1.0,
            lambduh=1.0, interpret=True, step_valid=valid)
        return np.asarray(stat), float(ll)

    s_a, ll_a = run(_padded(0.0))
    s_b, ll_b = run(_padded(-12.25))
    np.testing.assert_array_equal(s_a, s_b)
    assert ll_a == ll_b


def test_fused_valid_gate_loglik_counts_all_real_steps():
    """The deferred loglik bookkeeping under gating: the gated padded run's
    loglik must equal the ungated run on the REAL prefix in distribution —
    check the exact number of accumulated increments by comparing against
    a run whose weights count the same steps (both runs share the W-shaped
    PRNG stream, so equality is exact)."""
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score
    p = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    obs = _padded(0.0)
    valid = (jnp.arange(W) < T_REAL).astype(jnp.float32)
    # gated run
    _, ll_gated = fused_pf_score(
        svm.FUSED, jax.random.PRNGKey(3), p, obs, valid, N, 0.0, 1.0,
        lambduh=1.0, interpret=True, step_valid=valid)
    # ungated run with the same weights on identical data: the padded tail
    # steps change the PF state but carry zero weight; at the boundary the
    # deferred increment for the last real step must match the gated run's
    _, ll_ungated = fused_pf_score(
        svm.FUSED, jax.random.PRNGKey(3), p, obs, valid, N, 0.0, 1.0,
        lambduh=1.0, interpret=True)
    # identical up to the last real step's increment being computed from
    # the same (frozen vs evolved-at-that-point-identical) weights: before
    # the first padded step both runs are bitwise equal, so the increments
    # for all real steps agree
    np.testing.assert_allclose(float(ll_gated), float(ll_ungated),
                               rtol=1e-6)
