"""fit_scan coverage of the remaining iter_types (ADAGRAD / SGRD /
SGLD-CV), matching `get_iter_step` (`sgmcmc_sampler.py:896-947`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.inference.samplers import LGSSMSampler, SVMSampler
from sgmcmc_tpu.models import lgssm as lgssm_mod
from sgmcmc_tpu.models import svm as svm_mod


@pytest.fixture(scope="module")
def svm_data():
    true = svm_mod.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    ys, _ = svm_mod.generate_data(jax.random.PRNGKey(0), true, 200)
    return true, ys


def test_fit_scan_adagrad_matches_stepwise_state(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=7, parameters=true)
    trace = s.fit_scan("ADAGRAD", num_iters=6, epsilon=0.01, N=50,
                       subsequence_length=16, buffer_length=2)
    assert trace.A.shape[0] == 6
    assert np.all(np.isfinite(np.asarray(trace.A)))
    # moment state persisted and non-zero after the run
    G = np.asarray(s._adagrad_state.G.A)
    assert np.all(G > 0)
    assert int(s._adagrad_state.t) == 6
    # a second call continues from the carried state
    s.fit_scan("ADAGRAD", num_iters=2, epsilon=0.01, N=50,
               subsequence_length=16, buffer_length=2)
    assert int(s._adagrad_state.t) == 8


def test_fit_scan_sgrd_lgssm():
    true = lgssm_mod.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.0,
                                   dtype=jnp.float64)
    ys, _ = lgssm_mod.generate_data(jax.random.PRNGKey(1), true, 150)
    s = LGSSMSampler(observations=ys, seed=8, parameters=true)
    trace = s.fit_scan("SGRD", num_iters=5, epsilon=0.05,
                       subsequence_length=16, buffer_length=4)
    assert trace.A.shape[0] == 5
    assert np.all(np.isfinite(np.asarray(trace.A)))


def test_fit_scan_sgld_cv(svm_data):
    true, ys = svm_data
    s = SVMSampler(observations=ys, seed=9, parameters=true)
    c_params = s.parameters
    c_grad = s.noisy_gradient(N=100, subsequence_length=64, buffer_length=8)
    trace = s.fit_scan("SGLD-CV", num_iters=6, epsilon=0.05,
                       centering_parameters=c_params,
                       centering_gradient=c_grad,
                       N=50, subsequence_length=16, buffer_length=2)
    assert trace.A.shape[0] == 6
    assert np.all(np.isfinite(np.asarray(trace.A)))
