"""Prediction-surface parity: lagged latent distr, y distr/sample,
simulate distributions (`predict`/`simulate` dispatch,
`sgmcmc_sampler.py:956-1123`; LGSSM helper `lgssm/helper.py:558-1014`).

Correctness anchors are internal consistency identities of the LGSSM:
* lag >= T-1 fixed-lag == smoothed; lag = 0 == filtered moments;
  lag = -k equals filtered propagated k transition steps;
* y_distr == C-projected latent distr plus R;
* Monte-Carlo means of y_sample / simulate_paths match the analytic
  distributions within standard error.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.inference.samplers import GaussHMMSampler, LGSSMSampler
from sgmcmc_tpu.models import lgssm
from sgmcmc_tpu.ops import kalman

PARAMS = lgssm.from_matrices(A=[[0.9]], C=[[1.0]], Q=[[0.4]], R=[[0.8]],
                             dtype=jnp.float64)
YS, XS = lgssm.generate_data(jax.random.PRNGKey(0), PARAMS, 30)


def test_fixed_lag_converges_to_smoothed():
    sm_mean, sm_cov = lgssm.latent_var_distr(PARAMS, YS, lag=None)
    fl_mean, fl_cov = lgssm.latent_var_distr(PARAMS, YS, lag=YS.shape[0])
    np.testing.assert_allclose(np.asarray(fl_mean), np.asarray(sm_mean),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fl_cov), np.asarray(sm_cov),
                               rtol=1e-8)


def test_lag_zero_is_filtered():
    f_mean, f_cov = kalman.filtered_moments(
        YS, PARAMS.A, PARAMS.C, PARAMS.LQinv, PARAMS.LRinv,
        lgssm.default_forward_message(PARAMS))
    l_mean, l_cov = lgssm.latent_var_distr(PARAMS, YS, lag=0)
    np.testing.assert_allclose(np.asarray(l_mean), np.asarray(f_mean),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(l_cov), np.asarray(f_cov),
                               rtol=1e-10)


def test_negative_lag_propagates_filtered():
    k = 2
    f_mean, f_cov = lgssm.latent_var_distr(PARAMS, YS, lag=0)
    p_mean, p_cov = lgssm.latent_var_distr(PARAMS, YS, lag=-k)
    A, Q = np.asarray(PARAMS.A), np.asarray(PARAMS.Q)
    mean_t = np.asarray(f_mean)[3]
    cov_t = np.asarray(f_cov)[3]
    for _ in range(k):
        mean_t = A @ mean_t
        cov_t = A @ cov_t @ A.T + Q
    np.testing.assert_allclose(np.asarray(p_mean)[3 + k], mean_t, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(p_cov)[3 + k], cov_t, rtol=1e-8)


def test_y_distr_matches_projection():
    x_mean, x_cov = lgssm.latent_var_distr(PARAMS, YS)
    y_mean, y_cov = lgssm.y_distr(PARAMS, YS)
    C, R = np.asarray(PARAMS.C), np.asarray(PARAMS.R)
    np.testing.assert_allclose(np.asarray(y_mean),
                               np.asarray(x_mean) @ C.T, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(y_cov),
        np.einsum('ij,tjk,lk->til', C, np.asarray(x_cov), C) + R,
        rtol=1e-10)


def test_y_sample_moments():
    S = 4000
    ys = np.asarray(lgssm.y_sample(PARAMS, jax.random.PRNGKey(3), YS,
                                   num_samples=S))
    assert ys.shape == (S, YS.shape[0], 1)
    y_mean, y_cov = lgssm.y_distr(PARAMS, YS)
    se = np.sqrt(np.asarray(y_cov)[:, 0, 0] / S)
    z = (ys.mean(0)[:, 0] - np.asarray(y_mean)[:, 0]) / se
    assert np.all(np.abs(z) < 5), z


def test_simulate_distr_and_paths_agree():
    T, S = 12, 4000
    d = lgssm.simulate_distr(PARAMS, T)
    p = lgssm.simulate_paths(PARAMS, jax.random.PRNGKey(4), T,
                             num_samples=S)
    xs = np.asarray(p["latent_vars"])            # [S, T+1, 1]
    se = np.sqrt(np.asarray(d["latent_vars_cov"])[:, 0, 0] / S)
    z = (xs.mean(0)[:, 0] - np.asarray(d["latent_vars_mean"])[:, 0]) / se
    assert np.all(np.abs(z) < 5), z
    v_ratio = xs.var(0)[:, 0] / np.asarray(d["latent_vars_cov"])[:, 0, 0]
    assert np.all((v_ratio > 0.85) & (v_ratio < 1.15)), v_ratio


def test_sampler_predict_dispatch():
    s = LGSSMSampler(observations=YS, parameters=PARAMS, seed=1)
    mean, cov = s.predict(target="latent", kind="marginal", lag=1)
    assert mean.shape == (YS.shape[0], 1)
    y_mean, y_cov = s.predict(target="y", kind="marginal")
    assert y_cov.shape == (YS.shape[0], 1, 1)
    draws = s.predict(target="y", kind="marginal", num_samples=3)
    assert draws.shape == (3, YS.shape[0], 1)
    sim = s.simulate(10, return_distr=True)
    assert sim["obs_mean"].shape == (11, 1)
    sim2 = s.simulate(10, num_samples=2)
    assert sim2["observations"].shape == (2, 11, 1)


def test_hmm_predict_probs():
    from sgmcmc_tpu.models import gauss_hmm
    prms = gauss_hmm.from_values(
        pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-2.0], [2.0]],
        R=[[[0.3]], [[0.3]]], dtype=jnp.float64)
    ys, zs = gauss_hmm.generate_data(jax.random.PRNGKey(1), prms, 40)
    s = GaussHMMSampler(observations=ys, num_states=2, m=1,
                        parameters=prms, seed=0)
    probs = s.predict(target="latent", kind="marginal")
    assert probs.shape == (40, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-8)
    acc = max(np.mean(probs.argmax(-1) == np.asarray(zs)),
              np.mean(1 - probs.argmax(-1) == np.asarray(zs)))
    assert acc > 0.9


def test_reference_name_aliases():
    """`latent_var_distr` / `y_distr` / `y_sample` / `simulate_distr` /
    `prior_init` are thin aliases over predict/simulate (drop-in names from
    `sgmcmc_sampler.py:956-1123`)."""
    s = LGSSMSampler(observations=YS, parameters=PARAMS, seed=1)
    m1, c1 = s.latent_var_distr(kind="marginal", lag=1)
    m2, c2 = s.predict(target="latent", kind="marginal", lag=1)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
    ym, yc = s.y_distr(kind="marginal")
    assert yc.shape == (YS.shape[0], 1, 1)
    draws = s.y_sample(num_samples=2, kind="marginal")
    assert draws.shape == (2, YS.shape[0], 1)
    sim = s.simulate_distr(10)
    assert sim["obs_mean"].shape == (11, 1)
    p_before = s.parameters
    p_new = s.prior_init()
    assert p_new is s.parameters
    assert float(np.asarray(p_before.A[0, 0])) != float(
        np.asarray(p_new.A[0, 0]))


def test_hmm_lag_modes():
    """HMM latent_var_distr lag modes (`hmm_helper.py:200-273`):
    lag=0 filtered == forward messages; large lag == smoothed; lag<0
    propagates the filtered distribution through Pi."""
    from sgmcmc_tpu.models import gauss_hmm
    from sgmcmc_tpu.ops import hmm as hmm_ops

    prms = gauss_hmm.from_values(
        pi=[[0.9, 0.1], [0.2, 0.8]], mu=[[-2.0], [2.0]],
        R=[[[0.3]], [[0.3]]], dtype=jnp.float64)
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(2), prms, 30)
    T = ys.shape[0]

    smoothed = gauss_hmm.latent_var_distr(prms, ys)
    filt = gauss_hmm.latent_var_distr(prms, ys, lag=0)
    logP = gauss_hmm.emission_logliks(prms, ys)
    fwd = hmm_ops.forward_messages(logP, prms.pi,
                                   gauss_hmm.default_forward_message(prms))
    np.testing.assert_allclose(np.asarray(filt), np.asarray(fwd.prob[1:]),
                               rtol=1e-12)

    # a lag covering the whole remaining sequence reproduces smoothing
    full_lag = gauss_hmm.latent_var_distr(prms, ys, lag=T)
    np.testing.assert_allclose(np.asarray(full_lag), np.asarray(smoothed),
                               rtol=1e-8, atol=1e-10)

    # small fixed lag lies between filtered and smoothed at the start,
    # and the rows are normalized
    lag2 = gauss_hmm.latent_var_distr(prms, ys, lag=2)
    np.testing.assert_allclose(lag2.sum(-1), 1.0, rtol=1e-10)
    # fixed-lag(2) must equal smoothed for t >= T-1-2 ... exactly at the
    # tail where the window covers everything remaining
    np.testing.assert_allclose(np.asarray(lag2[-1]),
                               np.asarray(smoothed[-1]), rtol=1e-8)

    pred = gauss_hmm.latent_var_distr(prms, ys, lag=-1)
    manual = np.asarray(fwd.prob[:-1] @ np.asarray(prms.pi))
    np.testing.assert_allclose(np.asarray(pred),
                               manual / manual.sum(-1, keepdims=True),
                               rtol=1e-10)

    # Sampler.predict passes lag through for discrete models
    from sgmcmc_tpu.inference.samplers import GaussHMMSampler
    s = GaussHMMSampler(observations=np.asarray(ys), num_states=2, m=1,
                        parameters=prms, seed=0)
    probs = s.predict(target="latent", kind="marginal", lag=0)
    np.testing.assert_allclose(probs, np.asarray(filt), rtol=1e-10)


def test_marginal_distr_latent_sampling_matches_moments():
    """distr='marginal' draws match the per-t moments of latent_var_distr
    (reference `predict` contract, `sgmcmc_sampler.py:1025-1045`)."""
    import jax
    mean, cov = lgssm.latent_var_distr(PARAMS, YS, lag=None)
    S = 4000
    x = lgssm.latent_var_sample(PARAMS, jax.random.PRNGKey(0), YS,
                                num_samples=S, distr="marginal")
    assert x.shape == (S,) + np.asarray(mean).shape
    emp_mean = np.mean(np.asarray(x), axis=0)
    emp_var = np.var(np.asarray(x), axis=0)
    se = np.sqrt(np.asarray(cov)[:, 0, 0] / S)
    assert np.all(np.abs(emp_mean - np.asarray(mean)) < 5 * se + 1e-3)
    np.testing.assert_allclose(np.mean(emp_var),
                               np.mean(np.asarray(cov)[:, 0, 0]), rtol=0.1)
    # lagged marginal sampling threads lag through
    xf = lgssm.latent_var_sample(PARAMS, jax.random.PRNGKey(1), YS,
                                 num_samples=1000, distr="marginal", lag=0)
    f_mean, _ = lgssm.latent_var_distr(PARAMS, YS, lag=0)
    err = np.mean(np.asarray(xf), axis=0) - np.asarray(f_mean)
    assert np.sqrt(np.mean(err ** 2)) < 0.1
    # joint + lag is a contract violation
    import pytest
    with pytest.raises(ValueError):
        lgssm.latent_var_sample(PARAMS, jax.random.PRNGKey(2), YS,
                                distr="joint", lag=1)


def test_marginal_distr_y_sampling():
    import jax
    y_mean, y_cov = lgssm.y_distr(PARAMS, YS, lag=None)
    S = 3000
    y = lgssm.y_sample(PARAMS, jax.random.PRNGKey(3), YS, num_samples=S,
                       distr="marginal")
    emp = np.mean(np.asarray(y), axis=0)
    se = np.sqrt(np.asarray(y_cov)[:, 0, 0] / S)
    assert np.all(np.abs(emp - np.asarray(y_mean)) < 5 * se + 1e-3)


def test_hmm_marginal_z_sampling_matches_probs():
    import jax
    from sgmcmc_tpu.models import gauss_hmm
    prms = gauss_hmm.from_values(
        pi=np.array([[0.9, 0.1], [0.2, 0.8]]),
        mu=np.array([[-2.0], [2.0]]),
        R=np.array([[[0.5]], [[0.5]]]))
    ys, _ = gauss_hmm.generate_data(jax.random.PRNGKey(4), prms, 60)
    probs = np.asarray(gauss_hmm.latent_var_distr(prms, ys))
    S = 2000
    z = gauss_hmm.latent_var_sample(prms, jax.random.PRNGKey(5), ys,
                                    distr="marginal", num_samples=S)
    freq = np.mean(np.asarray(z) == 1, axis=0)
    assert np.max(np.abs(freq - probs[:, 1])) < 0.06
    # sampler dispatch
    from sgmcmc_tpu.inference.samplers import GaussHMMSampler
    s = GaussHMMSampler(ys, num_states=2, m=1, seed=0)
    s.parameters = prms
    draws = s.predict(target="latent", kind="marginal", num_samples=8,
                      distr="marginal")
    assert draws.shape == (8, 60)
