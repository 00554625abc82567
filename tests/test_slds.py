"""SLDS: conditional message passing, complete-data score, blocked Gibbs."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgmcmc_tpu.models import lgssm as lgssm_mod
from sgmcmc_tpu.models import slds


def make_params(K=2, n=1, m=1, seed=0):
    rng = np.random.default_rng(seed)
    pi = rng.dirichlet(np.ones(K) * 5, size=K)
    A = np.stack([np.eye(n) * a for a in np.linspace(0.3, 0.9, K)])
    Q = np.stack([np.eye(n) * q for q in np.linspace(0.3, 0.6, K)])
    C = np.eye(m, n)
    R = np.eye(m) * 0.4
    return slds.from_values(pi, A, Q, C, R)


def test_x_marginal_matches_lgssm_when_single_state_path():
    """With z constant, the conditional x-likelihood must equal the plain
    LGSSM marginal likelihood with that state's matrices."""
    params = make_params(K=2, n=1, m=1)
    T = 12
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(0), params, T)
    for k in range(2):
        z_const = jnp.full((T,), k, jnp.int32)
        ll_slds = float(slds.x_marginal_loglikelihood(params, ys, z_const))
        lg = lgssm_mod.LGSSMParams(
            A=params.A[k], C=params.C,
            LQinv_vec=params.LQinv_vec[k],
            LRinv_vec=params.LRinv_vec)
        ll_lgssm = float(lgssm_mod.marginal_loglikelihood(lg, ys))
        np.testing.assert_allclose(ll_slds, ll_lgssm, rtol=1e-9)


def test_x_ffbs_mean_matches_conditional_smoother():
    params = make_params(K=2, n=1, m=1, seed=1)
    T = 20
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(1), params, T)
    samples = jax.vmap(
        lambda k: slds.x_latent_var_sample(params, k, ys, zs))(
        jax.random.split(jax.random.PRNGKey(2), 2000))
    emp = np.asarray(samples).mean(axis=0)
    # conditional smoothed mean via constant-state LGSSM when z constant:
    # instead check tracking of truth (statistical)
    err = np.mean((emp[:, 0] - np.asarray(xs)[:, 0]) ** 2)
    base = np.mean(np.asarray(xs)[:, 0] ** 2)
    assert err < base, (err, base)


def test_z_messages_recover_states():
    params = make_params(K=2, n=1, m=1, seed=2)
    # well-separated dynamics
    params = slds.from_values(
        pi=[[0.95, 0.05], [0.05, 0.95]],
        A=np.stack([np.eye(1) * 0.95, np.eye(1) * -0.9]),
        Q=np.stack([np.eye(1) * 0.1, np.eye(1) * 0.1]),
        C=np.eye(1), R=np.eye(1) * 0.05)
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(3), params, 300)
    z_draw = slds.z_latent_var_sample(params, jax.random.PRNGKey(4), ys, xs)
    acc = np.mean(np.asarray(z_draw) == np.asarray(zs))
    assert max(acc, 1 - acc) > 0.8, acc


def test_complete_data_gradient_finite_and_consistent():
    params = make_params(K=2, n=2, m=2, seed=3)
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(5), params, 15)
    g = slds.gradient_complete_data_loglikelihood(params, ys, xs, zs)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # numerical check on one coordinate
    eps = 1e-6
    C = jnp.asarray(params.C)
    p_plus = params.replace(C=C.at[0, 0].add(eps))
    p_minus = params.replace(C=C.at[0, 0].add(-eps))
    fd = (float(slds.complete_data_loglikelihood(p_plus, ys, xs, zs))
          - float(slds.complete_data_loglikelihood(p_minus, ys, xs, zs))
          ) / (2 * eps)
    np.testing.assert_allclose(float(g.C[0, 0]), fd, rtol=1e-4)


def test_marginal_requires_conditioning():
    params = make_params()
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(6), params, 10)
    import pytest
    with pytest.raises(NotImplementedError):
        slds.marginal_loglikelihood(params, ys)
    assert np.isfinite(float(slds.marginal_loglikelihood(params, ys, z=zs)))
    assert np.isfinite(float(slds.marginal_loglikelihood(params, ys, x=xs)))


def test_blocked_gibbs_runs_and_stays_finite():
    params = make_params(K=2, n=1, m=1, seed=4)
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(7), params, 200)
    prior = slds.default_prior(2, 1, 1, var=10.0)
    p = slds.sample_prior(prior, jax.random.PRNGKey(8))
    p = slds.project_parameters(p, fix_C_eye=True)
    x, z = xs, zs
    step = jax.jit(slds.gibbs_step)
    for i in range(10):
        p, x, z = step(jax.random.PRNGKey(100 + i), prior, p, ys, x, z)
        p = slds.project_parameters(p)
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_slds_sampler_class():
    from sgmcmc_tpu.inference.samplers import SLDSSampler
    params = make_params(K=2, n=1, m=1, seed=9)
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(10), params, 150)
    s = SLDSSampler(observations=ys, num_states=2, n=1, m=1, seed=11)
    s.fit(8)
    assert np.isfinite(s.exact_loglikelihood(given="z"))
    assert np.isfinite(s.exact_loglikelihood(given="x"))
    trace = s.fit(3, output_all=True)
    assert len(trace) == 4


def test_slds_sgld_complete_gradient_runs_and_moves():
    """Buffered complete-data SGLD for the SLDS (the reference's
    kind='complete' path, `slds/sampler.py:491-660`, with the intended
    accumulation semantics): parameters stay finite and the A estimate
    moves toward truth on easily-identified data."""
    import numpy as np
    from sgmcmc_tpu.inference.samplers import SLDSSampler

    true = slds.from_values(
        pi=np.array([[0.95, 0.05], [0.05, 0.95]]),
        A=np.stack([0.9 * np.eye(1), -0.9 * np.eye(1)]),
        Q=np.stack([0.1 * np.eye(1), 0.1 * np.eye(1)]),
        C=np.eye(1), R=0.05 * np.eye(1))
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(0), true, 400)
    s = SLDSSampler(ys, num_states=2, n=1, m=1, seed=1)
    g = s.noisy_gradient(subsequence_length=32, buffer_length=8,
                         latent_burnin=4, latent_draws=2,
                         latent_thinning=2)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.isfinite(s.noisy_loglikelihood(subsequence_length=32,
                                             buffer_length=8))
    for _ in range(30):
        s.sample_sgld(epsilon=0.02, subsequence_length=32, buffer_length=8,
                      latent_burnin=4)
    for leaf in jax.tree_util.tree_leaves(s.parameters):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_slds_logprior_grad_matches_autodiff_shape():
    import numpy as np
    prior = slds.default_prior(2, 1, 1, var=10.0)
    params = slds.sample_prior(prior, jax.random.PRNGKey(3))
    lp = float(slds.logprior(prior, params))
    assert np.isfinite(lp)
    g = slds.grad_logprior(prior, params)
    for name in ["logit_pi", "A", "LQinv_vec", "C", "LRinv_vec"]:
        leaf = np.asarray(getattr(g, name))
        assert leaf.shape == np.asarray(getattr(params, name)).shape
        assert np.all(np.isfinite(leaf)), name


def test_slds_complete_sgld_matches_gibbs_moments():
    """Distributional anchor for the SLDS buffered complete-data SGLD
    (the family's only gradient — `slds/sampler.py:491-660` documented
    semantics): posterior moments of the per-state dynamics (A_k) and
    latent scales (LQinv_k) from a long full-sequence SGLD chain match
    the blocked-Gibbs trace.  The stiff LRinv and logit_pi coordinates
    are excluded: unpreconditioned Langevin under-disperses them at any
    step size that keeps A stable (measured shift 0.5-1.1 sd, ratio
    0.34-0.38 at eps=5e-3) — the same stiffness the LGSSM KS protocol
    handles with SGRLD preconditioning, which the SLDS family lacks by
    reference contract."""
    import jax
    import numpy as np
    from sgmcmc_tpu.inference.samplers import SLDSSampler

    true = slds.from_values(
        pi=np.array([[0.95, 0.05], [0.05, 0.95]]),
        A=np.array([[[0.9]], [[-0.9]]]),
        Q=np.array([[[0.3]], [[0.3]]]),
        C=np.array([[1.0]]), R=np.array([[0.1]]))
    ys, xs, zs = slds.generate_data(jax.random.PRNGKey(3), true, 200)

    g = SLDSSampler(ys, num_states=2, seed=1, parameters=true)
    gibbs = []
    for i in range(1500):
        g.sample_gibbs()
        g.project_parameters()
        if i >= 300:
            gibbs.append(g.parameters)

    s = SLDSSampler(ys, num_states=2, seed=2, parameters=true)
    sg = []
    for i in range(6000):
        s.sample_sgld(epsilon=5e-3, subsequence_length=-1,
                      latent_draws=1, latent_burnin=8, latent_thinning=0)
        if i >= 2000:
            sg.append(s.parameters)

    def col(trace, name, idx):
        return np.array([np.ravel(np.asarray(getattr(p, name)))[idx]
                         for p in trace])

    # measured at these seeds: shifts 0.09-0.29 sd, ratios 0.65-1.03
    for name, idx in [("A", 0), ("A", 1),
                      ("LQinv_vec", 0), ("LQinv_vec", 1)]:
        ga, sa = col(gibbs, name, idx), col(sg, name, idx)
        shift = abs(ga.mean() - sa.mean()) / ga.std()
        ratio = sa.std() / ga.std()
        assert shift < 0.5, (name, idx, shift)
        assert 0.5 < ratio < 1.6, (name, idx, ratio)


@pytest.mark.skipif(not os.path.exists("/root/reference"),
                    reason="reference package not mounted")
def test_gibbs_posterior_params_match_reference():
    """Adjudication regression (r5): every conjugate posterior
    hyperparameter of the theta | x, z, y Gibbs blocks matches the
    reference's calc_gibbs_sufficient_statistic + per-variable posterior
    formulas on a fixed (y, x, z) — up to the reference's documented Q-df
    off-by-one (it counts z_0's state, which has no incoming transition;
    `slds/helper.py:1277`).  Full harness: artifacts/slds_adjudicate.py."""
    import sys
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "artifacts"))
    from slds_adjudicate import ref_posterior_params

    from sgmcmc_ssm.models.slds import SLDSParameters
    from sgmcmc_ssm.models.slds import SLDSSampler as RefSampler

    key = jax.random.PRNGKey(3)
    true = slds.from_values([[0.95, 0.05], [0.05, 0.95]],
                            [[[0.9]], [[-0.9]]],
                            [[[0.5]], [[0.5]]], [[1.0]], [[0.5]])
    ys, xs, zs = slds.generate_data(key, true, 120)
    ys_np = np.asarray(ys, np.float64)
    r = RefSampler(num_states=2, n=1, m=1, observations=ys_np)
    r.parameters = SLDSParameters(
        logit_pi=np.log(np.array([[0.95, 0.05], [0.05, 0.95]])),
        A=np.array([[[0.9]], [[-0.9]]]),
        LQinv=np.full((2, 1, 1), 0.5 ** -0.5),
        C=np.array([[1.0]]), LRinv=np.array([[0.5 ** -0.5]]))

    prior = slds.default_prior(2, 1, 1)
    ours = jax.device_get(slds.gibbs_posterior_params(prior, ys, xs, zs))
    ref = ref_posterior_params(r, ys_np, np.asarray(xs, np.float64),
                               np.asarray(zs, np.int64))
    for name in ["alpha_pi", "df_Q", "scale_Q", "mean_A", "Spp_A",
                 "df_R", "scale_R", "mean_C", "Spp_C"]:
        a = np.ravel(np.asarray(ours[name], np.float64))
        b = np.ravel(np.asarray(ref[name], np.float64))
        if name == "df_Q":
            assert np.all(np.abs(a - b) <= 1.0 + 1e-9), (name, a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-9, err_msg=name)


def test_z_sampler_matches_exact_forward_backward_oracle():
    """SLDS adjudication regression (r5): the z | x FFBS sampler's
    smoothed occupancy, transition, and z_0 marginals match the exact
    K=2 forward-backward enumeration.  This is the conditional where the
    reference is provably biased — its forward sampler draws z_0 without
    the backward message (`slds/helper.py:992-1004`), i.e. from the
    prior; measured 21 sigma off the exact z_0 marginal while ours sits
    at z < 1.3 (artifacts/slds_adjudication.md part 1b)."""
    T = 200
    true = slds.from_values([[0.95, 0.05], [0.05, 0.95]],
                            [[[0.9]], [[-0.9]]],
                            [[[0.5]], [[0.5]]], [[1.0]], [[0.5]])
    key = jax.random.PRNGKey(11)
    ys, xs, _ = slds.generate_data(key, true, T)

    # exact forward-backward marginals in f64
    logP = np.asarray(slds.ar_logliks(true, xs), np.float64)
    P = np.exp(logP - logP.max(axis=1, keepdims=True))
    pi = np.asarray(jax.nn.softmax(np.asarray(true.logit_pi), -1),
                    np.float64)
    alpha = np.zeros((T, 2))
    a = (np.ones(2) / 2) @ pi * P[0]
    alpha[0] = a / a.sum()
    for t in range(1, T):
        a = (alpha[t - 1] @ pi) * P[t]
        alpha[t] = a / a.sum()
    beta = np.ones((T, 2))
    for t in range(T - 2, -1, -1):
        b = pi @ (P[t + 1] * beta[t + 1])
        beta[t] = b / b.sum()
    marg = alpha * beta
    marg /= marg.sum(axis=1, keepdims=True)

    M = 4000
    draw = jax.jit(jax.vmap(
        lambda k: slds.z_latent_var_sample(true, k, ys, xs)))
    zs = np.asarray(draw(jax.random.split(jax.random.fold_in(key, 1), M)))

    n1 = (zs == 1).sum(axis=1).astype(np.float64)
    exact_n1 = marg[:, 1].sum()
    z_occ = abs(n1.mean() - exact_n1) / (n1.std(ddof=1) / np.sqrt(M))
    assert z_occ < 4.0, (n1.mean(), exact_n1, z_occ)

    p0 = (zs[:, 0] == 1).mean()
    se0 = max(np.sqrt(marg[0, 1] * (1 - marg[0, 1]) / M), 1e-6)
    assert abs(p0 - marg[0, 1]) / se0 < 4.0, (p0, marg[0, 1])
