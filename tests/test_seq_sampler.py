"""Multi-sequence (Seq) sampler: packing, weighting, end-to-end SGLD."""
import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.inference.samplers import SeqSVMSampler, pack_sequences
from sgmcmc_tpu.models import svm


def make_sequences(seed=0, n_seq=4):
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    seqs = []
    for i, T in enumerate([80, 120, 64, 100][:n_seq]):
        ys, _ = svm.generate_data(jax.random.fold_in(key, i), true, T)
        seqs.append(np.asarray(ys))
    return true, seqs


def test_pack_sequences():
    _, seqs = make_sequences()
    packed, lengths = pack_sequences(seqs)
    assert packed.shape == (4, 120, 1)
    np.testing.assert_array_equal(lengths, [80, 120, 64, 100])
    np.testing.assert_allclose(np.asarray(packed[0, :80]), seqs[0])
    assert np.all(np.asarray(packed[0, 80:]) == 0)


def test_seq_sgld_runs_and_moves(seed=1):
    true, seqs = make_sequences(seed)
    s = SeqSVMSampler(seqs, seed=2)
    s.parameters = svm.from_scalars(A=0.3, Q=1.5, R=2.0, dtype=jnp.float64)
    assert s.T == sum(x.shape[0] for x in seqs)
    for _ in range(40):
        s.sample_sgld(epsilon=0.1, N=64, subsequence_length=16,
                      buffer_length=4)
        s.project_parameters()
    assert float(s.parameters.A[0, 0]) > 0.4
    assert np.isfinite(s.noisy_loglikelihood(N=64, subsequence_length=16,
                                             buffer_length=4))


def test_seq_subsampling_sequences():
    true, seqs = make_sequences(3)
    s = SeqSVMSampler(seqs, num_sequences=2, seed=4, parameters=true)
    g = s.noisy_gradient(N=32, subsequence_length=16, buffer_length=2)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_seq_full_sequence_ld_matches_per_sequence_scores():
    """S=-1 (LD over all sequences): the seq estimator's score must equal
    the sum of independent full-window scores per sequence within
    Monte-Carlo error (`SeqSGMCMCSampler` with subsequence_length=-1,
    `sgmcmc_sampler.py:1157-1423`)."""
    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.inference.samplers import pack_sequences

    true, seqs = make_sequences(7)
    packed, lengths = pack_sequences(seqs)
    packed = jnp.asarray(packed)
    cfg = sgmcmc.PFScoreConfig(n_particles=64, subsequence_length=-1,
                               smoother="poyiadjis_N",
                               resampler="systematic")
    pmv = lambda p: (0.0, svm.stationary_variance(p))
    seq_score = sgmcmc.make_seq_pf_score_fn(
        svm.KERNEL, svm.grad_statistic, 3, svm.unpack_grad, cfg, lengths,
        prior_mean_var_fn=pmv)
    R = 40
    f = jax.jit(lambda k: seq_score(k, true, packed)[0])
    seq_g = np.stack([
        np.asarray(f(jax.random.fold_in(jax.random.PRNGKey(0), i)).A)
        for i in range(R)])[:, 0, 0]

    # per-sequence full-window scores, summed (score fns built & jitted
    # once — rebuilding them per rep recompiles the same program ~160x,
    # which is slow and has segfaulted XLA's CPU compiler under the full
    # suite's accumulated compile pressure)
    per_seq_fns = [
        jax.jit(sgmcmc.make_pf_score_fn(
            svm.KERNEL, svm.grad_statistic, 3, svm.unpack_grad, cfg,
            obs.shape[0], prior_mean_var_fn=pmv))
        for obs in seqs]
    seq_arrays = [jnp.asarray(obs) for obs in seqs]

    def per_seq(key):
        tot = 0.0
        for j, (one, obs) in enumerate(zip(per_seq_fns, seq_arrays)):
            g, _ = one(jax.random.fold_in(key, j), true, obs)
            tot = tot + g.A[0, 0]
        return float(tot)

    ind_g = np.array([per_seq(jax.random.fold_in(jax.random.PRNGKey(1), i))
                      for i in range(R)])
    se = np.sqrt(seq_g.var() / R + ind_g.var() / R)
    assert abs(seq_g.mean() - ind_g.mean()) < 5 * se + 1e-6, \
        (seq_g.mean(), ind_g.mean(), se)


def test_seq_marginal_full_matches_sum_of_exact_gradients():
    """kind='marginal', S=-1: the seq score equals the sum of exact
    per-sequence Kalman gradients exactly (no MC noise)."""
    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.inference.samplers import pack_sequences
    from sgmcmc_tpu.models import lgssm

    true = lgssm.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.0)
    key = jax.random.PRNGKey(11)
    seqs = [np.asarray(lgssm.generate_data(jax.random.fold_in(key, i),
                                           true, T)[0])
            for i, T in enumerate([40, 60, 50])]
    packed, lengths = pack_sequences(seqs)
    cfg = sgmcmc.PFScoreConfig(n_particles=1, subsequence_length=-1)
    score = sgmcmc.make_seq_marginal_score_fn(
        lgssm.windowed_marginal_gradient, cfg, lengths)
    g, ll = jax.jit(score)(jax.random.PRNGKey(0), true, jnp.asarray(packed))

    exact = None
    ll_exact = 0.0
    for obs in seqs:
        gi = lgssm.gradient_marginal_loglikelihood(true, jnp.asarray(obs))
        ll_exact += float(lgssm.marginal_loglikelihood(true,
                                                       jnp.asarray(obs)))
        exact = gi if exact is None else jax.tree_util.tree_map(
            jnp.add, exact, gi)
    for name in ["A", "C", "LQinv_vec", "LRinv_vec"]:
        np.testing.assert_allclose(np.asarray(getattr(g, name)),
                                   np.asarray(getattr(exact, name)),
                                   rtol=1e-8, err_msg=name)
    np.testing.assert_allclose(float(ll), ll_exact, rtol=1e-8)


def test_seq_marginal_subsequence_unbiased():
    """kind='marginal' with finite S: the buffered seq estimator is
    unbiased for the summed exact gradient as the buffer covers the
    sequences (B large => bias ~ 0; average over start draws)."""
    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.inference.samplers import pack_sequences
    from sgmcmc_tpu.models import lgssm

    true = lgssm.from_matrices(A=0.7, C=1.0, Q=0.4, R=0.8)
    key = jax.random.PRNGKey(13)
    seqs = [np.asarray(lgssm.generate_data(jax.random.fold_in(key, i),
                                           true, T)[0])
            for i, T in enumerate([48, 64])]
    packed, lengths = pack_sequences(seqs)
    cfg = sgmcmc.PFScoreConfig(n_particles=1, subsequence_length=16,
                               buffer_length=16)
    score = jax.jit(sgmcmc.make_seq_marginal_score_fn(
        lgssm.windowed_marginal_gradient, cfg, lengths))
    packed = jnp.asarray(packed)
    R = 400
    gs = [score(jax.random.fold_in(jax.random.PRNGKey(1), i), true,
                packed)[0].A for i in range(R)]
    est = np.mean(np.stack([np.asarray(g) for g in gs])[:, 0, 0])
    exact = sum(float(lgssm.gradient_marginal_loglikelihood(
        true, jnp.asarray(o)).A[0, 0]) for o in seqs)
    se = np.std([float(np.asarray(g)[0, 0]) for g in gs]) / np.sqrt(R)
    assert abs(est - exact) < 4 * se + 0.05, (est, exact, se)


def test_seq_hmm_and_arphmm_samplers_run():
    from sgmcmc_tpu.inference.samplers import (SeqARPHMMSampler,
                                               SeqGaussHMMSampler,
                                               SeqLGSSMSampler)
    from sgmcmc_tpu.models import arphmm, gauss_hmm, lgssm

    # GaussHMM
    p_h = gauss_hmm.from_values(
        pi=np.array([[0.9, 0.1], [0.2, 0.8]]),
        mu=np.array([[-1.0], [1.0]]),
        R=np.array([[[0.3]], [[0.3]]]))
    key = jax.random.PRNGKey(21)
    seqs_h = [np.asarray(gauss_hmm.generate_data(
        jax.random.fold_in(key, i), p_h, T)[0]) for i, T in
        enumerate([60, 80])]
    s = SeqGaussHMMSampler(seqs_h, num_states=2, m=1, seed=5)
    s.sample_sgld(epsilon=0.05, subsequence_length=16, buffer_length=4)
    s.project_parameters()
    assert np.isfinite(s.exact_loglikelihood())

    # ARPHMM (3-D lag-stacked sequences exercise pack_sequences)
    rng = np.random.default_rng(0)
    p_a = arphmm.from_values(
        pi=np.array([[0.9, 0.1], [0.2, 0.8]]),
        D=0.4 * rng.normal(size=(2, 1, 1)),
        R=np.stack([np.eye(1) * 0.4, np.eye(1) * 0.6]))
    seqs_a = [np.asarray(arphmm.generate_data(
        jax.random.fold_in(key, 10 + i), p_a, T)[0]) for i, T in
        enumerate([50, 70])]
    s = SeqARPHMMSampler(seqs_a, num_states=2, m=1, p=1, seed=6)
    s.sample_sgld(epsilon=0.05, subsequence_length=16, buffer_length=4)
    s.project_parameters()
    assert np.isfinite(s.exact_loglikelihood())

    # LGSSM seq sampler: marginal is the default kind only for non-PF
    # models; LGSSM has a PF, so ask for kind='marginal' explicitly.
    p_l = lgssm.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.0)
    seqs_l = [np.asarray(lgssm.generate_data(
        jax.random.fold_in(key, 20 + i), p_l, T)[0]) for i, T in
        enumerate([40, 56])]
    s = SeqLGSSMSampler(seqs_l, seed=7)
    s.sample_sgld(epsilon=0.05, kind="marginal", subsequence_length=16,
                  buffer_length=4)
    s.sample_sgld(epsilon=0.05, kind="pf", N=32, subsequence_length=16,
                  buffer_length=4)
    s.project_parameters()
    assert np.isfinite(s.exact_loglikelihood())


def test_seq_predict_and_predictive_loglikelihood():
    true, seqs = make_sequences(9, n_seq=3)
    s = SeqSVMSampler(seqs, seed=11, parameters=true)
    preds = s.predict(target="latent", kind="pf", N=64)
    assert len(preds) == 3
    # pf models return an array over prediction lags (slot 0 = loglik),
    # like the reference (`svm/helper.py:187-247`); the Seq version sums
    # per-sequence arrays
    pll = s.predictive_loglikelihood(N=64, num_steps_ahead=2)
    assert np.all(np.isfinite(pll))
    pll_sub = s.predictive_loglikelihood(num_sequences=2, N=64,
                                         num_steps_ahead=2)
    assert np.all(np.isfinite(pll_sub))


def test_seq_predictive_loglikelihood_padded_matches_per_sequence():
    """The batched PF predictive path (one vmapped padded program with
    step_valid + valid_length) must equal the per-sequence unpadded run
    bit-for-bit at the same keys, and must not build per-sequence
    sub-samplers (one compile for all segment lengths)."""
    from sgmcmc_tpu.ops.buffered import run_buffered_pf
    from sgmcmc_tpu.models.registry import get_model

    true, seqs = make_sequences(15, n_seq=3)     # lengths 80, 120, 64
    s = SeqSVMSampler(seqs, seed=13, parameters=true)
    K, N = 2, 64
    pll = s.predictive_loglikelihood(N=N, num_steps_ahead=K,
                                     resample_mode="gather")
    assert pll.shape == (K + 1,) and np.all(np.isfinite(pll))
    # one compiled program, no per-sequence sub-sampler views
    assert any(k[0] == "seq_pred_ll" for k in s._cache)
    assert not any(isinstance(k, tuple) and k[0] == "sub"
                   for k in s._cache)

    # ops-level parity: padded + masked == truncated, same key
    m = get_model("svm")
    T_i = seqs[2].shape[0]
    T_max = 120
    padded = jnp.zeros((T_max, 1), jnp.float64).at[:T_i].set(seqs[2])
    key = jax.random.PRNGKey(99)
    common = dict(n_particles=N, statistic_dim=K + 1, smoother="filter",
                  logsumexp_mode=True, resample_mode="gather",
                  prior_mean=m.prior_mean_var(true)[0],
                  prior_var=m.prior_mean_var(true)[1])
    out_pad = run_buffered_pf(
        m.get_kernel(None),
        m.make_predictive_stat_fn(padded, K, valid_length=T_i),
        true, padded, key=key,
        step_valid=(jnp.arange(T_max) < T_i).astype(jnp.float64), **common)
    out_trunc = run_buffered_pf(
        m.get_kernel(None),
        m.make_predictive_stat_fn(jnp.asarray(seqs[2]), K),
        true, jnp.asarray(seqs[2]), key=key, **common)
    np.testing.assert_allclose(np.asarray(out_pad.statistics),
                               np.asarray(out_trunc.statistics), rtol=1e-12)
    np.testing.assert_allclose(float(out_pad.loglikelihood),
                               float(out_trunc.loglikelihood), rtol=1e-12)


def test_seq_predict_padded_matches_truncated_and_covers_lags():
    """Batched Seq PF predict: the padded elementwise run (step_valid
    freeze) equals the truncated single-sequence run bit-for-bit at the
    same key, and the surface covers smoothed / filtered / fixed-lag."""
    from sgmcmc_tpu.models.registry import get_model
    from sgmcmc_tpu.ops.buffered import run_buffered_pf

    true, seqs = make_sequences(17, n_seq=3)      # lengths 80, 120, 64
    s = SeqSVMSampler(seqs, seed=21, parameters=true)
    for lag, pf in [(None, None), (0, None), (2, None)]:
        preds = s.predict(target="latent", kind="pf", N=64, lag=lag,
                          resample_mode="gather")
        assert len(preds) == 3
        for (mean, cov), obs in zip(preds, seqs):
            assert mean.shape[0] == obs.shape[0]
            assert np.all(np.isfinite(mean)) and np.all(np.isfinite(cov))
    # y-moments path
    preds_y = s.predict(target="y", kind="pf", N=64,
                        resample_mode="gather")
    assert np.all(np.isfinite(preds_y[1][1]))
    # only batched programs, no per-sequence sub-samplers
    assert not any(isinstance(k, tuple) and k[0] == "sub"
                   for k in s._cache)

    # ops-level bitwise parity: padded + frozen tail == truncated
    m = get_model("svm")
    T_i, T_max = seqs[2].shape[0], 120
    padded = jnp.zeros((T_max, 1), jnp.float64).at[:T_i].set(seqs[2])
    key = jax.random.PRNGKey(123)
    common = dict(n_particles=64, statistic_dim=m.suff_statistic_dim,
                  smoother="poyiadjis_N", resampler="multinomial",
                  resample_mode="gather", elementwise=True,
                  prior_mean=m.prior_mean_var(true)[0],
                  prior_var=m.prior_mean_var(true)[1])
    out_pad = run_buffered_pf(
        m.get_kernel(None), m.suff_statistic, true, padded, key=key,
        window_length=T_max,
        step_valid=(jnp.arange(T_max) < T_i).astype(jnp.float64), **common)
    out_trunc = run_buffered_pf(
        m.get_kernel(None), m.suff_statistic, true, jnp.asarray(seqs[2]),
        key=key, window_length=T_i, **common)
    pad_stat = np.asarray(out_pad.mean_statistic).reshape(T_max, -1)[:T_i]
    trunc_stat = np.asarray(out_trunc.mean_statistic).reshape(T_i, -1)
    np.testing.assert_allclose(pad_stat, trunc_stat, rtol=1e-12)


def test_seq_svjm_sampler_runs():
    """SeqSVJMSampler: the jump model through the multi-sequence mixin."""
    import jax
    import numpy as np
    from sgmcmc_tpu.inference.samplers import SeqSVJMSampler
    from sgmcmc_tpu.models import svjm

    true = svjm.from_scalars(A=0.9, Q=0.5, R=1.0, pJ=0.1, QJ=2.0)
    seqs = [np.asarray(svjm.generate_data(
        jax.random.PRNGKey(i), true, 40 + 8 * i)[0]) for i in range(3)]
    s = SeqSVJMSampler(seqs, seed=5, parameters=true)
    for _ in range(2):
        s.sample_sgld(epsilon=1e-3, N=64, subsequence_length=16,
                      buffer_length=4, num_sequences=1,
                      resample_mode="gather")
        s.project_parameters()
    leaves = jax.tree_util.tree_leaves(s.parameters)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    ll = s.noisy_loglikelihood(N=64, subsequence_length=16, buffer_length=4,
                               resample_mode="gather")
    assert np.isfinite(ll)


def test_seq_full_buffer_short_subsequence_validated():
    """buffer_length=-1 must reject S > shortest sequence (same guard as
    the finite-buffer branch) instead of silently producing negative
    starts and corrupt weights."""
    import pytest

    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.inference.samplers import pack_sequences

    true, seqs = make_sequences()
    packed, lengths = pack_sequences(seqs)   # min length 64
    cfg = sgmcmc.PFScoreConfig(n_particles=16, subsequence_length=100,
                               buffer_length=-1)
    with pytest.raises(ValueError, match="shortest"):
        sgmcmc.make_seq_pf_score_fn(svm.KERNEL, svm.grad_statistic, 3,
                                    svm.unpack_grad, cfg, lengths)


def test_seq_exact_loglikelihood_batched_matches_per_sequence_sum():
    """Batched validity-masked exact loglikelihood == sum of per-sequence
    exact marginals (one compile vs one per distinct length)."""
    from sgmcmc_tpu.inference.samplers import SeqLGSSMSampler
    from sgmcmc_tpu.models import lgssm

    true = lgssm.from_matrices(A=0.8, C=1.0, Q=0.5, R=1.0)
    key = jax.random.PRNGKey(31)
    seqs = [np.asarray(lgssm.generate_data(jax.random.fold_in(key, i),
                                           true, T)[0])
            for i, T in enumerate([40, 64, 52])]
    s = SeqLGSSMSampler(seqs, seed=1, parameters=true)
    batched = s.exact_loglikelihood()
    assert "seq_exact_ll" in s._cache     # batched path taken
    expected = sum(float(lgssm.marginal_loglikelihood(
        true, jnp.asarray(o))) for o in seqs)
    np.testing.assert_allclose(batched, expected, rtol=1e-10)
