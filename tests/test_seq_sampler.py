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

    # per-sequence full-window scores, summed
    def per_seq(key):
        tot = 0.0
        for j, obs in enumerate(seqs):
            T_j = obs.shape[0]
            one = sgmcmc.make_pf_score_fn(
                svm.KERNEL, svm.grad_statistic, 3, svm.unpack_grad, cfg,
                T_j, prior_mean_var_fn=pmv)
            g, _ = one(jax.random.fold_in(key, j), true, jnp.asarray(obs))
            tot = tot + g.A[0, 0]
        return float(tot)

    ind_g = np.array([per_seq(jax.random.fold_in(jax.random.PRNGKey(1), i))
                      for i in range(R)])
    se = np.sqrt(seq_g.var() / R + ind_g.var() / R)
    assert abs(seq_g.mean() - ind_g.mean()) < 5 * se + 1e-6, \
        (seq_g.mean(), ind_g.mean(), se)
