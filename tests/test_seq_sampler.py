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
