"""TPU probe: two-chain-block interleaving in the fused window kernel
(VERDICT r5 item 5 — the one unprobed overlap lever in the floor claim).

`interleave=True` splits each chain block into halves A/B and alternates
their qp-group B1-build/MXU-dot/VPU-tail work software-pipelined, so half
B's VPU phases can execute under half A's in-flight gather dots (a
different overlap than the measured-negative within-window qp pipelining,
which alternates groups of the SAME chains and shares their serial
dependency).

Checks bitwise equality vs interleave=False, then times the fused SVM
score at the flagship config (N=1024, W=60, rng=kernel, CB=32 -> halves
of 16).

Run: nohup timeout 2400 python -u scripts/tpu_probe_interleave.py > /tmp/il.log 2>&1 &
"""
import importlib.util

if importlib.util.find_spec("sgmcmc_tpu") is None:
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from sgmcmc_tpu.models import svm
from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

N = 1024
W = 60
CHAINS = 2048
ITERS = 20


def main():
    key = jax.random.PRNGKey(0)
    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.fold_in(key, 1), true, 1000)
    window = jnp.asarray(ys[:W], jnp.float32).reshape(W)
    step_w = jnp.ones((W,), jnp.float32)
    pm, pv = 0.0, float(svm.stationary_variance(true))

    # ---- correctness: bitwise vs the default schedule (host rng so the
    # draws are key-deterministic and comparable)
    def score(il):
        f = jax.jit(jax.vmap(lambda k: fused_pf_score(
            svm.FUSED, k, true, window, step_w, N, pm, pv,
            rng="host", interleave=il)))
        out = f(jax.random.split(jax.random.fold_in(key, 2), 64))
        jax.block_until_ready(out)
        return [np.asarray(o) for o in out]

    s0, l0 = score(False)
    s1, l1 = score(True)
    print(f"bitwise stat={np.array_equal(s0, s1)} "
          f"ll={np.array_equal(l0, l1)} "
          f"max|d|={np.abs(s0 - s1).max():.3e}", flush=True)

    # ---- timing at the flagship kernel config (rng=kernel): time the
    # vmapped fused score itself, synchronized by a scalar host transfer
    # (block_until_ready returns early on the axon backend).  The axon
    # endpoint warms up across the first runs (an initial A/B/A showed a
    # +25% phantom), so: compile both variants, 2 throwaway rounds, then
    # ROUNDS alternating A/B measurements, report per-variant medians.
    fns = {}
    for il in (False, True):
        fns[il] = jax.jit(jax.vmap(lambda k, il=il: fused_pf_score(
            svm.FUSED, k, true, window, step_w, N, pm, pv,
            rng="kernel", interleave=il)))

    def timed(il, rep):
        f = fns[il]
        t0 = time.perf_counter()
        acc = None
        for i in range(ITERS):
            _, ll = f(jax.random.split(
                jax.random.fold_in(key, 100 * rep + i), CHAINS))
            acc = ll if acc is None else acc + ll
        float(jnp.sum(acc))                      # sync
        return CHAINS * ITERS / (time.perf_counter() - t0)

    for il in (False, True):
        timed(il, 0)
        timed(il, 1)                             # warm-up rounds
    ROUNDS = 8
    rates = {False: [], True: []}
    for r in range(ROUNDS):
        for il in (False, True):
            rates[il].append(timed(il, 2 + r))
    for il in (False, True):
        med = float(np.median(rates[il]))
        print(f"interleave={il}: median {med:,.0f} fused scores/s over "
              f"{ROUNDS} alternated rounds "
              f"(all: {', '.join(f'{x:,.0f}' for x in rates[il])})",
              flush=True)
    d = (np.median(rates[True]) / np.median(rates[False]) - 1) * 100
    print(f"interleave delta: {d:+.2f}%", flush=True)


if __name__ == "__main__":
    main()
