"""Weak-scaling efficiency benchmark for the distributed SGLD step.

Measures aggregate SGLD steps/s of the full distributed training step
(`sgmcmc_tpu.parallel.training`) at increasing chain-device counts with a
fixed number of chains per device (weak scaling), and reports efficiency
relative to one device — the harness for the BASELINE "samples/s scaling
efficiency >= 80% from 1 host to N hosts" metric.

On this container only one TPU chip is available, so by default the script
runs on a virtual 8-device CPU mesh (the standard JAX trick) to validate
the mechanism; on a real pod slice run with --backend tpu and the same code
measures real ICI/DCN scaling.

Usage: python bench_scaling.py [--backend cpu|tpu] [--devices 1 2 4 8]
Prints one JSON line per device count plus a summary line.
"""
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--chains_per_device", type=int, default=4)
    ap.add_argument("--n_particles", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--subseq", type=int, default=32)
    ap.add_argument("--buffer", type=int, default=8)
    ap.add_argument("--rng", default="host", choices=["host", "kernel"],
                    help="'kernel' = in-kernel PRNG (bench.py's flagship "
                         "setting on TPU)")
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count="
                                     f"{max(args.devices)}").strip()
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sgmcmc_tpu.inference import sgmcmc
    from sgmcmc_tpu.models import svm
    from sgmcmc_tpu.parallel import sharding, training

    true = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    ys, _ = svm.generate_data(jax.random.PRNGKey(0), true, args.T)
    prior = svm.default_prior()
    cfg = sgmcmc.PFScoreConfig(
        n_particles=args.n_particles, subsequence_length=args.subseq,
        buffer_length=args.buffer,
        smoother="poyiadjis_N", resampler="systematic",
        resample_mode="auto", rng=args.rng)

    results = {}
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            continue
        mesh = sharding.make_mesh(n_chain_devices=n_dev,
                                  n_particle_devices=1,
                                  devices=jax.devices()[:n_dev])
        step = training.make_distributed_sgld_step(
            svm.KERNEL, svm.grad_statistic, svm.STATISTIC_DIM,
            svm.unpack_grad, lambda p: svm.grad_logprior(prior, p), cfg,
            args.T, mesh, epsilon=0.1, fused_model=svm.FUSED,
            prior_mean_var_fn=lambda p: (0.0, svm.stationary_variance(p)),
            project_fn=svm.project_parameters)
        fit = training.make_distributed_fit(step, args.iters)

        n_chains = args.chains_per_device * n_dev
        keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
        params0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape).copy(),
            svm.from_scalars(A=0.5, Q=1.0, R=2.0))
        keys = sharding.shard_chain_states(mesh, keys)
        params0 = sharding.shard_chain_states(mesh, params0)

        def sync(tree):
            # block_until_ready on the remote (axon) backend returns before
            # execution finishes; transfer one scalar to truly synchronize.
            leaf = jax.tree_util.tree_leaves(tree)[0]
            return float(jnp.sum(leaf.ravel()[:1]))

        out = fit(keys, params0, ys)
        sync(out)
        t0 = time.perf_counter()
        out = fit(keys, params0, ys)
        sync(out)
        dt = time.perf_counter() - t0
        sps = n_chains * args.iters / dt
        results[n_dev] = sps
        print(json.dumps({"devices": n_dev, "chains": n_chains,
                          "steps_per_s": round(sps, 1)}))

    if 1 in results:
        effs = {d: round(results[d] / (results[1] * d), 3)
                for d in results}
        print(json.dumps({"metric": "weak-scaling efficiency vs 1 device",
                          "efficiency": effs,
                          "backend": args.backend}))


if __name__ == "__main__":
    main()
