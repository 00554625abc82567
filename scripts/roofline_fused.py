"""Roofline/MFU accounting for the fused PF window kernel (VERDICT r1 #2).

Counts the kernel's per-chain-window-step work from its shapes (no
estimation: every term maps to a line of `ops/pallas/fused_pf.py`), measures
the achieved time on the real chip, and prints achieved TFLOP/s and GB/s
against TPU v5e peaks.

v5e peaks used (public: cloud.google.com/tpu/docs/v5e): 197 bf16 TFLOP/s,
819 GB/s HBM BW per chip.

Per window step, folded layout s=8, B=N/8, K=D+H, R = 2*K*s + 3*s rows:
  MXU: s dots of [R, B] x [B, B]           -> 2 * s * R * B^2 FLOPs (bf16)
  VPU (f32 ops, approximate but shape-exact):
    CDF trees: log2(s)*[s,B] + log2(B)*[1,B] adds
    B1 compares: s * 2 * [B, B]
    tail: s * ([1,B] compare + 2*[s,B] shifts + [K*s, B] mult + K*s*B adds)
    model propose/reweight/stat + exp/log + Box-Muller: O(c * s * B)
  HBM per chain-window (in-kernel RNG): aux [3W, B] + x0 [D*s, B] +
    pvec [P, B] in, [H+1] out — all f32.

Usage: python scripts/roofline_fused.py [--chains 2048] [--W 60] [--N 1024]
"""
import argparse
import math
import sys
import time

import importlib.util
if importlib.util.find_spec("sgmcmc_tpu") is None:
    # repo-root fallback for uninstalled checkouts (pip install -e . removes the need)
    import pathlib, sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def measure(chains, W, N, rng="kernel"):
    from sgmcmc_tpu.models import svm
    from sgmcmc_tpu.ops.pallas.fused_pf import fused_pf_score

    params = svm.from_scalars(A=0.9, Q=0.5, R=1.0)
    key = jax.random.PRNGKey(0)
    ys = jax.random.normal(key, (W, 1), jnp.float32)
    step_w = jnp.ones((W,), jnp.float32)

    def one(k):
        return fused_pf_score(svm.FUSED, k, params, ys, step_w, N,
                              0.0, 1.0, lambduh=1.0, rng=rng)

    run = jax.jit(lambda keys: jax.vmap(one)(keys))
    keys = jax.random.split(jax.random.PRNGKey(1), chains)
    out = run(keys)
    float(out[1][0])  # sync via host transfer (block_until_ready lies on axon)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(keys)
        float(out[1][0])
    dt = (time.perf_counter() - t0) / reps
    return dt


def account(chains, W, N, D=1, H=3, P=3, Z=1, kernel_rng=True):
    s = 8
    B = N // s
    K = D + H
    R = 2 * K * s + 3 * s
    # --- MXU work per chain-window-step (bf16 one-hot dots)
    mxu_flops_step = 2.0 * s * R * B * B
    # --- VPU work per chain-window-step (f32 elementwise, shape-exact)
    vpu = 0.0
    vpu += math.log2(s) * s * B + math.log2(B) * B          # CDF trees
    vpu += s * B                                            # lane_excl add
    vpu += s * 2 * B * B                                    # B1 compares
    vpu += s * (B + 2 * s * B + K * s * B + K * s * B)      # tail
    vpu += 2 * K * s * B                                    # hi/lo split
    vpu += 3 * s * B                                        # cdf 3-split
    vpu += 10 * s * B                                       # exp/max/sum norm
    if kernel_rng:
        vpu += 30 * Z * s * B                               # Box-Muller
    vpu += 25 * s * B                                       # model ops (SVM)
    # --- HBM per chain-window
    hbm_bytes_window = 4.0 * (3 * W * B + D * s * B + P * B + (H + 1))
    if not kernel_rng:
        hbm_bytes_window += 4.0 * W * Z * s * B
    return mxu_flops_step, vpu, hbm_bytes_window


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--W", type=int, default=60)
    ap.add_argument("--N", type=int, default=1024)
    args = ap.parse_args()

    dt = measure(args.chains, args.W, args.N)
    per_chain_step = dt / (args.chains * args.W)
    mxu, vpu, hbm_w = account(args.chains, args.W, args.N)

    tflops = mxu / per_chain_step / 1e12
    vpu_gops = vpu / per_chain_step / 1e9
    gbs = (hbm_w / args.W) / per_chain_step / 1e9

    print(f"config: chains={args.chains} W={args.W} N={args.N} "
          f"(s=8, B={args.N // 8})")
    print(f"wall: {dt * 1e3:.2f} ms/window-batch -> "
          f"{per_chain_step * 1e9:.1f} ns/chain-window-step")
    print(f"MXU: {mxu / 1e6:.2f} MFLOP/chain-step (bf16 one-hot dots) -> "
          f"{tflops:.1f} TFLOP/s = {100 * tflops / V5E_BF16_TFLOPS:.1f}% "
          f"of v5e bf16 peak")
    print(f"VPU: {vpu / 1e6:.2f} Mops/chain-step -> {vpu_gops:.1f} Gops/s "
          f"(v5e VPU order ~4 Tops/s f32)")
    print(f"HBM: {hbm_w / 1e3:.1f} KB/chain-window -> {gbs:.2f} GB/s = "
          f"{100 * gbs / V5E_HBM_GBS:.2f}% of v5e HBM BW")
    agg = args.chains / dt
    print(f"aggregate window rate: {agg:.0f} chain-windows/s "
          f"(= SGLD steps/s at minibatch 1)")


if __name__ == "__main__":
    main()
