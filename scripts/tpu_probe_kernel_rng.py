"""Probe: Mosaic support for in-kernel PRNG + Box-Muller transcendentals.

Checks that `pltpu.prng_seed` / `prng_random_bits`, bit masking, log, sqrt
and cos all lower on this toolchain, and that the resulting normals have
the right moments.  Run on TPU: `python scripts/tpu_probe_kernel_rng.py`.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = out_ref.shape
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    u1 = ((b1 & 0x7fffff).astype(jnp.float32) + 0.5) * (2.0 ** -23)
    u2 = ((b2 & 0x7fffff).astype(jnp.float32) + 0.5) * (2.0 ** -23)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z = r * jnp.cos((2.0 * 3.14159265358979) * u2)
    out_ref[:] = z


@functools.partial(jax.jit, static_argnames=("n", "m"))
def draw(seed, n=256, m=512):
    return pl.pallas_call(
        _kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((n // 2, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
    )(jnp.asarray([seed], jnp.int32))


if __name__ == "__main__":
    z = draw(123)
    z2 = draw(123)
    z3 = draw(124)
    import numpy as np
    z = np.asarray(z)
    print("mean", z.mean(), "std", z.std(), "min", z.min(), "max", z.max())
    print("deterministic:", bool(np.array_equal(z, np.asarray(z2))))
    print("seed-sensitive:", not np.array_equal(z, np.asarray(z3)))
    k = np.mean(((z - z.mean()) / z.std()) ** 4)
    print("kurtosis", k, "(expect ~3)")
    assert abs(z.mean()) < 0.02 and abs(z.std() - 1) < 0.02 and abs(k - 3) < 0.2
    print("OK")
