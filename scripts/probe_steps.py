"""Is Pallas grid-step overhead the bottleneck? Copy 67MB with varying
block sizes; also probe VMEM capacity."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 256 ** 3 // LANES


def timed(fn, x, reps=30):
    @jax.jit
    def chain(v):
        def body(i, v):
            return lax.optimization_barrier(fn(v) * 1.0000001)
        return lax.fori_loop(0, reps, body, v)

    r = chain(x)
    r.block_until_ready()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = chain(x)
        float(r[0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def pipe_copy(br):
    nb = R // br

    def kern(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 1.0

    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            grid=(nb,),
            in_specs=[pl.BlockSpec((br, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    return run


def xla_copy(x):
    return x * 1.0000001


def main():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((R, LANES)),
        dtype=jnp.float32)
    gb = 2 * R * LANES * 4 / 1e9
    t = timed(xla_copy, x)
    print(f"XLA copy 67MB:      {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s")
    for br in (1024, 4096, 16384, 32768, 65536):
        nb = R // br
        try:
            t = timed(pipe_copy(br), x)
            print(f"pipe br={br:6d} nb={nb:4d}: {t*1e3:7.3f} ms "
                  f"{gb/t:6.1f} GB/s  ({t/nb*1e6:5.1f} us/step)")
        except Exception as e:
            print(f"pipe br={br}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
