"""Isolate window-DMA bandwidth: single vs split async copies vs pipeline.

All kernels copy a (R,128) f32 array (256^3 elements, 67MB) to output.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 256 ** 3 // LANES
BR = 4096
NB = R // BR


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


# (a) pure BlockSpec pipeline copy
def pipe_copy(x):
    def kern(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 1.0

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        grid=(NB,),
        in_specs=[pl.BlockSpec((BR, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )(x)


# (b..d) manual double-buffered window DMA with n_split parallel copies
def win_copy(n_split):
    def kern(x_hbm, y_ref, win, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        seg = BR // n_split

        def issue(blk, slot, wait):
            for s in range(n_split):
                d = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(blk * BR + s * seg, seg), :],
                    win.at[slot, pl.ds(s * seg, seg)], sem.at[slot, s])
                d.wait() if wait else d.start()

        @pl.when(b == 0)
        def _():
            issue(0, 0, wait=False)

        slot = lax.rem(b, jnp.int32(2))

        @pl.when(b + 1 < nb)
        def _():
            issue(b + 1, lax.rem(b + 1, jnp.int32(2)), wait=False)

        issue(b, slot, wait=True)
        y_ref[:] = win[slot] * 1.0

    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            grid=(NB,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BR, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, BR, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2, n_split)),
            ],
        )(x)

    return run


def main():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((R, LANES)),
        dtype=jnp.float32)
    gb = 2 * R * LANES * 4 / 1e9
    t = timed(pipe_copy, x)
    print(f"pipeline copy: {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s")
    for ns in (1, 2, 4, 8):
        t = timed(win_copy(ns), x)
        print(f"window x{ns}:    {t*1e3:7.3f} ms  {gb/t:6.1f} GB/s")


if __name__ == "__main__":
    main()
