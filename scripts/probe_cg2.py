"""Trustworthy triad (Pallas copy, un-foldable) + CG timing with VARIED
inputs (defeats any repeat-call result caching in the tunnel)."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.ops import matvec as mv

LANES = 128


def pallas_copy(x, reps):
    r = x.shape[0]
    br = 4096
    nb = r // br

    def kern(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 1.0000001

    def one(v):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
            grid=(nb,),
            in_specs=[pl.BlockSpec((br, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, LANES), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
        )(v)

    @partial(jax.jit, static_argnums=0)
    def chain(reps_, v):
        def body(i, v):
            return lax.optimization_barrier(one(v))
        return lax.fori_loop(0, reps_, body, v)

    return chain(reps, x)


def main():
    # pallas triad: 67MB, reps=300, 3 calls
    r = 256 ** 3 // LANES
    x = jnp.asarray(np.random.default_rng(0).standard_normal((r, LANES)),
                    dtype=jnp.float32)
    out = pallas_copy(x, 300)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = pallas_copy(x, 300)
        float(o[0, 0])
        ts.append(time.perf_counter() - t0)
    t = min(ts) / 300
    print("pallas copy totals:", [f"{q*1e3:.1f}" for q in ts],
          f"-> {t*1e3:.3f} ms, {2*r*LANES*4/t/1e9:.0f} GB/s", flush=True)

    # CG with varied inputs
    from trilinos_tpu.solvers import cg_single_reduce

    op3 = laplace3d(128, 128, 128, dtype=np.float32, fmt="stencil")
    n, npad = op3.n_rows, op3.n_rows_pad
    run = jax.jit(lambda bb: cg_single_reduce(
        lambda v: mv.spmv(op3, v), bb, rtol=0.0, maxiter=1000))
    rng = np.random.default_rng(1)
    bs = []
    for i in range(4):
        b = np.zeros(npad, np.float32)
        b[:n] = rng.standard_normal(n)
        bs.append(jnp.asarray(b))
    rres = run(bs[0])
    jax.block_until_ready(rres.x)
    for i in range(1, 4):
        t0 = time.perf_counter()
        rr = run(bs[i])
        float(jnp.max(rr.resnorm))
        dt = time.perf_counter() - t0
        print(f"CG solve (fresh b{i}): {dt*1e3:.1f} ms total, "
              f"iters={int(rr.iters)}, {dt/1000*1e3:.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
