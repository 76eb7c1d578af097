"""Big-reps timing: reps large enough that fixed per-call costs are <5%.

Reports total/reps (conservative: includes RTT/reps) and per-call spread.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.ops import matvec as mv
from trilinos_tpu.ops.pallas import stencil_op as S


def timed_calls(fn, args, x, reps, ncalls=3):
    @partial(jax.jit, static_argnums=0)
    def chain(reps_, *a):
        def body(i, v):
            return lax.optimization_barrier(fn(*a[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps_, body, a[-1])

    r = chain(reps, *args, x)
    jax.block_until_ready(r)
    ts = []
    for _ in range(ncalls):
        t0 = time.perf_counter()
        r = chain(reps, *args, x)
        float(r.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return ts


def main():
    # 64MB copy, reps=500
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (16 * 1024 * 1024,)), dtype=jnp.float32)
    ts = timed_calls(lambda v: v * 1.0000001, (), x, 500)
    print("copy64 reps=500 totals:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {min(ts)/500*1e3:.3f} ms/rep, "
          f"{2*64e6/ (min(ts)/500) /1e9:.0f} GB/s", flush=True)

    # plane stencil 256^3, reps=300
    op = laplace3d(256, 256, 256, dtype=np.float32, fmt="stencil")
    xb = jnp.asarray(np.random.default_rng(1).standard_normal(
        op.n_rows_pad), dtype=jnp.float32)
    ts = timed_calls(lambda v: S.stencil_spmv_planes(op, v), (), xb, 300)
    t = min(ts) / 300
    print("stencil totals:", [f"{q*1e3:.1f}" for q in ts],
          f"-> {t*1e3:.3f} ms, {op.nnz/t/1e9:.1f} Gnnz/s", flush=True)

    # DIA 256^3, reps=150
    a = laplace3d(256, 256, 256, dtype=np.float32, fmt="dia")
    ts = timed_calls(lambda m, v: mv.spmv(m, v), (a,), xb, 150)
    t = min(ts) / 150
    useful = (a.data.shape[0] + 2) * a.n_rows_pad * 4
    print("DIA totals:", [f"{q*1e3:.1f}" for q in ts],
          f"-> {t*1e3:.3f} ms, {useful/t/1e9:.1f} GB/s useful", flush=True)

    # CG 128^3, maxiter=1000 with rtol=0 (runs all 1000)
    from trilinos_tpu.solvers import cg_single_reduce

    op3 = laplace3d(128, 128, 128, dtype=np.float32, fmt="stencil")
    n, npad = op3.n_rows, op3.n_rows_pad
    b = np.zeros(npad, np.float32)
    b[:n] = np.random.default_rng(1).standard_normal(n)
    bj = jnp.asarray(b)
    run = jax.jit(lambda bb: cg_single_reduce(
        lambda v: mv.spmv(op3, v), bb, rtol=0.0, maxiter=1000))
    r = run(bj)
    jax.block_until_ready(r.x)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(bj)
        float(jnp.max(r.resnorm))
        ts.append(time.perf_counter() - t0)
    it = int(r.iters)
    t = min(ts) / max(it, 1)
    print(f"CG totals: {[f'{q*1e3:.1f}' for q in ts]} iters={it} "
          f"-> {t*1e3:.3f} ms/iter, {1/t:.0f} iters/s", flush=True)


if __name__ == "__main__":
    main()
