"""Slope-based (RTT-free) timing of the real kernels.

t_true = (T(r2) - T(r1)) / (r2 - r1) cancels the ~25ms fixed per-call
dispatch cost that contaminated all round-1 numbers at reps=30.
Matrices are passed as jit ARGUMENTS (closing over them serializes them
into the remote-compile request -> HTTP 413).
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


def chain_time(fn, args, x, reps):
    @partial(jax.jit, static_argnums=0)
    def chain(reps_, *a):
        def body(i, v):
            return lax.optimization_barrier(fn(*a[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps_, body, a[-1])

    r = chain(reps, *args, x)
    r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(reps, *args, x)
        float(r.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, args, x, r1=20, r2=100):
    t1 = chain_time(fn, args, x, r1)
    t2 = chain_time(fn, args, x, r2)
    return (t2 - t1) / (r2 - r1), t1, t2


def main():
    # 0) in-graph per-op overhead floor: tiny array
    tiny = jnp.ones((8, 128), jnp.float32)
    dt, t1, t2 = slope(lambda v: v + 1.0, (), tiny)
    print(f"tiny-op slope: {dt*1e6:8.1f} us/iter (T20={t1*1e3:.1f}ms "
          f"T100={t2*1e3:.1f}ms)", flush=True)

    # 1) 64MB copy
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (16 * 1024 * 1024,)), dtype=jnp.float32)
    dt, t1, t2 = slope(lambda v: v * 1.0000001, (), x)
    print(f"64MB copy slope: {dt*1e3:7.3f} ms -> {2*64e6/dt/1e9:6.1f}"
          f" GB/s (T20={t1*1e3:.1f} T100={t2*1e3:.1f})", flush=True)

    # 2) plane stencil 256^3 (op is static metadata; planes ~1MB constant)
    op = laplace3d(256, 256, 256, dtype=np.float32, fmt="stencil")
    xb = jnp.asarray(np.random.default_rng(1).standard_normal(
        op.n_rows_pad), dtype=jnp.float32)
    dt, t1, t2 = slope(lambda v: S.stencil_spmv_planes(op, v), (), xb,
                       10, 50)
    print(f"plane stencil 256^3: {dt*1e3:7.3f} ms  "
          f"{op.nnz/dt/1e9:6.1f} Gnnz/s (T10={t1*1e3:.1f} "
          f"T50={t2*1e3:.1f})", flush=True)

    # 3) stored-DIA 256^3 — matrix passed as ARGUMENT
    a = laplace3d(256, 256, 256, dtype=np.float32, fmt="dia")
    dt, t1, t2 = slope(lambda m, v: mv.spmv(m, v), (a,), xb, 10, 50)
    useful = (a.data.shape[0] + 2) * a.n_rows_pad * 4
    print(f"DIA spmv 256^3: {dt*1e3:7.3f} ms  {useful/dt/1e9:6.1f} GB/s "
          f"useful (T10={t1*1e3:.1f} T50={t2*1e3:.1f})", flush=True)

    # 3b) DIA SpMM nrhs=4 packed
    k = 4
    xk = jnp.asarray(np.random.default_rng(2).standard_normal(
        (k, a.n_rows_pad // 128, 128)), dtype=jnp.float32)
    from trilinos_tpu.ops.pallas.dia_spmv import dia_spmm_packed
    dt, t1, t2 = slope(lambda m, v: dia_spmm_packed(m, v), (a,), xk, 5, 25)
    eff = (a.data.shape[0] + 2 * k) * a.n_rows_pad * 4
    print(f"DIA spmm k=4 256^3: {dt*1e3:7.3f} ms  {eff/dt/1e9:6.1f} GB/s "
          f"agg, {a.nnz*k/dt/1e9:6.1f} Gnnz/s (T5={t1*1e3:.1f} "
          f"T25={t2*1e3:.1f})", flush=True)

    # 4) CG per-iteration slope at 128^3 via maxiter difference
    from trilinos_tpu.solvers import cg_single_reduce

    op3 = laplace3d(128, 128, 128, dtype=np.float32, fmt="stencil")
    n, npad = op3.n_rows, op3.n_rows_pad
    b = np.zeros(npad, np.float32)
    b[:n] = np.random.default_rng(1).standard_normal(n)
    bj = jnp.asarray(b)

    def cg_time(iters):
        run = jax.jit(partial(
            lambda it, bb: cg_single_reduce(
                lambda v: mv.spmv(op3, v), bb, rtol=0.0, maxiter=it), iters))
        r = run(bj)
        jax.block_until_ready(r.x)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(bj)
            float(r.resnorm)
            best = min(best, time.perf_counter() - t0)
        return best

    t50, t200 = cg_time(50), cg_time(200)
    per_it = (t200 - t50) / 150
    print(f"CG 128^3 per-iter slope: {per_it*1e3:7.3f} ms -> "
          f"{1/per_it:7.1f} iters/s (T50={t50*1e3:.1f} "
          f"T200={t200*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
