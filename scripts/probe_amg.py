"""Profile the SA-AMG V-cycle components on the real chip.

Finds where the 64^3 AMG-PCG iteration time goes (bench_amg_pcg measured
~69 ms/iter on-device in round 2 — ~300x the fine stencil apply).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.ops import matvec as mv
from trilinos_tpu.precond import SaAmg
from trilinos_tpu.solvers import cg


def timed(fn, x, reps=50, repeats=3):
    @jax.jit
    def chain(v):
        def body(i, u):
            return lax.optimization_barrier(fn(u) * (1.0 / 7.0))
        return lax.fori_loop(0, reps, body, v)

    r = chain(x)
    float(np.asarray(r).reshape(-1)[0])
    best = 1e9
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        r = chain(x)
        float(np.asarray(r).reshape(-1)[0])
        if i > 0:
            best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    nx = ny = nz = 64
    a = laplace3d(nx, ny, nz, dtype=np.float32)
    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    m = SaAmg(a, {"fine: matrix-free operator": op,
                  "smoother: type": "chebyshev",
                  "dtype": np.float32}).compute()
    print("levels:", m.n_levels())
    for k, lvl in enumerate(m.levels):
        pa = lvl["p"]
        print(f"  level {k}: n_f={lvl['n_f']} n_c={lvl['n_c']} "
              f"a={type(lvl['a']).__name__} "
              f"P ell k={pa.k} Pt k={lvl['pt'].k}")
    npad = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(npad),
                    dtype=jnp.float32)

    t = timed(lambda v: mv.spmv(op, v), x)
    print(f"fine stencil apply      : {t*1e3:8.3f} ms")
    t = timed(m._fine_cheb, x)
    print(f"fused cheb smoother     : {t*1e3:8.3f} ms")

    lvl0 = m.levels[0]
    xc = jnp.asarray(
        np.random.default_rng(1).standard_normal(lvl0["n_c"]),
        dtype=jnp.float32)
    t = timed(lambda v: mv.spmv(lvl0["p"], mv.spmv(lvl0["pt"], v)), x)
    print(f"P@(Pt@r) pair (level 0) : {t*1e3:8.3f} ms")
    t = timed(lambda v: mv.spmv(lvl0["pt"], mv.spmv(lvl0["p"], v)), xc)
    print(f"Pt@(P@e) pair (level 0) : {t*1e3:8.3f} ms")

    if len(m.levels) > 1:
        lvl1 = m.levels[1]
        x1 = jnp.asarray(
            np.random.default_rng(2).standard_normal(lvl1["n_f"]),
            dtype=jnp.float32)
        t = timed(lambda v: mv.spmv(lvl1["a"], v), x1)
        print(f"level-1 A apply ({type(lvl1['a']).__name__}): {t*1e3:8.3f} ms")
        t = timed(lambda v: m._smooth(lvl1, jnp.zeros_like(v), v), x1)
        print(f"level-1 smooth          : {t*1e3:8.3f} ms")

    t = timed(m._apply, x, reps=20)
    print(f"full V-cycle            : {t*1e3:8.3f} ms")

    # one unpreconditioned CG iteration for scale
    run = jax.jit(lambda bb: cg(lambda v: mv.spmv(op, v), bb, rtol=0.0,
                                maxiter=200))
    r = run(x)
    float(jnp.max(r.resnorm))
    t0 = time.perf_counter()
    r = run(x * 1.01)
    float(jnp.max(r.resnorm))
    t1 = time.perf_counter()
    print(f"plain CG iter           : {(t1-t0)/200*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
