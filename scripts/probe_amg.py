"""Profile the SA-AMG V-cycle components on the real chip.

Round-3 finding (uncoupled hierarchy at 64^3): the V-cycle spent ~44 ms
in ELL-gather P/Pt applies and ~16 ms in coarse ELL SpMVs per cycle
while the fine stencil apply was ~0.14 ms — which motivated the
structured-aggregation path (reshape transfers + exact classified DIA
coarse levels). This probe times whichever hierarchy `SaAmg` builds.
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


def timed(fn, x, reps=200, repeats=3):
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
    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    t0 = time.time()
    m = SaAmg(op, {"dtype": np.float32}).compute()
    print(f"setup {time.time()-t0:.1f}s structured={m._structured} "
          f"levels={m.n_levels()}")
    npad = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(npad),
                    dtype=jnp.float32)

    t = timed(lambda v: mv.spmv(op, v), x)
    print(f"fine stencil apply      : {t*1e3:8.3f} ms")

    lvl0 = m.levels[0]
    t = timed(lambda v: lvl0["prolong"](lvl0["restrict"](v)), x)
    print(f"P(Pt r) transfer pair   : {t*1e3:8.3f} ms")

    if len(m.levels) > 1:
        lvl1 = m.levels[1]
        x1 = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                lvl1["a"].n_rows_pad), dtype=jnp.float32)
        t = timed(lambda v: mv.spmv(lvl1["a"], v), x1)
        print(f"level-1 A apply ({type(lvl1['a']).__name__}): "
              f"{t*1e3:8.3f} ms")

    t = timed(m._apply, x, reps=50)
    print(f"full V-cycle            : {t*1e3:8.3f} ms")

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
