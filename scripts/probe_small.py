"""Small-grid apply cost: stencil vs DIA at 64^3 / 32^3 / 16^3.

Decides the coarse-level operator format for the structured-MG path.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.ops import matvec as mv


def timed(fn, args, x, reps=300, repeats=3):
    @jax.jit
    def chain(*a):
        def body(i, v):
            return lax.optimization_barrier(fn(*a[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps, body, a[-1])

    r = chain(*args, x)
    float(np.asarray(r).reshape(-1)[0])
    best = 1e9
    for i in range(4):
        t0 = time.perf_counter()
        r = chain(*args, x)
        float(np.asarray(r).reshape(-1)[0])
        if i > 0:
            best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    rng = np.random.default_rng(0)
    for m in (64, 32, 16, 8):
        row = [f"{m}^3"]
        for fmt in ("stencil", "dia"):
            a = laplace3d(m, m, m, dtype=np.float32, fmt=fmt)
            x = jnp.asarray(rng.standard_normal(a.n_rows_pad),
                            dtype=jnp.float32)
            if fmt == "stencil":
                t = timed(lambda v: mv.spmv(a, v), (), x)
            else:
                t = timed(lambda mm, v: mv.spmv(mm, v), (a,), x)
            row.append(f"{fmt}={t*1e6:8.1f} us")
        print("  ".join(row))


if __name__ == "__main__":
    main()
