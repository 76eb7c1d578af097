"""Decisive bandwidth probe: is there a fixed per-iteration floor?

Times y = x*1.0000001 chains at several sizes/layouts/rep counts. If
time/rep is ~constant vs size, measurements are floor-bound and 'triad'
numbers were artifacts; if it scales with size, bandwidth is real.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(x, reps):
    @jax.jit
    def chain(v):
        def body(i, v):
            return lax.optimization_barrier(v * 1.0000001)
        return lax.fori_loop(0, reps, body, v)

    r = chain(x)
    r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(x)
        float(r.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    rng = np.random.default_rng(0)
    for mb in (8, 32, 64, 128, 256, 512):
        n = mb * 1024 * 1024 // 4
        x1 = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        t1 = timed(x1, 30)
        x2 = jnp.asarray(np.asarray(x1).reshape(-1, 128))
        t2 = timed(x2, 30)
        gb = 2 * n * 4 / 1e9
        print(f"{mb:4d}MB 1-D: {t1*1e3:7.3f} ms/rep {gb/t1:6.1f} GB/s | "
              f"2-D: {t2*1e3:7.3f} ms/rep {gb/t2:6.1f} GB/s")
    # rep-count sensitivity at 64MB
    n = 64 * 1024 * 1024 // 4
    x1 = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    for reps in (5, 30, 120):
        t = timed(x1, reps)
        print(f"64MB reps={reps:4d}: {t*1e3:7.3f} ms/rep")
    # two ops per iteration vs one (does time double?)
    @jax.jit
    def chain2(v):
        def body(i, v):
            v = lax.optimization_barrier(v * 1.0000001)
            return lax.optimization_barrier(v + 0.5)
        return lax.fori_loop(0, 30, body, v)

    r = chain2(x1)
    r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain2(x1)
        float(r[0])
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f"64MB two-barrier body: {best*1e3:7.3f} ms/rep")


if __name__ == "__main__":
    main()
