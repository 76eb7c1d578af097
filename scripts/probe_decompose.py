"""Decompose plane-kernel cost per offset class at 256^3 (real chip)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trilinos_tpu.ops.pallas import stencil_op as S


def timed(fn, x, reps=30):
    @jax.jit
    def chain(v):
        def body(i, v):
            return lax.optimization_barrier(fn(v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps, body, v)

    r = chain(x)
    r.block_until_ready()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = chain(x)
        float(r[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    n = 256 ** 3
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    variants = {
        "center":   [((0, 0, 0), 6.0)],
        "center+z": [((0, 0, 0), 6.0), ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)],
        "center+y": [((0, 0, 0), 6.0), ((0, -1, 0), -1.0), ((0, 1, 0), -1.0)],
        "center+x": [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0)],
        "full7":    [((0, 0, 0), 6.0), ((-1, 0, 0), -1.0), ((1, 0, 0), -1.0),
                     ((0, -1, 0), -1.0), ((0, 1, 0), -1.0),
                     ((0, 0, -1), -1.0), ((0, 0, 1), -1.0)],
    }
    for name, st in variants.items():
        op = S.StencilOp.create((256, 256, 256), st)
        plan = S._plane_plan(op)
        t = timed(lambda v, op=op: S.stencil_spmv_planes(op, v), x)
        print(f"{name:10s} plan={plan} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
