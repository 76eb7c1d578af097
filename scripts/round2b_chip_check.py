"""One-shot on-chip validation after a tunnel outage.

Run when the tunnel is healthy:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/round2b_chip_check.py

Runs the canonical chip_verify suite (kernel parity incl. the fused
cheb4 polynomial, BASELINE configs on the Pallas path) and then the one
genuinely new measurement of round-2 session B: the fused-sweep rate of
the polynomial kernel. Exits nonzero on failure.
"""
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import chip_verify  # noqa: E402  (the canonical checks live there)


def main():
    chip_verify.main()  # exits nonzero itself on any failure

    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops.pallas.stencil_poly import (chebyshev_stages,
                                                      stencil_poly_apply)

    op = laplace3d(256, 256, 256, dtype=np.float32, fmt="stencil")
    stages = chebyshev_stages(1.9, 0.06, 4, 1 / 6.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        op.n_rows_pad), jnp.float32)

    def timed(fn, reps):
        @partial(jax.jit, static_argnums=0)
        def chain(r_, v):
            return lax.fori_loop(
                0, r_, lambda i, vv: lax.optimization_barrier(
                    fn(vv) * (1.0 / 7.0)), v)
        r = chain(reps, x)
        float(r.reshape(-1)[0])
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            r = chain(reps, x)
            float(r.reshape(-1)[0])
            if i:
                best = min(best, time.perf_counter() - t0)
        return best / reps

    t = timed(lambda v: stencil_poly_apply(op, stages, v), 150)
    gnnz = 4 * op.nnz / t / 1e9
    ok = gnnz > 400
    print(f"  [{'PASS' if ok else 'FAIL'}] cheb4 fused sweep rate "
          f"{gnnz:.0f} Gnnz/s ({t*1e3:.3f} ms; round-2B measured "
          f"563-603)", flush=True)
    if not ok:
        sys.exit(1)
    print("round2b_chip_check: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
