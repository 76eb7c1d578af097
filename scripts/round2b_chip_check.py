"""One-shot on-chip validation of the round-2 session-B kernel work.

Run when the tunnel is healthy:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/round2b_chip_check.py

Covers (in order of increasing compile cost):
  1. flagship CG drive (certified convergence)
  2. fused polynomial kernel parity + cheb4 timing vs unfused (the
     headline of ops/pallas/stencil_poly.py)
  3. chip_verify.py's checks are a superset for the OTHER kernels —
     run it separately; this script focuses on the new surfaces.
Exits nonzero on failure.
"""
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def check(name, ok, detail=""):
    print(f"  [{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    if not ok:
        sys.exit(1)


def main():
    print("devices:", jax.devices(), flush=True)
    from trilinos_tpu.galeri import laplace2d, laplace3d
    from trilinos_tpu.ops import choose_format, matvec as mv
    from trilinos_tpu.ops.pallas.stencil_poly import (
        chebyshev_stages, stencil_poly_apply, stencil_poly_xla)
    from trilinos_tpu.solvers import cg

    # 1. flagship
    a = laplace2d(100, 100, dtype=np.float32)
    dev = choose_format(a)
    n, npad = a.shape[0], dev.n_rows_pad
    b = np.zeros(npad, np.float32)
    b[:n] = np.random.default_rng(0).standard_normal(n)
    res = cg(lambda v: mv.spmv(dev, v), jnp.asarray(b), rtol=1e-5,
             maxiter=2000)
    x = np.asarray(res.x)[:n]
    rel = np.linalg.norm(b[:n] - a.to_dense() @ x) / np.linalg.norm(b[:n])
    check("flagship CG", bool(res.converged) and rel < 1e-5,
          f"iters={int(res.iters)} rel={rel:.1e}")

    # 2. fused polynomial kernel: parity + timing
    op = laplace3d(256, 256, 256, dtype=np.float32, fmt="stencil")
    stages = chebyshev_stages(1.9, 0.06, 4, 1 / 6.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        op.n_rows_pad), jnp.float32)
    got = stencil_poly_apply(op, stages, x)
    want = stencil_poly_xla(op, stages, x)
    err = float(jnp.max(jnp.abs(got - want))) / float(
        jnp.max(jnp.abs(want)))
    check("cheb4 kernel parity 256^3", err < 1e-5, f"err={err:.1e}")

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
    check("cheb4 fused sweep rate", gnnz > 400,
          f"{gnnz:.0f} Gnnz/s ({t*1e3:.3f} ms; round-2B measured 563-603)")
    print("round2b_chip_check: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
