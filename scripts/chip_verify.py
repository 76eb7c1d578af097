"""Canonical real-chip verification: BASELINE configs 1+2 on the PALLAS
path + kernel-parity spot checks (VERDICT round-1 weak #6 — kernel
regressions must fail a config check, not just move a bench number).

Run (no env overrides — uses the tunneled TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_verify.py
Takes ~5-15 min (remote compiles dominate). Exits nonzero on failure.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def check(name, ok, detail=""):
    print(f"  [{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
    if not ok:
        sys.exit(1)


def main():
    print("devices:", jax.devices(), flush=True)
    from trilinos_tpu.galeri import laplace2d, laplace3d
    from trilinos_tpu.ops import choose_format, matvec as mv
    from trilinos_tpu.solvers import cg, gmres

    # --- kernel parity on chip (pallas vs xla), plane + DIA + SpMM ------
    op = laplace3d(64, 64, 32, dtype=np.float32, fmt="stencil")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        op.n_rows_pad), dtype=jnp.float32)
    y_p = jax.jit(lambda v: mv.spmv(op, v))(x)  # pallas on chip
    y_x = jax.jit(lambda v: mv.spmv(op, v, impl="xla"))(x)
    err = float(jnp.max(jnp.abs(y_p - y_x)))
    check("plane-stencil kernel parity", err < 1e-4, f"err={err:.1e}")

    a = laplace3d(64, 64, 32, dtype=np.float32, fmt="dia")
    y_p = jax.jit(lambda m, v: mv.spmv(m, v))(a, x)
    y_x = jax.jit(lambda m, v: mv.spmv(m, v, impl="xla"))(a, x)
    err = float(jnp.max(jnp.abs(y_p - y_x)))
    check("DIA kernel parity", err < 1e-4, f"err={err:.1e}")

    xm = jnp.asarray(np.random.default_rng(1).standard_normal(
        (a.n_rows_pad, 4)), dtype=jnp.float32)
    y_p = jax.jit(lambda m, v: mv.spmv(m, v))(a, xm)  # packed SpMM kernel
    y_x = jax.jit(lambda m, v: mv.spmv(m, v, impl="xla"))(a, xm)
    err = float(jnp.max(jnp.abs(y_p - y_x)))
    check("DIA SpMM k=4 kernel parity", err < 1e-4, f"err={err:.1e}")

    # --- fused polynomial (Chebyshev) kernel parity ----------------------
    from trilinos_tpu.ops.pallas.stencil_poly import (
        chebyshev_stages, stencil_poly_applicable, stencil_poly_apply,
        stencil_poly_xla)

    if stencil_poly_applicable(op, 4):
        stages = chebyshev_stages(1.9, 0.06, 4, 1 / 6.0)
        y_p = jax.jit(lambda v: stencil_poly_apply(op, stages, v))(x)
        y_x = stencil_poly_xla(op, stages, x)
        err = float(jnp.max(jnp.abs(y_p - y_x))) / float(
            jnp.max(jnp.abs(y_x)))
        check("fused cheb4 polynomial kernel parity", err < 1e-5,
              f"err={err:.1e}")

    # --- all-output matrix-powers kernel (CA-GMRES basis) ----------------
    from trilinos_tpu.ops.pallas.stencil_poly import (
        monomial_stages, stencil_powers_applicable, stencil_powers_apply,
        stencil_powers_xla)

    if stencil_powers_applicable(op, 4):
        pst = monomial_stages(4, sigma=12.0)
        u_p = jax.jit(lambda v: stencil_powers_apply(op, pst, v))(x)
        u_x = stencil_powers_xla(op, pst, x)
        err = float(jnp.max(jnp.abs(u_p - u_x))) / float(
            jnp.max(jnp.abs(u_x)))
        check("matrix-powers (all-output) kernel parity", err < 1e-5,
              f"err={err:.1e}")

    # --- BASELINE config 1: Laplace2D 100^2, unprec CG (pallas path) ----
    a1 = laplace2d(100, 100, dtype=np.float32)
    dev = choose_format(a1)
    n, npad = a1.shape[0], dev.n_rows_pad
    b = np.zeros(npad, np.float32)
    b[:n] = np.random.default_rng(0).standard_normal(n)
    res = cg(lambda v: mv.spmv(dev, v), jnp.asarray(b), rtol=1e-5,
             maxiter=2000)
    xs = np.asarray(res.x)[:n]
    rel = np.linalg.norm(b[:n] - a1.to_dense() @ xs) / np.linalg.norm(b[:n])
    check("config 1 (CG, pallas path)",
          bool(res.converged) and rel <= 1.05e-5,
          f"iters={int(res.iters)} rel={rel:.1e}")

    # --- BASELINE config 2: Laplace3D 64^3, Jacobi-GMRES, SpMM nrhs=4 ---
    a2 = laplace3d(64, 64, 64, dtype=np.float32, fmt="dia")
    n2, npad2 = 64 ** 3, a2.n_rows_pad
    d = 6.0
    dinv = jnp.asarray(np.full(npad2, 1.0 / d, np.float32))
    b2 = np.zeros((npad2, 4), np.float32)
    b2[:n2] = np.random.default_rng(2).standard_normal((n2, 4))
    t0 = time.time()
    res2 = gmres(lambda v: mv.spmv(a2, v), jnp.asarray(b2),
                 prec=lambda v: dinv[:, None] * v if v.ndim == 2
                 else dinv * v, rtol=1e-5, restart=30, maxiter=300)
    ok = bool(jnp.all(res2.converged))
    check("config 2 (Jacobi-GMRES nrhs=4, SpMM kernel)", ok,
          f"iters={int(res2.iters)} t={time.time()-t0:.0f}s")

    # --- round 5: solver-reduction precision (HIGHEST vs MXU bf16) ------
    # A unit-norm f32 Gram must come out exact to ~1e-6; the default MXU
    # path truncates inputs to bf16 (~4e-3) — this catches the precision
    # pin regressing (ops/blas.py HI, docs/PRECISION.md rule 3).
    from trilinos_tpu.ops.blas import local_dot, mv_trans_mv

    rng5 = np.random.default_rng(5)
    w = np.linalg.qr(rng5.standard_normal((1 << 15, 6)))[0]
    wd = jnp.asarray(w, jnp.float32)
    g = np.asarray(jax.jit(lambda v: mv_trans_mv(v, v))(wd), np.float64)
    gerr = float(np.max(np.abs(g - w.T @ w)))
    check("Gram precision (HIGHEST pin)", gerr < 1e-5, f"err={gerr:.1e}")
    dd = np.asarray(jax.jit(local_dot)(wd, wd), np.float64)
    derr = float(np.max(np.abs(dd - np.sum(w * w, axis=0))))
    check("dot precision (HIGHEST pin)", derr < 1e-5, f"err={derr:.1e}")

    # --- round 5: generalized pencil Davidson on chip (f32) -------------
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from trilinos_tpu.eigen import block_davidson

    nn = 256
    a5 = sp.diags([2.0 + rng5.random(nn), -0.9 * np.ones(nn - 1),
                   -0.9 * np.ones(nn - 1)], [0, -1, 1]).tocsr()
    m5 = sp.diags([2.0 + rng5.random(nn), 0.3 * np.ones(nn - 1),
                   0.3 * np.ones(nn - 1)], [0, -1, 1]).tocsr()
    ad = jnp.asarray(a5.toarray(), jnp.float32)
    md = jnp.asarray(m5.toarray(), jnp.float32)
    res5 = block_davidson(lambda v: ad @ v, nn, 3, which="LA", tol=1e-4,
                          maxiter=200, m=lambda v: md @ v,
                          dtype=jnp.float32)
    w_ref = np.sort(spla.eigsh(a5, k=3, M=m5, which="LM",
                               return_eigenvectors=False))
    perr = float(np.max(np.abs(np.sort(res5.eigenvalues) - w_ref)
                        / np.abs(w_ref)))
    check("pencil Davidson f32 on chip", perr < 1e-3,
          f"rel_err={perr:.1e} conv={res5.converged}")
    print("chip_verify: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
