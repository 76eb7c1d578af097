"""Conjugate-gradient family.

TPU-native Krylov drivers with the capability surface of the reference's
CG stack:
  * ``cg``              — preconditioned (pseudo-block) CG, the analogue of
    Belos::PseudoBlockCGIter (packages/belos/src/BelosPseudoBlockCGIter.hpp:411).
    Per iteration: 1 operator apply + 2 global reductions (the r·z and r·r
    dots share a single fused psum).
  * ``cg_single_reduce``— Chronopoulos/Gear CG with ONE reduction per
    iteration, the analogue of Belos::CGSingleRedIter's fused MvTransMv
    (packages/belos/src/BelosCGSingleRedIter.hpp:79,477-483).
  * ``cg_pipeline``     — pipelined CG: the reduction for iteration k is
    issued before the operator apply whose result is needed at k+1, so
    XLA's latency-hiding scheduler overlaps all-reduce with SpMV — the
    compiled-collective form of Belos_Tpetra_CgPipeline
    (packages/belos/tpetra/src/solvers/Belos_Tpetra_CgPipeline.hpp:99-109,
    "matrix op moved up to overlap with all-reduce").

Multivector RHS: all reductions are columnwise; converged columns are
frozen by masking their step sizes to zero (pseudo-block deflation).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.blas import local_dot
from ..parallel.comm import Comm, SerialComm
from .base import (Operator, SolveResult, bcast_cols, certified_solve,
                   certify_residual, identity_prec, rhs_norm_scale,
                   safe_divide)


def cg(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
       prec: Operator | None = None, rtol: float = 1e-8, atol: float = 0.0,
       maxiter: int = 1000, comm: Comm | None = None) -> SolveResult:
    """Preconditioned CG (left-preconditioned in the M-inner-product form)."""
    comm = comm or SerialComm()
    M = prec or identity_prec
    x = jnp.zeros_like(b) if x0 is None else x0

    bb = comm.psum(local_dot(b, b))
    tol = rhs_norm_scale(jnp.sqrt(bb), rtol, atol)

    def solve_from(x, tol2, k0):
        r = b - op(x)
        z = M(r)
        p = z
        d0 = comm.psum(jnp.stack([local_dot(r, z), local_dot(r, r)]))
        rz, rr = d0[0], d0[1]

        def cond(s):
            x, r, z, p, rz, rr, k = s
            return jnp.logical_and(k < maxiter, jnp.any(rr > tol2))

        def body(s):
            x, r, z, p, rz, rr, k = s
            active = rr > tol2
            ap = op(p)
            pap = comm.psum(local_dot(p, ap))
            alpha = jnp.where(active, safe_divide(rz, pap), 0)
            x = x + bcast_cols(alpha, p)
            r = r - bcast_cols(alpha, ap)
            z = M(r)
            d = comm.psum(jnp.stack([local_dot(r, z), local_dot(r, r)]))
            rz_new, rr_new = d[0], d[1]
            beta = jnp.where(active, safe_divide(rz_new, rz), 0)
            p = z + bcast_cols(beta, p)
            return (x, r, z, p, jnp.where(active, rz_new, rz),
                    jnp.where(active, rr_new, rr), k + 1)

        x, r, z, p, rz, rr, k = lax.while_loop(
            cond, body, (x, r, z, p, rz, rr, k0))
        return x, k

    x, k, resnorm, conv = certified_solve(solve_from, op, b, x, tol,
                                          maxiter, comm)
    return SolveResult(x=x, iters=k, resnorm=resnorm, converged=conv)


def cg_fused(op_stencil, b: jax.Array, x0: jax.Array | None = None, *,
             rtol: float = 1e-8, atol: float = 0.0, maxiter: int = 1000,
             interpret: bool = False) -> SolveResult:
    """Fully-fused CG for matrix-free StencilOps: ONE Pallas launch per
    iteration (SpMV + dots + all vector updates fused —
    ops/pallas/cg_fused.py; identity preconditioner, single device,
    single RHS). Falls back is the caller's job: check
    ``ops.pallas.cg_fused.cg_fused_applicable(op)`` first.

    The reference's per-kernel CG timer trio (axpby/dot/spmv,
    tpetra/core/test/PerformanceCGSolve/cg_solve_file.hpp:138-140) is the
    unfused ladder this collapses.
    """
    from ..ops.matvec import spmv
    from ..ops.pallas.cg_fused import cg_fused_iteration

    comm = SerialComm()
    x = jnp.zeros_like(b) if x0 is None else x0
    bb = comm.psum(local_dot(b, b))
    tol = rhs_norm_scale(jnp.sqrt(bb), rtol, atol)

    def solve_from(x, tol2, k0):
        r = b - spmv(op_stencil, x)
        w = spmv(op_stencil, r)
        rz = local_dot(r, r)
        delta = local_dot(r, w)
        scal = jnp.stack([rz, delta, jnp.zeros_like(rz),
                          jnp.ones_like(rz)]).reshape(1, 4).astype(
                              jnp.float32)
        p = jnp.zeros_like(r)  # beta=0 on the first pass -> p0 = r
        q = jnp.zeros_like(r)

        def cond(s):
            x, r, w, p, q, scal, k = s
            return jnp.logical_and(k < maxiter, scal[0, 0] > tol2)

        def body(s):
            x, r, w, p, q, scal, k = s
            x, r, w, p, q, scal = cg_fused_iteration(
                op_stencil, x, r, w, p, q, scal, interpret=interpret)
            return x, r, w, p, q, scal, k + 1

        x, r, w, p, q, scal, k = lax.while_loop(
            cond, body, (x, r, w, p, q, scal, k0))
        return x, k

    x, k, resnorm, conv = certified_solve(
        solve_from, lambda v: spmv(op_stencil, v), b, x, tol, maxiter,
        comm)
    return SolveResult(x=x, iters=k, resnorm=resnorm, converged=conv)


def stochastic_cg(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
                  prec: Operator | None = None, rtol: float = 1e-8,
                  atol: float = 0.0, maxiter: int = 1000,
                  comm: Comm | None = None,
                  key: jax.Array | None = None
                  ) -> tuple[SolveResult, jax.Array]:
    """Stochastic CG (Parker–Fox): solves A x = b and simultaneously draws
    y ~ N(0, A^-1) by accumulating y += (xi_k / sqrt(p'Ap)) p with scalar
    iid xi_k ~ N(0,1) per iteration — the algorithm of
    Belos::PseudoBlockStochasticCGSolMgr / StochasticCGIter
    (packages/belos/src/BelosPseudoBlockStochasticCGIter.hpp).

    Returns (SolveResult, y). The sample distribution is exact when CG runs
    to full accuracy in exact arithmetic; like the reference, partial
    convergence yields an approximate sample from the dominant subspace.
    """
    comm = comm or SerialComm()
    M = prec or identity_prec
    x = jnp.zeros_like(b) if x0 is None else x0
    key = jax.random.PRNGKey(0) if key is None else key

    r = b - op(x)
    z = M(r)
    p = z
    y = jnp.zeros_like(b)
    d0 = comm.psum(jnp.stack([local_dot(r, z), local_dot(r, r),
                              local_dot(b, b)]))
    rz, rr, bb = d0[0], d0[1], d0[2]
    tol = rhs_norm_scale(jnp.sqrt(bb), rtol, atol)
    tol2 = tol * tol
    ncols = () if b.ndim == 1 else (b.shape[1],)

    def cond(s):
        x, y, r, z, p, rz, rr, k, key = s
        return jnp.logical_and(k < maxiter, jnp.any(rr > tol2))

    def body(s):
        x, y, r, z, p, rz, rr, k, key = s
        active = rr > tol2
        ap = op(p)
        pap = comm.psum(local_dot(p, ap))
        alpha = jnp.where(active, safe_divide(rz, pap), 0)
        key, sub = jax.random.split(key)
        xi = jax.random.normal(sub, ncols, dtype=b.dtype)
        s_coef = jnp.where(active, xi * jax.lax.rsqrt(
            jnp.where(pap > 0, pap, 1)), 0)
        x = x + bcast_cols(alpha, p)
        y = y + bcast_cols(s_coef, p)
        r = r - bcast_cols(alpha, ap)
        z = M(r)
        d = comm.psum(jnp.stack([local_dot(r, z), local_dot(r, r)]))
        rz_new, rr_new = d[0], d[1]
        beta = jnp.where(active, safe_divide(rz_new, rz), 0)
        p = z + bcast_cols(beta, p)
        return (x, y, r, z, p, jnp.where(active, rz_new, rz),
                jnp.where(active, rr_new, rr), k + 1, key)

    s = (x, y, r, z, p, rz, rr, 0, key)
    x, y, r, z, p, rz, rr, k, key = lax.while_loop(cond, body, s)
    resnorm, conv = certify_residual(op, b, x, tol, comm)
    return SolveResult(x=x, iters=k, resnorm=resnorm, converged=conv), y


def cg_single_reduce(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
                     prec: Operator | None = None, rtol: float = 1e-8,
                     atol: float = 0.0, maxiter: int = 1000,
                     comm: Comm | None = None) -> SolveResult:
    """Chronopoulos–Gear CG: one fused reduction per iteration.

    Recurrences (z = M r, w = A z):
        delta = <z, w>, rz = <r, z>, rr = <r, r>   — ONE psum
        beta  = rz / rz_prev  (0 on first step)
        alpha = rz / (delta - beta * rz / alpha_prev)
    """
    comm = comm or SerialComm()
    M = prec or identity_prec
    x = jnp.zeros_like(b) if x0 is None else x0

    bb = comm.psum(local_dot(b, b))
    tol = rhs_norm_scale(jnp.sqrt(bb), rtol, atol)

    def solve_from(x, tol2, k0):
        r = b - op(x)
        z = M(r)
        w = op(z)
        d0 = comm.psum(jnp.stack([local_dot(r, z), local_dot(z, w),
                                  local_dot(r, r)]))
        rz, delta, rr = d0[0], d0[1], d0[2]
        alpha = safe_divide(rz, delta)
        beta = jnp.zeros_like(alpha)
        p = z
        q = w

        def cond(s):
            x, r, z, p, q, w, rz, rr, alpha, beta, k = s
            return jnp.logical_and(k < maxiter, jnp.any(rr > tol2))

        def body(s):
            x, r, z, p, q, w, rz, rr, alpha, beta, k = s
            active = rr > tol2
            a = jnp.where(active, alpha, 0)
            x = x + bcast_cols(a, p)
            r = r - bcast_cols(a, q)
            z = M(r)
            w = op(z)
            d = comm.psum(jnp.stack([local_dot(r, z), local_dot(z, w),
                                     local_dot(r, r)]))
            rz_new, delta, rr_new = d[0], d[1], d[2]
            beta_new = jnp.where(active, safe_divide(rz_new, rz), 0)
            alpha_new = safe_divide(
                rz_new, delta - beta_new * safe_divide(rz_new, alpha))
            alpha_new = jnp.where(active, alpha_new, alpha)
            p = z + bcast_cols(beta_new, p)
            q = w + bcast_cols(beta_new, q)
            return (x, r, z, p, q, w, jnp.where(active, rz_new, rz),
                    jnp.where(active, rr_new, rr), alpha_new, beta_new,
                    k + 1)

        s = (x, r, z, p, q, w, rz, rr, alpha, beta, k0)
        out = lax.while_loop(cond, body, s)
        return out[0], out[10]

    x, k, resnorm, conv = certified_solve(solve_from, op, b, x, tol,
                                          maxiter, comm)
    return SolveResult(x=x, iters=k, resnorm=resnorm, converged=conv)


def cg_pipeline(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
                prec: Operator | None = None, rtol: float = 1e-8,
                atol: float = 0.0, maxiter: int = 1000,
                comm: Comm | None = None,
                replace_every: int = 50) -> SolveResult:
    """Pipelined CG (Ghysels–Vanroose) with periodic residual replacement.

    Inside one jitted while-loop body the fused reduction's result feeds
    nothing until after the next ``op(...)`` has been emitted, so the XLA
    latency-hiding scheduler overlaps the all-reduce with the SpMV (the
    compiled-collective equivalent of Belos_Tpetra_CgPipeline's early idot,
    packages/belos/tpetra/src/solvers/Belos_Tpetra_CgPipeline.hpp:99-109).

    The extra recurrence vectors drift in finite precision (classic
    pipelined-CG stagnation — observed ~1e-2 in f32 without a guard), so
    every ``replace_every`` iterations the pipelined state is rebuilt from
    the TRUE residual r = b - A x and the current search direction — the
    residual-replacement safeguard Belos pairs with its implicit-residual
    convergence tests (BelosStatusTestImpResNorm.hpp:47-88). The segment
    boundary restarts the alpha recurrence from the directly computed
    <r,u>/<p,Ap>, which is the exact CG step for the preserved direction.
    """
    comm = comm or SerialComm()
    M = prec or identity_prec
    x = jnp.zeros_like(b) if x0 is None else x0

    bb = comm.psum(local_dot(b, b))
    tol = rhs_norm_scale(jnp.sqrt(bb), rtol, atol)

    def refresh(x, p):
        """Rebuild pipelined state from scratch (replacement step)."""
        r = b - op(x)
        u = M(r)
        w = op(u)
        s_v = op(p)
        q = M(s_v)
        z = op(q)
        d = comm.psum(jnp.stack([local_dot(r, u), local_dot(w, u),
                                 local_dot(r, r), local_dot(p, s_v)]))
        gamma, rr, pap = d[0], d[2], d[3]
        alpha = safe_divide(gamma, pap)
        return r, u, w, s_v, q, z, gamma, rr, alpha

    def make_inner(tol2):
        def inner_cond(st):
            (x, r, u, w, m_, n_, z, q, p, s_v, gamma, rr, alpha, k,
             k0) = st
            return jnp.logical_and(
                jnp.logical_and(k < maxiter, k - k0 < replace_every),
                jnp.any(rr > tol2))

        def inner_body(st):
            (x, r, u, w, m_, n_, z, q, p, s_v, gamma, rr, alpha, k,
             k0) = st
            active = rr > tol2
            a = jnp.where(active, alpha, 0)
            x = x + bcast_cols(a, p)
            r = r - bcast_cols(a, s_v)
            u = u - bcast_cols(a, q)
            w = w - bcast_cols(a, z)
            # issue the fused reduction for this step ...
            d = comm.psum(jnp.stack([local_dot(r, u), local_dot(w, u),
                                     local_dot(r, r)]))
            # ... then emit the next apply chain; XLA overlaps them
            m_next = M(w)
            n_next = op(m_next)
            gamma_new, delta, rr_new = d[0], d[1], d[2]
            beta_new = jnp.where(active, safe_divide(gamma_new, gamma), 0)
            alpha_new = safe_divide(
                gamma_new, delta - beta_new * safe_divide(gamma_new, alpha))
            alpha_new = jnp.where(active, alpha_new, alpha)
            p = u + bcast_cols(beta_new, p)
            s_v = w + bcast_cols(beta_new, s_v)
            q = m_next + bcast_cols(beta_new, q)
            z = n_next + bcast_cols(beta_new, z)
            return (x, r, u, w, m_next, n_next, z, q, p, s_v,
                    jnp.where(active, gamma_new, gamma),
                    jnp.where(active, rr_new, rr), alpha_new, k + 1, k0)

        return inner_cond, inner_body

    def solve_from(x, tol2, k0):
        p0 = M(b - op(x))
        inner_cond, inner_body = make_inner(tol2)

        def outer_cond(st):
            x, p, rr, k = st
            return jnp.logical_and(k < maxiter, jnp.any(rr > tol2))

        def outer_body(st):
            x, p, rr, k = st
            r, u, w, s_v, q, z, gamma, rr, alpha = refresh(x, p)
            m_ = M(w)
            n_ = op(m_)
            ist = (x, r, u, w, m_, n_, z, q, p, s_v, gamma, rr, alpha,
                   k, k)
            out = lax.while_loop(inner_cond, inner_body, ist)
            return (out[0], out[8], out[11], out[13])

        x, p, rr, k = lax.while_loop(
            outer_cond, outer_body,
            (x, p0, jnp.full_like(tol2, jnp.inf), k0))
        return x, k

    x, k, resnorm, conv = certified_solve(solve_from, op, b, x, tol,
                                          maxiter, comm)
    return SolveResult(x=x, iters=k, resnorm=resnorm, converged=conv)
