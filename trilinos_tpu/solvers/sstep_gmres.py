"""s-step (communication-avoiding) GMRES.

TPU-native analogue of the reference's native Tpetra s-step GMRES
(packages/belos/tpetra/src/solvers/Belos_Tpetra_GmresSstep.hpp:305 —
matrix-powers blocks orthogonalized en bloc, cutting the number of global
reductions per basis vector).

Per block of s basis vectors: s operator applies, ONE CGS2 block
projection (2 psums) and ONE CholQR2 (2 psums) — 4 reductions per s
vectors versus ~3 per vector for standard Arnoldi/GMRES. On a pod slice
where the all-reduce latency rivals the SpMV time, this is the lever the
reference builds GmresSstep for.

Bookkeeping (monomial basis, σ-scaled for conditioning): each block
produces W = [w₁..w_s], w_k = (A w_{k-1})/σ with w₀ = q (the last basis
vector). The relation A·[q w₁..w_{s-1}] = σ·[w₁..w_s] lets both sides be
expressed in the final orthonormal basis, so GMRES reduces to a small
least-squares with the assembled coefficient matrices — no per-vector
Hessenberg updates, no extra reductions.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.comm import Comm, SerialComm, norm2
from .base import Operator, SolveResult, identity_prec, rhs_norm_scale, safe_divide
from .ortho import cgs2_project, cholqr2


def sstep_gmres(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
                s: int = 4, t_blocks: int = 8, max_restarts: int = 20,
                rtol: float = 1e-8, atol: float = 0.0, sigma: float | None = None,
                prec: Operator | None = None,
                comm: Comm | None = None,
                basis_impl: str = "auto",
                powers_fn: Callable | None = None) -> SolveResult:
    """Restarted s-step GMRES: m = s·t_blocks basis vectors per cycle.

    basis_impl: how the matrix-powers block W = [Aq/σ, A²q/σ², …] is
    generated. 'loop' = s separate operator applies (any operator);
    'fused' = the single-HBM-pass Pallas matrix-powers kernel
    (stencil_powers_apply — requires ``op`` to be an unpreconditioned
    StencilOp; interpreted off-TPU, for tests); 'auto' = fused when
    applicable on a TPU backend, else loop.

    powers_fn: explicit basis generator overriding basis_impl —
    ``powers_fn(q, sigma) -> (n, s)`` with columns w_k = (A w_{k-1})/σ,
    w_0 = q. The distributed CA driver passes the one-exchange halo
    matrix-powers generator here (requires ``sigma`` to be given, since
    the host-side estimate cannot run inside shard_map)."""
    comm = comm or SerialComm()
    M = prec or identity_prec
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    m = s * t_blocks
    dtype = b.dtype

    def opM(v):
        return op(M(v))

    powers_fused = powers_fn
    if powers_fused is None and basis_impl != "loop" and prec is None:
        from ..ops import pallas as pk
        from ..ops.pallas.stencil_op import StencilOp
        from ..ops.pallas.stencil_poly import (monomial_stages,
                                               stencil_powers_applicable,
                                               stencil_powers_apply)

        ok = (isinstance(op, StencilOp) and n == op.n_rows_pad
              and dtype == jnp.float32
              and stencil_powers_applicable(op, s))
        if ok and (basis_impl == "fused" or pk._on_tpu()):
            interp = not pk._on_tpu()
            pad = (jnp.arange(n) < op.n_rows) if op.n_rows_pad > op.n_rows \
                else None

            def powers_fused(q, sig):
                u = stencil_powers_apply(op, monomial_stages(s, sig), q,
                                         interpret=interp)   # (s, n)
                if pad is not None:
                    # loop path zeroes pad rows on the first apply; the
                    # kernel's identity convention would carry q's pads
                    u = jnp.where(pad[None, :], u, 0.0)
                return u.T                                    # (n, s)
    if basis_impl == "fused" and powers_fused is None:
        raise ValueError("basis_impl='fused' needs an unpreconditioned "
                         "f32 StencilOp with a viable kernel plan")
    if powers_fn is not None and sigma is None:
        raise ValueError("powers_fn requires an explicit sigma (the "
                         "host-side estimate cannot run inside "
                         "shard_map)")

    if sigma is None:
        # crude ‖A‖ estimate for basis scaling (host-side, few applies)
        import numpy as np

        v = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        dtype=dtype)
        v = v / norm2(comm, v)
        for _ in range(3):
            w = opM(v)
            sig = norm2(comm, w)
            v = safe_divide(w, sig)
        sigma = float(sig)
        sigma = max(sigma, 1e-30)

    bnorm = norm2(comm, b)
    tol = rhs_norm_scale(bnorm, rtol, atol)

    def cycle(x):
        r = b - op(x)
        beta = norm2(comm, r)
        v = jnp.zeros((n, m + 1), dtype).at[:, 0].set(safe_divide(r, beta))
        ex = jnp.zeros((m + 1, m), dtype)  # X (search dirs) in V coords
        fy = jnp.zeros((m + 1, m), dtype)  # A·X/1 in V coords

        def blk_body(blk, carry):
            v, ex, fy = carry
            j0 = blk * s
            q = lax.dynamic_slice(v, (0, j0), (n, 1))[:, 0]

            # matrix powers W (n, s), scaled by sigma each step
            if powers_fused is not None:
                wmat = powers_fused(q, sigma)
            else:
                def pw(i, carry):
                    w_prev, wmat = carry
                    w = opM(w_prev) * (1.0 / sigma)
                    wmat = lax.dynamic_update_slice(wmat, w[:, None],
                                                    (0, i))
                    return w, wmat

                # init derived from q so the carry keeps q's varying
                # manual axes under shard_map (a plain zeros would be
                # replicated and trip the vma check)
                wmat0 = q[:, None] * jnp.zeros((1, s), dtype)
                _, wmat = lax.fori_loop(0, s, pw, (q, wmat0))
            # block orthogonalization: W = V C + Q R  (4 reductions total)
            w2, c_full = cgs2_project(comm, v, wmat)
            q_new, r_small, _ = cholqr2(comm, w2)
            v = lax.dynamic_update_slice(v, q_new, (0, j0 + 1))
            # global coords of w^{(k)}: C[:,k] + R[:,k] at slots j0+1..j0+s
            g = c_full  # (m+1, s)
            blkpart = lax.dynamic_slice(g, (j0 + 1, 0), (s, s))
            g = lax.dynamic_update_slice(g, blkpart + r_small, (j0 + 1, 0))
            # X columns j0..j0+s-1: [e_{j0}, g_1..g_{s-1}]
            e_col = jnp.zeros((m + 1, 1), dtype).at[j0, 0].set(1.0)
            x_blk = jnp.concatenate([e_col, g[:, : s - 1]], axis=1)
            ex = lax.dynamic_update_slice(ex, x_blk, (0, j0))
            # Y columns: A X = sigma * [g_1 .. g_s]
            fy = lax.dynamic_update_slice(fy, sigma * g, (0, j0))
            return v, ex, fy

        v, ex, fy = lax.fori_loop(0, t_blocks, blk_body, (v, ex, fy))
        e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        q_h, r_h = jnp.linalg.qr(fy)
        y = jax.scipy.linalg.solve_triangular(r_h, q_h.T @ e1, lower=False)
        x = x + M(v @ (ex @ y))
        return x

    def res_norm(x):
        return norm2(comm, b - op(x))

    def cond(st):
        x, k, rn = st
        return jnp.logical_and(k < max_restarts + 1, rn > tol)

    def body(st):
        x, k, _ = st
        x = cycle(x)
        return x, k + 1, res_norm(x)

    x, cycles, rn = lax.while_loop(cond, body, (x, 0, res_norm(x)))
    return SolveResult(x=x, iters=cycles * m, resnorm=rn,
                       converged=rn <= tol)
