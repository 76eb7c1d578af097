"""Block GMRES: one Krylov space shared by all right-hand sides.

TPU-native analogue of Belos::BlockGmresIter + BlockGmresSolMgr
(packages/belos/src/BelosBlockGmresIter.hpp:83,659 — block Arnoldi with
projectAndNormalize; packages/belos/src/BelosBlockGmresSolMgr.hpp:916 —
restart management; parameter surface :150-158/323-337).

Design differences for TPU:
  * block projection = CGS2/DGKS (two GEMM+psum passes) against the whole
    zero-padded basis; block normalization = CholQR2 — the TSQR-class
    single-reduction panel factorization (SURVEY.md §2.1 TSQR row);
  * each restart cycle runs a FIXED number of block Arnoldi steps
    (static-shape inner loop, no per-step Givens machinery); the block
    least-squares problem is solved once per cycle with one small QR and
    the outer loop restarts until the true residual converges. For block
    sizes ≥ 4 the extra steps past convergence cost less than the dynamic
    control flow they replace.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.comm import Comm, SerialComm
from .base import Operator, SolveResult, identity_prec, rhs_norm_scale
from .ortho import cgs2_project, cholqr2, dgks_project, resolve_method


def block_gmres(op: Operator, b: jax.Array, x0: jax.Array | None = None, *,
                prec: Operator | None = None, num_blocks: int = 30,
                max_restarts: int = 20, rtol: float = 1e-8,
                atol: float = 0.0, comm: Comm | None = None,
                ortho: str = "CGS2") -> SolveResult:
    """Right-preconditioned block GMRES(m) for B of shape (n, nrhs)."""
    comm = comm or SerialComm()
    M = prec or identity_prec
    if b.ndim != 2:
        raise ValueError("block_gmres expects a 2-D multivector RHS")
    n, nb = b.shape
    m = num_blocks
    ortho_m = resolve_method(ortho)
    project = cgs2_project if ortho_m != "DGKS" else dgks_project
    x = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype

    from ..ops.blas import local_dot

    bnorm = jnp.sqrt(comm.psum(local_dot(b, b)))
    tol = rhs_norm_scale(bnorm, rtol, atol)

    def cycle(x):
        r = b - op(x)
        v0, r0_small, _ = cholqr2(comm, r)
        v = jnp.zeros((n, (m + 1) * nb), dtype)
        v = lax.dynamic_update_slice(v, v0, (0, 0))
        h = jnp.zeros(((m + 1) * nb, m * nb), dtype)

        def body(j, carry):
            v, h = carry
            vj = lax.dynamic_slice(v, (0, j * nb), (n, nb))
            w = op(M(vj))
            w2, c = project(comm, v, w)
            q, r_small, _ = cholqr2(comm, w2)
            v = lax.dynamic_update_slice(v, q, (0, (j + 1) * nb))
            hcol = lax.dynamic_update_slice(
                c, r_small, ((j + 1) * nb, 0))
            h = lax.dynamic_update_slice(h, hcol, (0, j * nb))
            return v, h

        v, h = lax.fori_loop(0, m, body, (v, h))
        # least squares: min || E1 R0 − H y ||  (H: ((m+1)nb, m·nb))
        e1r0 = jnp.zeros(((m + 1) * nb, nb), dtype)
        e1r0 = lax.dynamic_update_slice(e1r0, r0_small, (0, 0))
        q_h, r_h = jnp.linalg.qr(h)
        y = jax.scipy.linalg.solve_triangular(
            r_h, q_h.T @ e1r0, lower=False)
        x = x + M(v[:, : m * nb] @ y)
        return x

    def res_norms(x):
        r = b - op(x)
        return jnp.sqrt(comm.psum(local_dot(r, r)))

    def cond(s):
        x, k, rn = s
        return jnp.logical_and(k < max_restarts + 1, jnp.any(rn > tol))

    def body(s):
        x, k, _ = s
        x = cycle(x)
        return x, k + 1, res_norms(x)

    x, cycles, rn = lax.while_loop(cond, body, (x, 0, res_norms(x)))
    return SolveResult(x=x, iters=cycles * m, resnorm=rn,
                       converged=rn <= tol)
