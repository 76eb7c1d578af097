"""RTR — Riemannian Trust-Region eigensolver (symmetric, smallest).

TPU-native analogue of Anasazi::RTRSolMgr / IRTR
(packages/anasazi/src/AnasaziRTRSolMgr.hpp, AnasaziRTRBase.hpp,
AnasaziIRTR.hpp): minimize f(X) = trace(XᵀAX) over the Grassmann
manifold {X : XᵀX = I} with a trust-region outer iteration whose model
subproblem is solved by truncated CG (Steihaug–Toint) in the tangent
space (Xᵀη = 0), Hess[η] = P(Aη − η·(XᵀAX)), P = I − XXᵀ.

Structure: the whole tCG inner solve is ONE jitted lax.while_loop (fixed
shapes, no host round-trips per inner step); the outer loop (retraction
via CholQR, ρ-ratio trust-region update) runs on host with a handful of
jitted device calls per iteration. Converges to the ``nev`` smallest
eigenpairs of a symmetric operator — the RTR sweet spot the reference
documents (strong preconditioner-free convergence for well-separated
small eigenvalues).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.comm import Comm, SerialComm
from ..solvers.base import Operator, hi_precision
from ..solvers.ortho import cholqr2
from .krylov_schur import EigsResult


@hi_precision
def rtr(op: Operator, n: int, nev: int, *, block: int | None = None,
        tol: float = 1e-8, maxiter: int = 100, max_inner: int | None = None,
        v0: jax.Array | None = None, comm: Comm | None = None,
        dtype=jnp.float64) -> EigsResult:
    """``nev`` smallest eigenpairs of a symmetric operator via RTR."""
    comm = comm or SerialComm()
    p = block or nev
    max_inner = max_inner or max(4 * p, 40)
    rng = np.random.default_rng(17)
    if v0 is None:
        v0 = jnp.asarray(rng.standard_normal((n, p)), dtype=dtype)

    def inner(x, ax, eta):
        """<x, eta> summed per... full Frobenius inner product."""
        return comm.psum(jnp.sum(x * eta))

    @jax.jit
    def rayleigh(x):
        ax = op(x)
        m = comm.psum(x.T @ ax)
        m = (m + m.T) / 2
        g = ax - x @ m  # Riemannian gradient (X orthonormal)
        gn = jnp.sqrt(comm.psum(jnp.sum(g * g)))
        return ax, m, g, gn

    @jax.jit
    def tcg(x, m, g, delta):
        """Truncated CG for Hess[η] = −g, trust radius ``delta``.

        Returns (eta, heta, stop_code). Standard Steihaug: negative
        curvature or boundary hit → move to the boundary along the
        current direction; otherwise run to the inner tolerance
        (superlinear θ=1 stopping rule of AnasaziIRTR.hpp)."""
        gnorm0 = jnp.sqrt(comm.psum(jnp.sum(g * g)))
        kappa, theta = 0.1, 1.0
        stop_tol = gnorm0 * jnp.minimum(kappa, gnorm0 ** theta)

        def hess(eta):
            heta = op(eta) - eta @ m
            return heta - x @ comm.psum(x.T @ heta)  # tangent projection

        def boundary_step(eta, d, dd, ed):
            ee = comm.psum(jnp.sum(eta * eta))
            disc = jnp.sqrt(jnp.maximum(ed * ed + dd * (delta ** 2 - ee),
                                        0.0))
            return jnp.where(dd > 0, (-ed + disc) / jnp.where(dd > 0, dd, 1),
                             0.0)

        def cond(st):
            _, _, r, _, rr, it, code = st
            return jnp.logical_and(it < max_inner,
                                   jnp.logical_and(code == 0,
                                                   jnp.sqrt(rr) > stop_tol))

        def body(st):
            eta, heta, r, d, rr, it, code = st
            hd = hess(d)
            dhd = comm.psum(jnp.sum(d * hd))
            dd = comm.psum(jnp.sum(d * d))
            ed = comm.psum(jnp.sum(eta * d))
            alpha = rr / jnp.where(dhd != 0, dhd, 1.0)
            eta_try = eta + alpha * d
            ee_try = comm.psum(jnp.sum(eta_try * eta_try))
            neg_curv = dhd <= 0
            past_boundary = ee_try >= delta ** 2
            tau = boundary_step(eta, d, dd, ed)
            hit = jnp.logical_or(neg_curv, past_boundary)
            eta_new = jnp.where(hit, eta + tau * d, eta_try)
            heta_new = jnp.where(hit, heta + tau * hd, heta + alpha * hd)
            r_new = r + alpha * hd  # residual of H eta = -g
            rr_new = comm.psum(jnp.sum(r_new * r_new))
            beta = rr_new / jnp.where(rr != 0, rr, 1.0)
            d_new = -r_new + beta * d
            code_new = jnp.where(hit, jnp.where(neg_curv, 1, 2),
                                 0).astype(jnp.int32)
            return (eta_new, heta_new, r_new, d_new, rr_new, it + 1,
                    code_new)

        z = jnp.zeros_like(g)
        r0 = g
        rr0 = comm.psum(jnp.sum(r0 * r0))
        st = (z, z, r0, -g, rr0, jnp.int32(0), jnp.int32(0))
        eta, heta, _, _, _, it, code = lax.while_loop(cond, body, st)
        return eta, heta, it, code

    @jax.jit
    def retract(x, eta):
        q, _, _ = cholqr2(comm, x + eta)
        return q

    @jax.jit
    def model_decrease(g, eta, heta):
        return -(comm.psum(jnp.sum(g * eta))
                 + 0.5 * comm.psum(jnp.sum(eta * heta)))

    x, _, _ = cholqr2(comm, v0.astype(dtype))
    delta = float(np.sqrt(p))  # initial trust radius ~ ||X||_F
    delta_bar = 10 * delta
    rho_prime = 0.1

    theta = resn = None
    converged = False
    iters = 0
    ax, m, g, gn = rayleigh(x)
    f_cur = float(np.trace(np.asarray(m)))

    for it in range(maxiter):
        iters = it + 1
        # convergence: per-column Ritz residuals
        mm = np.asarray(m)
        w, z = np.linalg.eigh((mm + mm.T) / 2)
        theta = w[:nev]
        xa = np.asarray(x) @ z
        ra = np.asarray(ax) @ z - xa * w[None, :]
        resn = np.linalg.norm(ra[:, :nev], axis=0)
        scale = np.maximum(np.abs(theta), 1.0)
        converged = bool((resn <= tol * scale).all())
        if converged:
            break
        eta, heta, in_it, code = tcg(x, m, g, jnp.asarray(delta, dtype))
        x_try = retract(x, eta)
        ax_t, m_t, g_t, gn_t = rayleigh(x_try)
        f_try = float(np.trace(np.asarray(m_t)))
        mdec = float(model_decrease(g, eta, heta))
        # rho regularization (AnasaziRTRBase's fx-vs-model guard, same
        # cure as Manopt's rho_regularization): near convergence both
        # f_cur - f_try and the model decrease fall to fp noise and the
        # raw ratio rejects good steps forever
        reg = 1e3 * np.finfo(np.float64).eps * max(1.0, abs(f_cur))
        rho = (f_cur - f_try + reg) / (max(mdec, 0.0) + reg)
        if rho < 0.25:
            delta = delta / 4
        elif rho > 0.75 and int(code) in (1, 2):
            delta = min(2 * delta, delta_bar)
        if rho > rho_prime:
            x, ax, m, g, gn, f_cur = x_try, ax_t, m_t, g_t, gn_t, f_try

    # final Ritz extraction
    mm = np.asarray(m)
    w, z = np.linalg.eigh((mm + mm.T) / 2)
    xa = np.asarray(x) @ z
    ra = np.asarray(ax) @ z - xa * w[None, :]
    return EigsResult(
        eigenvalues=w[:nev], eigenvectors=xa[:, :nev],
        resnorms=np.linalg.norm(ra[:, :nev], axis=0), iters=iters,
        converged=converged)
