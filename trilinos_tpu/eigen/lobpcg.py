"""LOBPCG — locally optimal block preconditioned conjugate gradients.

TPU-native analogue of Anasazi::LOBPCG
(packages/anasazi/src/AnasaziLOBPCGSolMgr.hpp, AnasaziLOBPCG.hpp). The
method is the most TPU-friendly eigensolver in the reference's set: each
iteration is one block SpMM + small (3·nb)² Rayleigh-Ritz eigenproblem —
MXU GEMMs plus one psum, no sequential recurrences.

Basis conditioning is handled the way the reference's SVQB ortho manager
does (packages/anasazi/src/AnasaziSVQBOrthoManager.hpp) but via CholQR2
panels, consistent with the rest of the framework.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.comm import Comm, SerialComm
from ..solvers.base import Operator, identity_prec
from ..solvers.ortho import cholqr2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EigenResult:
    eigenvalues: jax.Array  # (nev,)
    eigenvectors: jax.Array  # (n, nev)
    iters: jax.Array
    resnorms: jax.Array  # (nev,)


def _rayleigh_ritz(comm: Comm, s: jax.Array, a_s: jax.Array, nev: int):
    """Solve the projected eigenproblem on basis S: (SᵀAS) y = θ (SᵀS) y."""
    g_a = comm.psum(jnp.einsum("nk,nm->km", s, a_s))
    g_m = comm.psum(jnp.einsum("nk,nm->km", s, s))
    # whitening: G_m = L Lᵀ, solve symmetric standard problem
    eps = jnp.finfo(s.dtype).eps
    k = g_m.shape[0]
    mass_diag = jnp.diag(g_m)
    null = mass_diag <= 1e3 * eps * jnp.max(mass_diag)
    l = jnp.linalg.cholesky(g_m + 100 * eps * jnp.trace(g_m) / k
                            * jnp.eye(k, dtype=s.dtype))
    li = jax.scipy.linalg.solve_triangular(l, jnp.eye(k, dtype=s.dtype),
                                           lower=True)
    a_w = li @ ((g_a + g_a.T) / 2) @ li.T
    # numerically-null basis directions (e.g. the zero P block on the first
    # sweep) would yield spurious ~0 Ritz values: push them to the top so
    # the nev-smallest selection never picks them
    big = jnp.asarray(1e30, s.dtype)
    pen = jnp.where(null, big, 0.0)
    a_w = a_w + jnp.diag(pen)
    mask2d = jnp.logical_or(null[:, None], null[None, :])
    a_w = jnp.where(jnp.logical_and(mask2d,
                                    ~jnp.eye(k, dtype=bool)), 0.0, a_w)
    theta, y_w = jnp.linalg.eigh((a_w + a_w.T) / 2)
    y = li.T @ y_w
    # zero out any selected null direction's coefficients (paranoia)
    y = jnp.where(null[:, None], 0.0, y)
    return theta[:nev], y[:, :nev]


def lobpcg(op: Operator, x0: jax.Array, *, prec: Operator | None = None,
           which: str = "SM", tol: float = 1e-6, maxiter: int = 200,
           comm: Comm | None = None) -> EigenResult:
    """Compute the ``nev = x0.shape[1]`` smallest ("SM") or largest ("LM")
    eigenpairs of the symmetric operator ``op``."""
    comm = comm or SerialComm()
    M = prec or identity_prec
    n, nev = x0.shape
    sign = 1.0 if which == "SM" else -1.0
    a = (lambda v: op(v)) if which == "SM" else (lambda v: -op(v))

    x, _, _ = cholqr2(comm, x0)
    ax = a(x)
    theta, y = _rayleigh_ritz(comm, x, ax, nev)
    x = x @ y
    ax = ax @ y
    p = jnp.zeros_like(x)

    def resnorms(x, ax, theta):
        r = ax - x * theta[None, :]
        return jnp.sqrt(comm.psum(jnp.einsum("nk,nk->k", r, r)))

    def cond(st):
        x, ax, p, theta, k, rn = st
        return jnp.logical_and(k < maxiter, jnp.any(rn > tol))

    def body(st):
        x, ax, p, theta, k, rn = st
        r = ax - x * theta[None, :]
        w = M(r)
        w, _, _ = cholqr2(comm, w)
        p_n, _, _ = cholqr2(comm, p)
        use_p = k > 0
        s = jnp.concatenate(
            [x, w, jnp.where(use_p, p_n, jnp.zeros_like(p_n))], axis=1)
        a_s = jnp.concatenate([ax, a(w),
                               jnp.where(use_p, a(p_n),
                                         jnp.zeros_like(p_n))], axis=1)
        theta_new, y = _rayleigh_ritz(comm, s, a_s, nev)
        x_new = s @ y
        ax_new = a_s @ y
        # p = component of the update outside current x
        p_new = s[:, nev:] @ y[nev:, :]
        rn_new = resnorms(x_new, ax_new, theta_new)
        return x_new, ax_new, p_new, theta_new, k + 1, rn_new

    st = (x, ax, p, theta, 0, resnorms(x, ax, theta))
    x, ax, p, theta, k, rn = lax.while_loop(cond, body, st)
    return EigenResult(eigenvalues=sign * theta, eigenvectors=x, iters=k,
                       resnorms=rn)


def power_method(op: Operator, v0: jax.Array, *, maxiter: int = 100,
                 tol: float = 1e-8, comm: Comm | None = None):
    """Largest-|λ| eigenpair (the reference uses this inside Chebyshev,
    Ifpack2_Details_Chebyshev_def.hpp powerMethod)."""
    comm = comm or SerialComm()

    def norm(v):
        return jnp.sqrt(comm.psum(jnp.vdot(v, v)))

    def body(st):
        v, lam, k, delta = st
        w = op(v)
        lam_new = norm(w)
        v_new = w / jnp.maximum(lam_new, 1e-300)
        return v_new, lam_new, k + 1, jnp.abs(lam_new - lam)

    def cond(st):
        v, lam, k, delta = st
        return jnp.logical_and(k < maxiter, delta > tol * jnp.abs(lam))

    v = v0 / norm(v0)
    v, lam, k, _ = lax.while_loop(cond, body, (v, 1.0 * norm(v0), 0,
                                               jnp.asarray(jnp.inf,
                                                           v0.dtype)))
    return lam, v, k
