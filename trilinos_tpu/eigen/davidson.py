"""Block Davidson eigensolver (symmetric, preconditioned).

TPU-native analogue of Anasazi::BlockDavidson
(packages/anasazi/src/AnasaziBlockDavidsonSolMgr.hpp,
AnasaziBlockDavidson.hpp): expand a search space with PRECONDITIONED
residual blocks, Rayleigh-Ritz on the space, restart with the leading
Ritz block when the space is full.

Structure: the per-step device work (Rayleigh-Ritz projection, residual,
preconditioner apply, CGS2+CholQR2 orthogonalization of the new block)
is jitted per active-space size k (a handful of distinct k values, cached
across restarts); the O(k^3) eigh of the projected matrix runs on device
(small), the expansion bookkeeping on host — the MultiVec/LAPACK split of
the reference.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.comm import Comm, SerialComm
from ..solvers.base import Operator, hi_precision
from ..solvers.ortho import cgs2_project, cholqr2
from .krylov_schur import (EigsResult, _expansion_quality,
                           _filter_rescale_block, _mcholqr2,
                           _mortho_block)


@hi_precision
def block_davidson(op: Operator, n: int, nev: int, *, nb: int | None = None,
                   smax: int | None = None, prec=None, which: str = "SA",
                   tol: float = 1e-8, maxiter: int = 200,
                   v0: jax.Array | None = None, comm: Comm | None = None,
                   dtype=jnp.float64, m=None) -> EigsResult:
    """``nev`` extreme eigenpairs of a SYMMETRIC operator.

    which: SA (smallest algebraic, the Davidson sweet spot with an SPD
    preconditioner) or LA. ``prec`` approximates (A - sigma I)^-1 — any
    preconditioner apply works.

    ``m``: optional SPD mass operator → GENERALIZED pencil A x = λ M x
    (AnasaziBasicEigenproblem.hpp:60 setM; BlockDavidson is written for
    pencils). The search space is kept M-orthonormal (SᵀMS = I) so the
    Rayleigh-Ritz projection stays a STANDARD symmetric eigenproblem;
    residuals are r = A x − (M x) θ. No M-solve is needed — Davidson
    expansion is preconditioned residuals, not a Krylov space of M⁻¹A.
    """
    comm = comm or SerialComm()
    nb = nb or nev
    smax = smax or max(4 * nev, 6 * nb)
    smax = min((smax // nb) * nb, (n // nb) * nb)
    prec = prec or (lambda r: r)
    mass = m
    rng = np.random.default_rng(7)

    def _whitened_eigh(kmat, s, ms_):
        """Rayleigh-Ritz against the MEASURED M-Gram (whitened pencil):
        G = SᵀMS, K̃ = L⁻¹ K L⁻ᵀ with G = LLᵀ, z = L⁻ᵀ z̃. With an exact
        G this is plain eigh; with the f32 drift the basis accumulates
        (M-orthonormality error compounds across restarts), it keeps the
        REPORTED Ritz values exact for the actual space — basis drift
        then costs efficiency, never accuracy (the SVQB-style whitening
        tracemin.py already uses). mass=None → G = I exactly."""
        k = kmat.shape[0]
        if mass is None:
            return jnp.linalg.eigh(kmat)
        gmat = comm.psum(s[:, :k].T @ ms_[:, :k])
        gmat = (gmat + gmat.T) / 2
        eps = jnp.finfo(kmat.dtype).eps
        gmat = gmat + (10 * eps) * (jnp.trace(gmat) / k) * jnp.eye(
            k, dtype=gmat.dtype)
        l = jnp.linalg.cholesky(gmat)
        y = lax.linalg.triangular_solve(l, kmat, left_side=True,
                                        lower=True)
        hw = lax.linalg.triangular_solve(l, y.T, left_side=True,
                                         lower=True).T
        theta, zt = jnp.linalg.eigh((hw + hw.T) / 2)
        z = lax.linalg.triangular_solve(l, zt, left_side=True,
                                        lower=True, transpose_a=True)
        return theta, z

    @functools.lru_cache(maxsize=None)
    def make_step(k):
        @jax.jit
        def step(s, as_, ms_):
            kmat = comm.psum(s[:, :k].T @ as_[:, :k])
            kmat = (kmat + kmat.T) / 2
            theta, z = _whitened_eigh(kmat, s, ms_)  # ascending
            if which == "SA":
                zsel = z[:, :nev]
                tsel = theta[:nev]
                zblk = z[:, :nb]
                tblk = theta[:nb]
            else:  # LA
                zsel = z[:, k - nev:][:, ::-1]
                tsel = theta[k - nev:][::-1]
                zblk = z[:, k - nb:][:, ::-1]
                tblk = theta[k - nb:][::-1]
            x = s[:, :k] @ zsel
            ax = as_[:, :k] @ zsel
            mx = ms_[:, :k] @ zsel if mass is not None else x
            r = ax - mx * tsel[None, :]
            resn = jnp.sqrt(comm.psum(jnp.sum(r * r, axis=0)))
            # expansion block: preconditioned residuals of the leading nb
            xb = (ms_ if mass is not None else s)[:, :k] @ zblk
            rb = as_[:, :k] @ zblk - xb * tblk[None, :]
            t = prec(rb)
            if mass is None:
                t2, _ = cgs2_project(comm, s, t)  # padded basis is fine
                q, _, _ = cholqr2(comm, t2)
                mq = q
                bq = jnp.eye(nb, dtype=q.dtype)
                cmax = jnp.zeros((nb,), q.dtype)
            else:
                # In f32 a near-singular expansion block (converged
                # residuals) defeats M-CholQR — the Gram's rounding
                # noise is the same order as the chol floor — and
                # inserting such a column poisons the projected matrix
                # with spurious Ritz values (observed on chip: λ 30-75×
                # λmax). The host filters/rescales on the quality
                # measures (_select_expansion_columns).
                q, mq = _mortho_block(comm, mass, s, ms_, t)
                bq, cmax = _expansion_quality(comm, q, mq, ms_, k)
            return tsel, x, resn, q, mq, bq, cmax

        return step

    if v0 is None:
        v0 = jnp.asarray(rng.standard_normal((n, nb)), dtype=dtype)
    if mass is None:
        q0, _, _ = cholqr2(comm, v0.astype(dtype))
        mq0 = q0
    else:
        q0, mq0 = _mcholqr2(comm, mass, v0.astype(dtype))
    s = jnp.zeros((n, smax), dtype).at[:, :nb].set(q0)
    as_ = jnp.zeros((n, smax), dtype).at[:, :nb].set(op(q0))
    ms_ = (jnp.zeros((n, smax), dtype).at[:, :nb].set(mq0)
           if mass is not None else s)
    k = nb
    theta = x = resn = None
    converged = False
    iters = 0

    for it in range(maxiter):
        iters = it + 1
        theta, x, resn, q, mq, bq, cmax = make_step(k)(s, as_, ms_)
        scale = np.maximum(np.abs(np.asarray(theta)), 1.0)
        converged = bool((np.asarray(resn) <= tol * scale).all())
        if converged:
            break
        if k + nb > smax:
            # restart: collapse to the leading Ritz block(s). zk has
            # orthonormal columns, so S·zk stays (M-)orthonormal:
            # (S zk)ᵀ M (S zk) = zkᵀ (SᵀMS) zk = zkᵀ zk = I.
            keep = min(max(2 * nev, nb), smax - nb)
            keep = max((keep // nb) * nb, nb)
            kmat = comm.psum(s[:, :k].T @ as_[:, :k])
            kmat = (kmat + kmat.T) / 2
            _, z = _whitened_eigh(kmat, s, ms_)
            zk = z[:, :keep] if which == "SA" else z[:, k - keep:]
            s_new = jnp.zeros_like(s).at[:, :keep].set(s[:, :k] @ zk)
            as_new = jnp.zeros_like(as_).at[:, :keep].set(as_[:, :k] @ zk)
            if mass is not None:
                ms_ = jnp.zeros_like(ms_).at[:, :keep].set(ms_[:, :k] @ zk)
            s, as_ = s_new, as_new
            if mass is None:
                ms_ = s
            k = keep
            continue
        if mass is not None:
            filtered = _filter_rescale_block(q, mq, bq, cmax)
            if filtered is None:
                break  # expansion fully degenerate: honest stagnation
            q, mq = filtered
        g = q.shape[1]
        s = s.at[:, k:k + g].set(q)
        as_ = as_.at[:, k:k + g].set(op(q))
        if mass is not None:
            ms_ = ms_.at[:, k:k + g].set(mq)
        else:
            ms_ = s
        k += g

    return EigsResult(
        eigenvalues=np.asarray(theta), eigenvectors=np.asarray(x),
        resnorms=np.asarray(resn), iters=iters, converged=converged)
