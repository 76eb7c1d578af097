"""Generalized Davidson eigensolver (nonsymmetric, preconditioned).

TPU-native analogue of Anasazi::GeneralizedDavidson
(packages/anasazi/src/AnasaziGeneralizedDavidsonSolMgr.hpp,
AnasaziGeneralizedDavidson.hpp): expand a search space with
preconditioned residual blocks, project the NONSYMMETRIC operator onto
it, extract the wanted invariant subspace via a SORTED REAL SCHUR
factorization of the small projected matrix (all-real arithmetic —
complex conjugate pairs stay as 2×2 blocks, exactly the reference's
LAPACK xGEES path), restart by collapsing onto that subspace.

Split: the n-sized work (basis matvecs, projections, CGS2+CholQR2
orthogonalization) is jitted device code; the k×k Schur sort runs in
scipy on host — the MultiVec/LAPACK split of the reference.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.comm import Comm, SerialComm
from ..solvers.base import Operator
from ..solvers.ortho import cgs2_project, cholqr2
from .krylov_schur import EigsResult


def _schur_select(h: np.ndarray, nsel: int, which: str):
    """Sorted real Schur of the projected matrix: returns (t, z, vals)
    with the ``nsel`` wanted eigenvalues leading (conjugate pairs kept
    whole, so the actual leading block may be nsel+1 wide)."""
    import scipy.linalg as sla

    t, z = sla.schur(h, output="real")
    vals = sla.eigvals(t)
    key = {
        "LM": lambda w: -np.abs(w),
        "SM": lambda w: np.abs(w),
        "LR": lambda w: -w.real,
        "SR": lambda w: w.real,
    }[which](vals)
    order = np.argsort(key, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    # bubble wanted eigenvalues to the front by swapping adjacent Schur
    # blocks (trexc-style, via scipy's ordered schur re-sort)
    sel = rank < nsel
    # keep conjugate pairs together: a 2x2 block is selected if either
    # of its eigenvalues is
    t, z, sdim = sla.schur(h, output="real",
                           sort=lambda wr, wi: bool(
                               sel[np.argmin(np.abs(vals - (wr + 1j * wi)))]))
    vals_sorted = sla.eigvals(t)
    return t, z, vals_sorted, max(int(sdim), 1)


def generalized_davidson(op: Operator, n: int, nev: int, *,
                         nb: int | None = None, smax: int | None = None,
                         prec=None, which: str = "LM", tol: float = 1e-8,
                         maxiter: int = 200, v0: jax.Array | None = None,
                         comm: Comm | None = None,
                         dtype=jnp.float64) -> EigsResult:
    """``nev`` eigenvalues of a general (nonsymmetric) real operator.

    which: LM/SM/LR/SR (largest/smallest magnitude, largest/smallest real
    part). Eigenvalues are returned as a complex array; ``eigenvectors``
    spans the real invariant subspace (columns pair up for complex
    conjugate eigenvalues, the reference's real-Schur convention).
    """
    comm = comm or SerialComm()
    nb = nb or nev
    smax = smax or max(4 * nev, 6 * nb)
    smax = min(smax, (n // nb) * nb)
    prec = prec or (lambda r: r)
    rng = np.random.default_rng(13)

    @functools.lru_cache(maxsize=None)
    def proj_fn(k):
        @jax.jit
        def proj(s, as_):
            return comm.psum(s[:, :k].T @ as_[:, :k])
        return proj

    @functools.lru_cache(maxsize=None)
    def resid_fn(k, m):
        @jax.jit
        def resid(s, as_, z, tmm):
            x = s[:, :k] @ z
            ax = as_[:, :k] @ z
            r = ax - x @ tmm
            resn = jnp.sqrt(comm.psum(jnp.sum(r * r, axis=0)))
            return x, r, resn
        return resid

    @functools.lru_cache(maxsize=None)
    def expand_fn(k):
        @jax.jit
        def expand(s, t):
            t2, _ = cgs2_project(comm, s, t)
            q, _, _ = cholqr2(comm, t2)
            return q
        return expand

    if v0 is None:
        v0 = jnp.asarray(rng.standard_normal((n, nb)), dtype=dtype)
    q0, _, _ = cholqr2(comm, v0.astype(dtype))
    s = jnp.zeros((n, smax), dtype).at[:, :nb].set(q0)
    as_ = jnp.zeros((n, smax), dtype).at[:, :nb].set(op(q0))
    k = nb
    vals = x = resn = None
    converged = False
    iters = 0

    for it in range(maxiter):
        iters = it + 1
        h = np.asarray(proj_fn(k)(s, as_))
        t, z, w, m = _schur_select(h, nev, which)
        m = min(m, k)
        zsel = jnp.asarray(z[:, :m], dtype=dtype)
        tmm = jnp.asarray(t[:m, :m], dtype=dtype)
        x, r, resn = resid_fn(k, m)(s, as_, zsel, tmm)
        vals = w[:m]
        scale = np.maximum(np.abs(np.asarray(vals)), 1.0)
        converged = bool(
            (np.asarray(resn)[:min(nev, m)] <= tol * scale[:min(nev, m)])
            .all())
        if converged:
            break
        if k + nb > smax:
            # restart: collapse onto the leading sorted Schur basis
            keep = min(max(2 * nev, nb), smax - nb, k)
            zk = jnp.asarray(z[:, :keep], dtype=dtype)
            s = jnp.zeros_like(s).at[:, :keep].set(s[:, :k] @ zk)
            as_ = jnp.zeros_like(as_).at[:, :keep].set(as_[:, :k] @ zk)
            k = keep
            continue
        # expansion: preconditioned residual block of the leading
        # min(nb, m) directions
        blk = r[:, : min(nb, m)]
        if blk.shape[1] < nb:
            blk = jnp.concatenate(
                [blk, jnp.asarray(rng.standard_normal(
                    (n, nb - blk.shape[1])), dtype=dtype)], axis=1)
        q = expand_fn(k)(s, prec(blk))
        s = s.at[:, k:k + nb].set(q)
        as_ = as_.at[:, k:k + nb].set(op(q))
        k += nb

    return EigsResult(
        eigenvalues=np.asarray(vals), eigenvectors=np.asarray(x),
        resnorms=np.asarray(resn), iters=iters, converged=converged)
