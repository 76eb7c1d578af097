"""Generalized eigenproblem (A x = λ M x) tests.

VERDICT r3 #5: LOBPCG / TraceMin / Block Krylov-Schur accept an SPD mass
operator, validated against scipy.sparse.linalg.eigsh(A, M=M) on an FE
stiffness/mass pair (fem/assembly.py), serial and distributed
(packages/anasazi/src/AnasaziBasicEigenproblem.hpp:60 setM).
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from trilinos_tpu import fem
from trilinos_tpu.eigen import (block_davidson, block_krylov_schur,
                                generalized_davidson, lobpcg, tracemin)
from trilinos_tpu.fem.mesh import structured_tri_mesh
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops import matvec as S


@pytest.fixture(scope="module")
def fe_pencil():
    """Dirichlet-interior FE stiffness/mass pair on a triangulated unit
    square (the canonical Laplace eigenproblem -Δu = λ u, u|∂Ω = 0)."""
    from trilinos_tpu.fem.assembly import mass_matrix, stiffness_matrix

    mesh = structured_tri_mesh(9, 9)
    k, conn, xy = stiffness_matrix(mesh)
    m, _, _ = mass_matrix(mesh)
    interior = np.nonzero(
        (xy[:, 0] > 1e-12) & (xy[:, 0] < 1 - 1e-12)
        & (xy[:, 1] > 1e-12) & (xy[:, 1] < 1 - 1e-12))[0]
    k_sp = sp.csr_matrix((k.vals, k.cols, k.row_ptr), shape=k.shape)
    m_sp = sp.csr_matrix((m.vals, m.cols, m.row_ptr), shape=m.shape)
    k_i = k_sp[np.ix_(interior, interior)].tocsr()
    m_i = m_sp[np.ix_(interior, interior)].tocsr()
    ka = F.CsrHost(k_i.indptr.astype(np.int64), k_i.indices,
                   k_i.data, k_i.shape)
    ma = F.CsrHost(m_i.indptr.astype(np.int64), m_i.indices,
                   m_i.data, m_i.shape)
    nev = 4
    w_ref = spla.eigsh(k_i, k=nev, M=m_i, sigma=0, which="LM",
                       return_eigenvectors=False)
    return ka, ma, np.sort(w_ref)


def padded_ops(ka, ma):
    """ELL operators with identity padding ZEROED: the pad subspace must
    be (A=0, M=0)-invariant, not a spurious λ=1 pencil branch."""
    import dataclasses

    n = ka.shape[0]
    kd, md = F.csr_to_ell(ka), F.csr_to_ell(ma)
    npad = kd.n_rows_pad
    mask = (jnp.arange(npad) < n)[:, None]
    kd = dataclasses.replace(kd, vals=kd.vals * mask.astype(kd.vals.dtype))
    md = dataclasses.replace(md, vals=md.vals * mask.astype(md.vals.dtype))
    return (lambda x: S.spmv(kd, x)), (lambda x: S.spmv(md, x)), n, npad


class TestSerialGeneralized:
    def test_lobpcg_generalized(self, fe_pencil, rng):
        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        x0 = np.zeros((npad, 4))
        x0[:n] = rng.standard_normal((n, 4))
        res = lobpcg(op, jnp.asarray(x0), m=mop, which="SM", tol=1e-9,
                     maxiter=300)
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)

    def test_lobpcg_standard_unchanged(self, fe_pencil, rng):
        """m=None must reproduce the standard eigenvalues of K alone."""
        ka, _, _ = fe_pencil
        op, _, n, npad = padded_ops(ka, ka)
        x0 = np.zeros((npad, 3))
        x0[:n] = rng.standard_normal((n, 3))
        res = lobpcg(op, jnp.asarray(x0), which="SM", tol=1e-9,
                     maxiter=300)
        k_sp = sp.csr_matrix((ka.vals, ka.cols, ka.row_ptr),
                             shape=ka.shape)
        w_ref = np.sort(spla.eigsh(k_sp, k=3, sigma=0, which="LM",
                                   return_eigenvectors=False))
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)

    def test_tracemin_generalized(self, fe_pencil):
        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        res = tracemin(op, npad, 4, m=mop, inner_iters=40, tol=1e-8,
                       maxiter=200)
        np.testing.assert_allclose(np.sort(res.eigenvalues), w_ref,
                                   rtol=1e-6)

    def test_krylov_schur_generalized(self, fe_pencil):
        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        # SM of the pencil via the M-inner-product Lanczos on M^-1 K
        res = block_krylov_schur(op, npad, 4, which="SM", symmetric=True,
                                 tol=1e-8, mass=mop, m_solve_iters=60)
        np.testing.assert_allclose(
            np.sort(np.real(res.eigenvalues)), w_ref, rtol=1e-5)

    def test_block_davidson_generalized(self, fe_pencil, rng):
        """Block Davidson on the pencil: M-orthonormal search space →
        standard projected problem (AnasaziBlockDavidson setM)."""
        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        v0 = np.zeros((npad, 4))
        v0[:n] = rng.standard_normal((n, 4))
        res = block_davidson(op, npad, 4, which="SA", tol=1e-8,
                             maxiter=300, v0=jnp.asarray(v0), m=mop)
        assert res.converged
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)
        # pencil residual of the returned pairs
        x = jnp.asarray(res.eigenvectors)
        lam = np.asarray(res.eigenvalues)
        r = np.asarray(op(x)) - lam[None, :] * np.asarray(mop(x))
        assert np.linalg.norm(r, axis=0).max() < 1e-6

    def test_block_davidson_standard_unchanged(self, fe_pencil, rng):
        """m=None must reproduce the standard eigenvalues of K alone."""
        ka, _, _ = fe_pencil
        op, _, n, npad = padded_ops(ka, ka)
        v0 = np.zeros((npad, 3))
        v0[:n] = rng.standard_normal((n, 3))
        res = block_davidson(op, npad, 3, which="SA", tol=1e-9,
                             maxiter=300, v0=jnp.asarray(v0))
        k_sp = sp.csr_matrix((ka.vals, ka.cols, ka.row_ptr),
                             shape=ka.shape)
        w_ref = np.sort(spla.eigsh(k_sp, k=3, sigma=0, which="LM",
                                   return_eigenvectors=False))
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)

    def test_generalized_davidson_pencil(self, fe_pencil, rng):
        """GeneralizedDavidson (the Anasazi solver DESIGNED for pencils,
        AnasaziGeneralizedDavidson.hpp QZ path) — here the M-orthonormal
        space reduces the projected pencil to a standard Schur problem;
        the SPD pencil's smallest-real eigenvalues must match eigsh."""
        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        v0 = np.zeros((npad, 4))
        v0[:n] = rng.standard_normal((n, 4))
        res = generalized_davidson(op, npad, 4, which="SR", tol=1e-8,
                                   maxiter=300, v0=jnp.asarray(v0), m=mop)
        assert res.converged
        vals = np.sort(np.real(np.asarray(res.eigenvalues)))[:4]
        np.testing.assert_allclose(vals, w_ref, rtol=1e-6)

    def test_rtr_generalized(self, fe_pencil, rng):
        """RTR on the pencil: M-orthonormal iterates + M-weighted
        tangent projector (AnasaziRTRBase's B-operator support)."""
        from trilinos_tpu.eigen import rtr

        ka, ma, w_ref = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        v0 = np.zeros((npad, 4))
        v0[:n] = rng.standard_normal((n, 4))
        res = rtr(op, npad, 4, tol=1e-8, maxiter=200,
                  v0=jnp.asarray(v0), m=mop)
        assert res.converged
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)

    def test_small_norm_mass_scaling(self, fe_pencil, rng):
        """‖M‖ ≪ 1 (fine-mesh FE mass diagonals scale like h²): the
        Gram floors must scale with the Gram, not with eps — an
        absolute floor swamps the projector/whitening and corrupts
        results (round-5 review finding on rtr.small_chol_solve)."""
        from trilinos_tpu.eigen import rtr

        ka, ma, w_ref = fe_pencil
        scale = 1e-6
        ma2 = F.CsrHost(ma.row_ptr, ma.cols, ma.vals * scale, ma.shape)
        op, mop, n, npad = padded_ops(ka, ma2)
        v0 = np.zeros((npad, 4))
        v0[:n] = rng.standard_normal((n, 4))
        res = rtr(op, npad, 4, tol=1e-8, maxiter=200,
                  v0=jnp.asarray(v0), m=mop)
        assert res.converged
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref / scale, rtol=1e-6)
        res_bd = block_davidson(op, npad, 4, which="SA", tol=1e-8,
                                maxiter=300, v0=jnp.asarray(v0), m=mop)
        assert res_bd.converged
        np.testing.assert_allclose(
            np.sort(np.asarray(res_bd.eigenvalues)), w_ref / scale,
            rtol=1e-6)

    def test_eigvec_pencil_residual(self, fe_pencil, rng):
        """‖K x − λ M x‖ small for every returned pair (LOBPCG)."""
        ka, ma, _ = fe_pencil
        op, mop, n, npad = padded_ops(ka, ma)
        x0 = np.zeros((npad, 3))
        x0[:n] = rng.standard_normal((n, 3))
        res = lobpcg(op, jnp.asarray(x0), m=mop, which="SM", tol=1e-9,
                     maxiter=300)
        x = np.asarray(res.eigenvectors)
        lam = np.asarray(res.eigenvalues)
        r = np.asarray(op(jnp.asarray(x))) - lam[None, :] * np.asarray(
            mop(jnp.asarray(x)))
        assert np.linalg.norm(r, axis=0).max() < 1e-6


class TestDistributedGeneralized:
    def test_dist_lobpcg_generalized(self, fe_pencil, rng):
        from trilinos_tpu.parallel import distmatrix as D
        from trilinos_tpu.parallel import driver as drv

        ka, ma, w_ref = fe_pencil
        n_shards = 4
        dm_k = D.distribute(ka, n_shards, fmt="ell")
        dm_m = D.distribute(ma, n_shards, fmt="ell",
                            rmap=dm_k.row_map)
        mesh = drv.make_mesh(n_shards)
        res = drv.dist_eigsolve(lobpcg, dm_k, 4, mesh=mesh,
                                mass_matrix=dm_m, which="SM", tol=1e-9,
                                maxiter=300)
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)

    def test_dist_block_davidson_generalized(self, fe_pencil):
        from trilinos_tpu.parallel import distmatrix as D
        from trilinos_tpu.parallel import driver as drv

        ka, ma, w_ref = fe_pencil
        n_shards = 4
        dm_k = D.distribute(ka, n_shards, fmt="ell")
        dm_m = D.distribute(ma, n_shards, fmt="ell", rmap=dm_k.row_map)
        mesh = drv.make_mesh(n_shards)
        res = drv.dist_eigsolve(block_davidson, dm_k, 4, mesh=mesh,
                                mass_matrix=dm_m, which="SA", tol=1e-8,
                                maxiter=300)
        assert res.converged
        np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                                   w_ref, rtol=1e-6)
