"""Distributed eigensolvers via the global-view driver.

The reference's Anasazi solvers are MPI-distributed through MultiVecTraits
over Tpetra MultiVectors (packages/anasazi/src/AnasaziBlockKrylovSchurSolMgr.hpp,
adapters in anasazi/tpetra/src/AnasaziTpetraAdapter.hpp). Here
``dist_eigsolve`` runs the SAME eigensolver bodies on row-sharded global
arrays: the operator is one jitted shard_map apply, and GSPMD partitions
every solver-side reduction. Pad rows are zero and v0 pad rows are zeroed,
so the computed spectrum is exactly the unpadded matrix's.
"""
import numpy as np
import pytest

from trilinos_tpu.eigen import (block_davidson, block_krylov_schur, lobpcg,
                                tracemin)
from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv


def dense_eigs(a, nev, which="SM"):
    w = np.linalg.eigvalsh(a.to_dense())
    return w[:nev] if which == "SM" else w[::-1][:nev]


@pytest.mark.parametrize("p", [4, 8])
def test_dist_lobpcg_smallest(p):
    a = laplace2d(12, 10)  # n=120; p=8 exercises padding (120/8=15 rows)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    res = drv.dist_eigsolve(lobpcg, dm, 4, mesh=mesh, which="SM",
                            tol=1e-9, maxiter=300)
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                               dense_eigs(a, 4), rtol=1e-7)
    # eigenvectors live in the padded global layout; residual check on host
    x = dm.row_map.from_padded(np.asarray(res.eigenvectors))
    lam = np.asarray(res.eigenvalues)
    r = a.to_dense() @ x - x * lam[None, :]
    assert np.linalg.norm(r) < 1e-6


def test_dist_lobpcg_matches_serial():
    """Same algorithm, same v0 → same iterates as the serial solver."""
    import jax.numpy as jnp

    from trilinos_tpu.ops import formats as F
    from trilinos_tpu.ops.matvec import spmv

    p = 4
    a = laplace2d(10, 10)
    n = a.shape[0]
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    rng = np.random.default_rng(3)
    v0 = rng.standard_normal((n, 3))
    res = drv.dist_eigsolve(lobpcg, dm, 3, mesh=mesh, v0=v0, which="SM",
                            tol=1e-9, maxiter=200)

    dev = F.csr_to_ell(a)
    v0p = np.zeros((dev.n_rows_pad, 3))
    v0p[:n] = v0
    res_s = lobpcg(lambda v: spmv(dev, v), jnp.asarray(v0p), which="SM",
                   tol=1e-9, maxiter=200)
    # sharded psum reorders the f64 sums vs the serial reduction, so the
    # trajectories differ at roundoff — iteration counts may differ by ±1
    assert abs(int(res.iters) - int(res_s.iters)) <= 2
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               np.asarray(res_s.eigenvalues), rtol=1e-9)


def test_dist_block_krylov_schur_largest():
    """Host-orchestrated restarts (ordschur on the projected H) over the
    sharded basis: eager sharded device steps between host restarts."""
    p = 4
    a = laplace2d(12, 10)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    res = drv.dist_eigsolve(block_krylov_schur, dm, 4, mesh=mesh,
                            which="LM", symmetric=True, tol=1e-9)
    assert bool(res.converged)
    got = np.sort(np.real(np.asarray(res.eigenvalues)))[::-1]
    np.testing.assert_allclose(got, dense_eigs(a, 4, "LM"), rtol=1e-8)


def test_dist_tracemin_smallest():
    p = 4
    a = laplace2d(10, 8)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    res = drv.dist_eigsolve(tracemin, dm, 3, mesh=mesh, tol=1e-8,
                            maxiter=200)
    got = np.sort(np.asarray(res.eigenvalues)[:3])
    np.testing.assert_allclose(got, dense_eigs(a, 3), rtol=1e-6)


def test_dist_davidson_with_dist_precond():
    """block_davidson + distributed Jacobi preconditioner through
    global_precond — the Anasazi prec-aware path (Ifpack2 prec over the
    same Tpetra operator)."""
    p = 4
    a = laplace2d(12, 8)
    dm = D.distribute(a, p)
    rmap = dm.row_map
    mesh = drv.make_mesh(p)
    prec = drv.dist_jacobi(a, rmap)
    res = drv.dist_eigsolve(block_davidson, dm, 3, mesh=mesh, prec=prec,
                            which="SA", tol=1e-8, maxiter=150)
    got = np.sort(np.asarray(res.eigenvalues)[:3])
    np.testing.assert_allclose(got, dense_eigs(a, 3), rtol=1e-6)
