"""Anasazi-style eigensolver factory.

Reference: Anasazi::Factory creates a SolverManager from a name +
ParameterList (packages/anasazi/src/AnasaziFactory.hpp);
Anasazi::BasicEigenproblem holds op/nev/symmetry/initvec
(AnasaziBasicEigenproblem.hpp); sorting via "Which" ∈ LM/SM/LR/SR
(AnasaziBasicSort.hpp). Test sizes keep n a multiple of 8 so the ELL pad
adds no rows (a spurious zero eigenvalue would otherwise pollute SM/SA
sorts — the distributed driver `dist_eigsolve` zeroes v0 pad rows for the
same reason).
"""
import numpy as np
import pytest

from trilinos_tpu.eigen import (EigenProblem, create_eigensolver,
                                eigensolver_names)
from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops.matvec import spmv


def make_problem(nx=16, ny=8, nev=3, **kw):
    a = laplace2d(nx, ny)
    dev = F.csr_to_ell(a)
    assert dev.n_rows_pad == a.shape[0]
    op = lambda v: spmv(dev, v)
    w = np.linalg.eigvalsh(a.to_dense())
    return EigenProblem(op=op, n=a.shape[0], nev=nev, **kw), w


def got_sorted(res, nev):
    return np.sort(np.real(np.asarray(res.eigenvalues))[:nev])


def test_names_and_unknown():
    assert "LOBPCG" in eigensolver_names()
    with pytest.raises(ValueError, match="unknown eigensolver"):
        create_eigensolver("NOT A SOLVER")


def test_bks_largest():
    prob, w = make_problem()
    mgr = create_eigensolver("Block Krylov Schur",
                             {"Which": "LM", "Convergence Tolerance": 1e-9})
    res = mgr.solve(prob)
    assert bool(res.converged)
    np.testing.assert_allclose(got_sorted(res, 3), np.sort(w[::-1][:3]),
                               rtol=1e-8)


def test_lobpcg_smallest_with_prec():
    prob, w = make_problem()
    prob.prec = lambda v: 0.25 * v  # Jacobi for the 5-point stencil
    mgr = create_eigensolver(
        "LOBPCG", {"Which": "SR", "Convergence Tolerance": 1e-9,
                   "Maximum Iterations": 300})
    res = mgr.solve(prob)
    np.testing.assert_allclose(got_sorted(res, 3), w[:3], rtol=1e-7)


def test_block_davidson_sa():
    prob, w = make_problem()
    mgr = create_eigensolver("BLOCK_DAVIDSON",
                             {"Which": "SR", "Maximum Iterations": 200})
    res = mgr.solve(prob)
    np.testing.assert_allclose(got_sorted(res, 3), w[:3], rtol=1e-6)


def test_tracemin_and_rtr():
    prob, w = make_problem(nev=2)
    for name in ("TraceMin", "RTR"):
        res = create_eigensolver(name, {"Maximum Iterations": 150}).solve(
            prob)
        np.testing.assert_allclose(got_sorted(res, 2), w[:2], rtol=1e-6)


def test_generalized_davidson_nonsymmetric():
    """Upwind convection-diffusion (nonsymmetric) — LR eigenvalues."""
    from trilinos_tpu.galeri import uniflow2d

    a = uniflow2d(8, 8, conv=1.0, diff=0.1)
    dev = F.csr_to_ell(a)
    n = dev.n_rows_pad
    op = lambda v: spmv(dev, v)
    w = np.linalg.eigvals(a.to_dense())
    # pad rows (if any) are zero rows: exclude |λ|≈0 from the comparison
    prob = EigenProblem(op=op, n=n, nev=2, symmetric=False)
    mgr = create_eigensolver("Generalized Davidson",
                             {"Which": "LM", "Maximum Iterations": 300,
                              "Convergence Tolerance": 1e-8})
    res = mgr.solve(prob)
    got = np.sort(np.abs(np.asarray(res.eigenvalues))[:2])
    want = np.sort(np.abs(w))[::-1][:2]
    np.testing.assert_allclose(got, np.sort(want), rtol=1e-6)


def test_power_and_lanczos():
    prob, w = make_problem(nev=2)
    res = create_eigensolver("POWER", {"Maximum Iterations": 800,
                                       "Convergence Tolerance": 1e-10}
                             ).solve(prob)
    lam = res[0] if isinstance(res, tuple) else res.eigenvalues
    np.testing.assert_allclose(float(np.max(np.real(np.asarray(lam)))),
                               w[-1], rtol=1e-5)
    res2 = create_eigensolver("LANCZOS", {"Which": "LM",
                                          "Num Blocks": 80}).solve(prob)
    lam2 = res2[0] if isinstance(res2, tuple) else res2.eigenvalues
    got = np.sort(np.real(np.asarray(lam2)))[-2:]
    np.testing.assert_allclose(got, w[-2:], rtol=1e-6)


def test_factory_over_distributed_operator():
    """The factory composes with the global-view distributed operator —
    string-driven eigensolves on a sharded matrix (Anasazi SolMgr over a
    distributed Tpetra operator)."""
    from trilinos_tpu.parallel import distmatrix as D
    from trilinos_tpu.parallel import driver as drv

    p = 4
    a = laplace2d(16, 8)
    dm = D.distribute(a, p)
    assert dm.row_map.n_global_pad == a.shape[0]
    mesh = drv.make_mesh(p)
    op = drv.global_operator(dm, mesh)
    w = np.linalg.eigvalsh(a.to_dense())
    prob = EigenProblem(op=op, n=a.shape[0], nev=3)
    mgr = create_eigensolver("BKS", {"Which": "LM",
                                     "Convergence Tolerance": 1e-9})
    res = mgr.solve(prob)
    np.testing.assert_allclose(got_sorted(res, 3), np.sort(w[::-1][:3]),
                               rtol=1e-8)


def test_mass_matrix_rejected_for_standard_only_kinds():
    """Kinds that do not honor EigenProblem.m must raise instead of
    silently returning standard-problem eigenpairs for Ax = lambda Mx."""
    prob, _ = make_problem(m=lambda v: 2.0 * v)
    for name in ("Lanczos",):
        mgr = create_eigensolver(name)
        with pytest.raises(ValueError, match="mass"):
            mgr.solve(prob)


def test_mass_matrix_accepted_by_davidson_kinds():
    """Block/Generalized Davidson honor EigenProblem.m (round 5): the
    pencil A x = λ (2I) x has halved eigenvalues."""
    prob, w_a = make_problem(m=lambda v: 2.0 * v)
    w = w_a / 2.0
    for name, which in (("Block Davidson", "SA"),
                        ("Generalized Davidson", "SR")):
        mgr = create_eigensolver(name, {"Which": which,
                                        "Convergence Tolerance": 1e-9})
        res = mgr.solve(prob)
        got = np.sort(np.real(np.asarray(res.eigenvalues)))[:prob.nev]
        np.testing.assert_allclose(got, np.sort(w)[:prob.nev], rtol=1e-7)


def test_dist_eigsolve_rejects_mass_for_unsupported():
    """dist_eigsolve(mass_matrix=...) must not bind the mass operator to
    an unrelated 'm' kwarg (lanczos_eigs's integer basis length)."""
    import jax.numpy as jnp

    from trilinos_tpu.eigen import lanczos_eigs
    from trilinos_tpu.parallel import distmatrix as D
    from trilinos_tpu.parallel import driver as drv

    a = laplace2d(16, 8)
    dm = D.distribute(a, 4)
    mesh = drv.make_mesh(4)
    with pytest.raises(ValueError, match="mass"):
        drv.dist_eigsolve(lanczos_eigs, dm, 2, mesh=mesh,
                          mass_matrix=dm, dtype=np.float64)


def test_block_davidson_locking():
    """"Use Locking" (AnasaziBlockDavidsonSolMgr.hpp:153-157): converged
    pairs freeze in a locked prefix; results match the unlocked solve
    and scipy."""
    import jax.numpy as jnp

    from trilinos_tpu.eigen import block_davidson

    prob, w = make_problem(nev=4)
    res = block_davidson(prob.op, prob.n, 4, which="SA", tol=1e-9,
                         maxiter=300, locking=True)
    assert res.converged
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                               np.sort(w)[:4], rtol=1e-8)
    # eigenvector residuals (locked pairs included) honor the tolerance
    x = jnp.asarray(res.eigenvectors)
    lam = np.asarray(res.eigenvalues)
    r = np.asarray(prob.op(x)) - np.asarray(x) * lam[None, :]
    assert np.linalg.norm(r, axis=0).max() <= 1e-7

    # factory surface
    mgr = create_eigensolver("Block Davidson",
                             {"Which": "SA", "Use Locking": True,
                              "Convergence Tolerance": 1e-9})
    res2 = mgr.solve(prob)
    np.testing.assert_allclose(np.sort(np.asarray(res2.eigenvalues)),
                               np.sort(w)[:prob.nev], rtol=1e-8)


def test_block_davidson_locking_generalized():
    """Locking composes with the mass-matrix pencil path."""
    from trilinos_tpu.eigen import block_davidson

    prob, w = make_problem(nev=3, m=lambda v: 2.0 * v)
    res = block_davidson(prob.op, prob.n, 3, which="SA", tol=1e-9,
                         maxiter=300, m=prob.m, locking=True)
    assert res.converged
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                               np.sort(w / 2.0)[:3], rtol=1e-8)


def test_block_davidson_locking_la():
    from trilinos_tpu.eigen import block_davidson

    prob, w = make_problem(nev=3)
    res = block_davidson(prob.op, prob.n, 3, which="LA", tol=1e-9,
                         maxiter=300, locking=True, max_locked=2)
    assert res.converged
    np.testing.assert_allclose(np.sort(np.asarray(res.eigenvalues)),
                               np.sort(w)[-3:], rtol=1e-8)
