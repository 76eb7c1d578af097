"""Distributed transpose apply + distributed LSQR.

The reference's CrsMatrix supports ``apply(X, Y, Teuchos::TRANS)`` by
running the local transpose apply and Export-ADDing off-process column
contributions (packages/tpetra/core/src/Tpetra_CrsMatrix_def.hpp, apply →
localApply(CONJ_TRANS) + Export path); Belos::LSQRSolMgr builds on it
(packages/belos/src/BelosLSQRSolMgr.hpp). Here the transpose rides the
same frozen HaloPlan in reverse (export_combine ADD) — no second plan.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv
from trilinos_tpu.solvers.lsqr import lsqr


def nonsym_csr(rng, n, density=0.04):
    """Diagonally dominant but structurally/numerically NONsymmetric."""
    nnz = max(int(n * n * density), n)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    d = np.arange(n)
    return F.CsrHost.from_coo(
        np.concatenate([rows, d]), np.concatenate([cols, d]),
        np.concatenate([vals, 8.0 * np.ones(n)]), (n, n))


@pytest.mark.parametrize("p", [2, 4, 8])  # 8 shards → a2a-mode plan
def test_dist_spmv_t_matches_host(rng, p):
    a = nonsym_csr(rng, 192)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    x = rng.standard_normal(a.shape[0])
    xg = jnp.asarray(dm.row_map.to_padded(x))
    y = drv.dist_spmv_t(dm, xg, mesh)
    y_ref = a.transpose().matvec_host(x)
    np.testing.assert_allclose(dm.row_map.from_padded(np.asarray(y)),
                               y_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("p", [4])
def test_dist_spmv_t_dia_interior_multirhs(rng, p):
    """Banded matrix → DIA interior; multivector (nrhs=3) transpose."""
    a = laplace2d(12, 16)  # symmetric: Aᵀx must equal Ax too
    dm = D.distribute(a, p)
    assert isinstance(dm.interior, F.DiaMatrix)
    mesh = drv.make_mesh(p)
    x = rng.standard_normal((a.shape[0], 3))
    xg = jnp.asarray(np.stack([dm.row_map.to_padded(c) for c in x.T], 1))
    y = drv.dist_spmv_t(dm, xg, mesh)
    y_fwd = drv.dist_spmv(dm, xg, mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fwd),
                               rtol=1e-12, atol=1e-12)
    y_ref = a.transpose().matvec_host(x[:, 1])
    got = dm.row_map.from_padded(np.asarray(y[:, 1]))
    np.testing.assert_allclose(got, y_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("p", [4])
def test_dist_lsqr_converges_and_matches_serial(rng, p):
    a = nonsym_csr(rng, 160)
    n = a.shape[0]
    b = rng.standard_normal(n)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    bg = jnp.asarray(dm.row_map.to_padded(b))
    res = drv.dist_lsqr(dm, bg, mesh=mesh, rtol=1e-10, maxiter=800)
    x = dm.row_map.from_padded(np.asarray(res.x))
    rel = np.linalg.norm(a.matvec_host(x) - b) / np.linalg.norm(b)
    assert bool(res.converged)
    assert rel < 1e-8

    # serial LSQR on the same problem: same algorithm → same iterates
    dev = F.csr_to_ell(a)
    npad = dev.n_rows_pad
    bp = np.zeros(npad)
    bp[:n] = b
    from trilinos_tpu.ops.matvec import spmv

    res_s = lsqr(lambda v: spmv(dev, v), lambda v: spmv(dev, v, True),
                 jnp.asarray(bp), rtol=1e-10, maxiter=800)
    assert int(res.iters) == int(res_s.iters)
    np.testing.assert_allclose(x, np.asarray(res_s.x)[:n],
                               rtol=1e-6, atol=1e-9)


def test_dist_lsqr_damped(rng):
    """Damped least squares: distributed matches the serial recurrence."""
    p = 4
    a = nonsym_csr(rng, 96)
    n = a.shape[0]
    b = rng.standard_normal(n)
    dm = D.distribute(a, p)
    mesh = drv.make_mesh(p)
    bg = jnp.asarray(dm.row_map.to_padded(b))
    res = drv.dist_lsqr(dm, bg, mesh=mesh, rtol=1e-8, maxiter=300,
                        damp=0.5)
    dev = F.csr_to_ell(a)
    bp = np.zeros(dev.n_rows_pad)
    bp[:n] = b
    from trilinos_tpu.ops.matvec import spmv

    res_s = lsqr(lambda v: spmv(dev, v), lambda v: spmv(dev, v, True),
                 jnp.asarray(bp), rtol=1e-8, maxiter=300, damp=0.5)
    np.testing.assert_allclose(dm.row_map.from_padded(np.asarray(res.x)),
                               np.asarray(res_s.x)[:n], rtol=1e-6,
                               atol=1e-9)
