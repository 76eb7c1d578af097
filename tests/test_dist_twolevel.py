"""Two-level ('dcn','rows') solve-mesh tests.

VERDICT r3 #8 / SURVEY §2.3: the multi-host topology shards rows over a
2-axis mesh — halo ppermutes between neighboring inner-axis devices ride
ICI, only dcn-group boundary cuts cross the slow outer links. Same
numerics as the flat ('rows',) mesh, checked here on a (2,4) virtual
mesh against the 1-axis result.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv
from trilinos_tpu.solvers import cg, gmres


@pytest.fixture(scope="module")
def setup():
    a = laplace2d(16, 16)
    n_shards = 8
    dm = D.distribute(a, n_shards)
    mesh1 = drv.make_mesh(n_shards)
    mesh2 = drv.make_mesh2(2, 4)
    return a, dm, mesh1, mesh2


def test_solve_axes():
    assert drv.solve_axes(drv.make_mesh(4)) == "rows"
    assert drv.solve_axes(drv.make_mesh2(2, 4)) == ("dcn", "rows")


def test_spmv_matches_flat_mesh(setup, rng):
    a, dm, mesh1, mesh2 = setup
    x = rng.standard_normal(a.shape[0])
    xg = jnp.asarray(dm.row_map.to_padded(x))
    y1 = np.asarray(drv.dist_spmv(dm, xg, mesh1))
    y2 = np.asarray(drv.dist_spmv(dm, xg, mesh2))
    np.testing.assert_allclose(y2, y1, atol=1e-13)


def test_spmv_t_matches_flat_mesh(setup, rng):
    a, dm, mesh1, mesh2 = setup
    x = rng.standard_normal(a.shape[0])
    xg = jnp.asarray(dm.row_map.to_padded(x))
    y1 = np.asarray(drv.dist_spmv_t(dm, xg, mesh1))
    y2 = np.asarray(drv.dist_spmv_t(dm, xg, mesh2))
    np.testing.assert_allclose(y2, y1, atol=1e-13)


def test_cg_with_jacobi_on_two_level_mesh(setup, rng):
    a, dm, mesh1, mesh2 = setup
    prec = drv.dist_jacobi(a, dm.row_map)
    b = rng.standard_normal(a.shape[0])
    bg = jnp.asarray(dm.row_map.to_padded(b))
    r1 = drv.dist_solve(cg, dm, bg, mesh=mesh1, prec=prec, rtol=1e-10,
                        maxiter=400)
    r2 = drv.dist_solve(cg, dm, bg, mesh=mesh2, prec=prec, rtol=1e-10,
                        maxiter=400)
    assert bool(r2.converged)
    assert int(r2.iters) == int(r1.iters)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               atol=1e-9)


def test_gmres_on_two_level_mesh(setup, rng):
    a, dm, mesh1, mesh2 = setup
    b = rng.standard_normal(a.shape[0])
    bg = jnp.asarray(dm.row_map.to_padded(b))
    r2 = drv.dist_solve(gmres, dm, bg, mesh=mesh2, rtol=1e-8,
                        maxiter=400, restart=30)
    assert bool(r2.converged)
    # solution correct vs direct
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    a_sp = sp.csr_matrix((a.vals, a.cols, a.row_ptr), shape=a.shape)
    x_ref = spla.spsolve(a_sp.tocsc(), b)
    x2 = dm.row_map.from_padded(np.asarray(r2.x))
    np.testing.assert_allclose(x2, x_ref, atol=1e-6)


def test_lsqr_on_two_level_mesh(setup, rng):
    a, dm, mesh1, mesh2 = setup
    b = rng.standard_normal(a.shape[0])
    bg = jnp.asarray(dm.row_map.to_padded(b))
    r2 = drv.dist_lsqr(dm, bg, mesh=mesh2, rtol=1e-8, maxiter=600)
    r1 = drv.dist_lsqr(dm, bg, mesh=mesh1, rtol=1e-8, maxiter=600)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               atol=1e-8)
