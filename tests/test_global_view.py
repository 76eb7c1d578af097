"""Global-view distributed solves: any serial driver over a sharded
global operator.

``parallel.driver.global_operator`` returns a jitted shard_map apply on
GLOBAL padded arrays; every solver-side reduction (jnp dot/norm on the
row-sharded arrays) is partitioned by GSPMD, so the WHOLE Belos-shaped
solver layer runs distributed without per-shard rewrites — the exact role
of the reference's MultiVecTraits firewall (a Belos solver never knows its
MV is MPI-distributed; packages/belos/src/BelosMultiVecTraits.hpp). The
per-shard ``dist_solve`` path remains the performance route (explicit
interior/boundary overlap); this is the flexibility route, and the two
must agree.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops.matvec import spmv
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv
from trilinos_tpu.precond import gmres_poly_op
from trilinos_tpu.solvers import cg, gmres


def setup(p=4, nx=16, ny=8):
    a = laplace2d(nx, ny)
    dm = D.distribute(a, p)
    assert dm.row_map.n_global_pad == a.shape[0]  # aligned: no pad rows
    mesh = drv.make_mesh(p)
    op = drv.global_operator(dm, mesh)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(a.shape[0])
    bg = jax.device_put(jnp.asarray(dm.row_map.to_padded(b)),
                        NamedSharding(mesh, P(drv.AXIS)))
    return a, dm, mesh, op, b, bg


def test_cg_global_view_matches_serial_and_dist():
    a, dm, mesh, op, b, bg = setup()
    res_g = cg(op, bg, rtol=1e-10, maxiter=500)  # SerialComm: sums global
    assert bool(res_g.converged)

    dev = F.csr_to_ell(a)
    res_s = cg(lambda v: spmv(dev, v), jnp.asarray(b), rtol=1e-10,
               maxiter=500)
    assert abs(int(res_g.iters) - int(res_s.iters)) <= 2
    np.testing.assert_allclose(
        dm.row_map.from_padded(np.asarray(res_g.x)), np.asarray(res_s.x),
        rtol=1e-8, atol=1e-10)

    res_d = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-10, maxiter=500)
    np.testing.assert_allclose(np.asarray(res_g.x), np.asarray(res_d.x),
                               rtol=1e-8, atol=1e-10)


def test_gmres_global_view():
    a, dm, mesh, op, b, bg = setup()
    res = gmres(op, bg, rtol=1e-8, maxiter=400)
    assert bool(res.converged)
    x = dm.row_map.from_padded(np.asarray(res.x))
    rel = np.linalg.norm(a.matvec_host(x) - b) / np.linalg.norm(b)
    assert rel < 1e-7


def test_distributed_gmres_poly_precond():
    """Operator-based GmresPoly on the global operator = a DISTRIBUTED
    polynomial preconditioner (GmresPolyOp applies to any
    Tpetra::Operator in the reference)."""
    a, dm, mesh, op, b, bg = setup()
    rng = np.random.default_rng(0)
    seed = jax.device_put(
        jnp.asarray(dm.row_map.to_padded(
            rng.standard_normal(a.shape[0]))),
        NamedSharding(mesh, P(drv.AXIS)))
    m = gmres_poly_op(op, seed, degree=10)
    res_p = cg(op, bg, prec=m, rtol=1e-10, maxiter=200)
    res_u = cg(op, bg, rtol=1e-10, maxiter=500)
    assert bool(res_p.converged)
    assert int(res_p.iters) < int(res_u.iters) // 2  # poly actually works
    x = dm.row_map.from_padded(np.asarray(res_p.x))
    rel = np.linalg.norm(a.matvec_host(x) - b) / np.linalg.norm(b)
    assert rel < 1e-8


def test_eigs_near_global_view():
    """Shift-invert interior eigenpairs on the sharded operator (the
    Anasazi shift-and-invert mode, distributed): inner MINRES solves run
    through the same global apply."""
    from trilinos_tpu.eigen import eigs_near

    a, dm, mesh, op, b, bg = setup()
    w = np.linalg.eigvalsh(a.to_dense())
    sigma = float((w[4] + w[5]) / 2) + 1e-4  # between interior eigenvalues
    rng = np.random.default_rng(9)
    v0 = jax.device_put(
        jnp.asarray(dm.row_map.to_padded(
            rng.standard_normal(a.shape[0]))),
        NamedSharding(mesh, P(drv.AXIS)))
    lam, vecs = eigs_near(op, sigma, 2, v0, m=30)
    got = np.sort(np.asarray(lam))
    want = np.sort(w[np.argsort(np.abs(w - sigma))[:2]])
    np.testing.assert_allclose(got, want, rtol=1e-6)
