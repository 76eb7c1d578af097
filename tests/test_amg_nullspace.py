"""Null-space-aware smoothed aggregation (MueLu "Nullspace" parity).

Elasticity needs the rigid-body modes interpolated exactly by the
tentative prolongator or SA convergence degrades badly — the reference
wires Galeri's problem->BuildNullspace() into MueLu's TentativePFactory
(packages/muelu/src/Transfers/Smoothed-Aggregation/
MueLu_TentativePFactory_decl.hpp); here the modes come from
galeri.fem.rigid_body_modes and per-aggregate QR builds the block P_t.
"""
import numpy as np

import jax.numpy as jnp

from trilinos_tpu import precond
from trilinos_tpu.galeri.fem import (elasticity2d, elasticity3d,
                                     rigid_body_modes)
from trilinos_tpu.ops import matvec as S
from trilinos_tpu.ops.formats import choose_format
from trilinos_tpu.precond.amg import (aggregate, amalgamate_graph,
                                      tentative_prolongator_nullspace)
from trilinos_tpu.solvers import cg


def _dense(p):
    d = np.zeros(p.shape)
    for i in range(p.shape[0]):
        lo, hi = p.row_ptr[i], p.row_ptr[i + 1]
        d[i, p.cols[lo:hi]] = p.vals[lo:hi]
    return d


def test_rigid_body_modes_in_kernel():
    """The assembled Neumann stiffness annihilates the modes; only the
    boundary-shift dofs see them (the Galeri SPD-shift convention)."""
    nx = ny = 8
    a = elasticity2d(nx, ny, e_mod=1.0)
    ns = rigid_body_modes(nx, ny)
    assert ns.shape == (2 * nx * ny, 3)
    r = _dense(a) @ ns
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    interior = ~((ii == 0) | (ii == nx - 1) | (jj == 0)
                 | (jj == ny - 1)).reshape(-1, order="F")
    dofs = np.repeat(interior, 2)
    assert np.abs(r[dofs]).max() <= 1e-10


def test_tentative_interpolates_nullspace_exactly():
    nx = ny = 10
    a = elasticity2d(nx, ny, e_mod=1.0)
    ns = rigid_body_modes(nx, ny)
    agg = aggregate(amalgamate_graph(a, 2))
    p_t, ns_c = tentative_prolongator_nullspace(agg, 2, ns)
    assert p_t.shape == (2 * nx * ny, (int(agg.max()) + 1) * 3)
    err = np.abs(_dense(p_t) @ ns_c - ns).max()
    assert err <= 1e-12
    # columns orthonormal within each aggregate block
    g = _dense(p_t).T @ _dense(p_t)
    assert np.abs(np.diag(g) - 1.0).max() <= 1e-12


def test_elasticity2d_ns_amg_beats_scalar_sa():
    nx = ny = 24
    a = elasticity2d(nx, ny, e_mod=1.0)
    ns = rigid_body_modes(nx, ny)
    dev = choose_format(a)
    n, npad = a.shape[0], dev.n_rows_pad
    rng = np.random.default_rng(0)
    b = np.zeros(npad)
    b[:n] = rng.standard_normal(n)
    b = jnp.asarray(b)

    m_ns = precond.SaAmg(a, {"nullspace: vectors": ns,
                             "number of equations": 2}).compute()
    r_ns = cg(lambda v: S.spmv(dev, v), b, prec=m_ns, rtol=1e-8,
              maxiter=200)
    m_sc = precond.SaAmg(a).compute()
    r_sc = cg(lambda v: S.spmv(dev, v), b, prec=m_sc, rtol=1e-8,
              maxiter=200)
    assert bool(r_ns.converged)
    # measured 12 vs 32 at this size
    assert int(r_ns.iters) <= 20
    assert int(r_ns.iters) * 2 <= int(r_sc.iters)
    x = np.asarray(r_ns.x)[:n]
    rel = (np.linalg.norm(np.asarray(b)[:n] - _dense(a) @ x)
           / np.linalg.norm(np.asarray(b)[:n]))
    assert rel <= 1.1e-8


def test_elasticity3d_ns_amg():
    nx = ny = nz = 6
    a = elasticity3d(nx, ny, nz, e_mod=1.0)
    ns = rigid_body_modes(nx, ny, nz)
    assert ns.shape == (3 * nx * ny * nz, 6)
    dev = choose_format(a)
    n, npad = a.shape[0], dev.n_rows_pad
    rng = np.random.default_rng(1)
    b = np.zeros(npad)
    b[:n] = rng.standard_normal(n)
    m = precond.SaAmg(a, {"nullspace: vectors": ns,
                          "number of equations": 3}).compute()
    r = cg(lambda v: S.spmv(dev, v), jnp.asarray(b), prec=m, rtol=1e-8,
           maxiter=100)
    assert bool(r.converged) and int(r.iters) <= 40


def test_structured_rejects_nullspace():
    import pytest

    from trilinos_tpu.galeri import laplace3d

    op = laplace3d(8, 8, 8, fmt="stencil")
    ns = np.ones((op.n_rows, 1))
    with pytest.raises(ValueError):
        precond.SaAmg(op, {"aggregation: type": "structured",
                           "nullspace: vectors": ns}).compute()
