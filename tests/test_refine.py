"""Uniform mesh refinement (percept URP analogue): volume preservation,
positive Jacobians, conformity, and h-convergence through the fem stack."""
import numpy as np
import pytest

from trilinos_tpu.fem import (hgrad_basis, jacobian, jacobian_det,
                              structured_hex_mesh, structured_quad_mesh,
                              structured_tet_mesh, structured_tri_mesh)
from trilinos_tpu.fem.cubature import cubature
from trilinos_tpu.fem.refine import refine_uniform


def _volume(mesh):
    qp, qw = cubature(mesh.topo, 2)
    j = jacobian(mesh.cell_coords, qp, hgrad_basis(mesh.topo, 1))
    return float((qw[None, :] * jacobian_det(j)).sum()), \
        float(jacobian_det(j).min())


MAKERS = [
    (structured_tri_mesh, (2, 3), 4),
    (structured_quad_mesh, (3, 2), 4),
    (structured_hex_mesh, (2, 2, 2), 8),
    (structured_tet_mesh, (2, 2, 2), 8),
]


@pytest.mark.parametrize("make,args,factor", MAKERS)
def test_refine_volume_and_orientation(make, args, factor):
    mesh = make(*args)
    fine = refine_uniform(mesh)
    assert fine.connect.shape[0] == factor * mesh.connect.shape[0]
    v0, _ = _volume(mesh)
    v1, jmin = _volume(fine)
    assert abs(v1 - v0) < 1e-12       # unit box preserved
    assert jmin > 0                   # no inverted children


@pytest.mark.parametrize("make,args,factor", MAKERS)
def test_refine_conforming(make, args, factor):
    """Conformity: every child face/edge midpoint is shared — dof count
    matches a structured mesh of doubled resolution."""
    mesh = make(*args)
    fine = refine_uniform(mesh)
    doubled = make(*(2 * a for a in args))
    assert fine.coords.shape[0] == doubled.coords.shape[0]
    # same point set (possibly renumbered)
    a = np.sort(np.round(fine.coords, 12).view([("", float)] *
                                               fine.coords.shape[1]),
                axis=0)
    b = np.sort(np.round(doubled.coords, 12).view([("", float)] *
                                                  fine.coords.shape[1]),
                axis=0)
    assert np.array_equal(a, b)


def test_refine_twice():
    mesh = refine_uniform(structured_quad_mesh(2, 2), times=2)
    assert mesh.connect.shape[0] == 2 * 2 * 16


def test_h_convergence_through_refinement():
    """Poisson error drops ~4x per refinement (P1, h^2) using the SAME
    mesh object refined twice — the percept-style convergence driver."""
    from trilinos_tpu.fem import poisson_dirichlet

    def err(mesh):
        f = lambda x: (2 * np.pi ** 2
                       * np.sin(np.pi * x[..., 0])
                       * np.sin(np.pi * x[..., 1]))
        kii, b, interior, xy = poisson_dirichlet(mesh, f)
        u = np.zeros(len(xy))
        u[interior] = np.linalg.solve(kii.to_dense(), b)
        ex = np.sin(np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1])
        return np.abs(u - ex).max()

    m0 = structured_tri_mesh(4, 4)
    m1 = refine_uniform(m0)
    m2 = refine_uniform(m1)
    e0, e1, e2 = err(m0), err(m1), err(m2)
    assert e1 < e0 / 3.2 and e2 < e1 / 3.5


def test_unsupported_topology():
    import dataclasses

    from trilinos_tpu.fem.cells import LINE2
    from trilinos_tpu.fem.mesh import Mesh

    bad = Mesh(LINE2, np.array([[0.0], [1.0]]), np.array([[0, 1]]))
    with pytest.raises(ValueError, match="unsupported"):
        refine_uniform(bad)
