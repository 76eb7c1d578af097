"""Batched FE assembly: stiffness/mass/load + a Poisson driver.

Reference: the Intrepid2 assembly idiom (e.g.
packages/trilinoscouplings/examples/scaling/example_Poisson.cpp — compute
cell Jacobians, transform gradients, integrate, assemble into a CRS) —
here each step is ONE einsum batched over all elements, and the global
insert is the vectorized COO Export-sum from ``ops.fe``.

Element integrals (w = cubature weight x |detJ|):
  stiffness K_e[a,b] = sum_q w a(x_q) grad phi_a . grad phi_b
  mass      M_e[a,b] = sum_q w phi_a phi_b
  load      f_e[a]   = sum_q w f(x_q) phi_a
"""

from __future__ import annotations

import numpy as np

from ..ops.fe import fe_assemble
from .basis import Basis, hgrad_basis
from .cell_tools import (hgrad_transform_grad, jacobian, jacobian_det,
                         jacobian_inv, map_to_physical)
from .cubature import cubature
from .mesh import Mesh, fe_space


def _setup(mesh: Mesh, basis: Basis, quad_degree: int | None):
    deg = quad_degree if quad_degree is not None else 2 * basis.degree
    qp, qw = cubature(mesh.topo, deg)
    geom = hgrad_basis(mesh.topo, 1)
    cc = mesh.cell_coords
    j = jacobian(cc, qp, geom)
    w = qw[None, :] * np.abs(jacobian_det(j))       # (ne, q)
    xq = map_to_physical(cc, qp, geom)              # (ne, q, dim)
    return qp, w, xq, j


def stiffness_matrix(mesh: Mesh, basis: Basis | None = None, coeff=None,
                     quad_degree: int | None = None):
    """(CsrHost K, dof_connect, dof_coords); ``coeff(x)``: scalar
    diffusion coefficient at physical points (ne, q, dim) -> (ne, q)."""
    basis = basis or hgrad_basis(mesh.topo, 1)
    qp, w, xq, j = _setup(mesh, basis, quad_degree)
    gphys = hgrad_transform_grad(jacobian_inv(j), basis.grads(qp))
    if coeff is not None:
        w = w * np.asarray(coeff(xq))
    ke = np.einsum("eq,eqai,eqbi->eab", w, gphys, gphys, optimize=True)
    conn, dof_xy = fe_space(mesh, basis)
    return fe_assemble(conn, ke, len(dof_xy)), conn, dof_xy


def mass_matrix(mesh: Mesh, basis: Basis | None = None,
                quad_degree: int | None = None):
    basis = basis or hgrad_basis(mesh.topo, 1)
    qp, w, _, _ = _setup(mesh, basis, quad_degree)
    phi = basis.values(qp)  # (q, n)
    me = np.einsum("eq,qa,qb->eab", w, phi, phi, optimize=True)
    conn, dof_xy = fe_space(mesh, basis)
    return fe_assemble(conn, me, len(dof_xy)), conn, dof_xy


def load_vector(mesh: Mesh, f, basis: Basis | None = None,
                quad_degree: int | None = None):
    """Global load for ``f(x)``: (ne, q, dim) -> (ne, q)."""
    basis = basis or hgrad_basis(mesh.topo, 1)
    qp, w, xq, _ = _setup(mesh, basis, quad_degree)
    phi = basis.values(qp)
    fe = np.einsum("eq,eq,qa->ea", w, np.asarray(f(xq)), phi,
                   optimize=True)
    conn, dof_xy = fe_space(mesh, basis)
    out = np.zeros(len(dof_xy))
    np.add.at(out, conn.ravel(), fe.ravel())
    return out, conn, dof_xy


def poisson_dirichlet(mesh: Mesh, f, basis: Basis | None = None,
                      coeff=None, g=None):
    """-div(a grad u) = f with Dirichlet data g on the boundary of the
    unit box: returns (K_ii CsrHost, rhs, interior_ids, dof_coords) —
    boundary rows eliminated symmetrically (the standard condensation)."""
    basis = basis or hgrad_basis(mesh.topo, 1)
    k, conn, xy = stiffness_matrix(mesh, basis, coeff=coeff)
    b, _, _ = load_vector(mesh, f, basis)
    on_bnd = np.zeros(len(xy), bool)
    for d in range(xy.shape[1]):
        on_bnd |= (np.abs(xy[:, d]) < 1e-9) | (np.abs(xy[:, d] - 1) < 1e-9)
    interior = np.nonzero(~on_bnd)[0]
    if g is not None:
        ubnd = np.zeros(len(xy))
        ubnd[on_bnd] = g(xy[on_bnd])
        b = b - k.matvec_host(ubnd)
    kii = k.submatrix(interior, interior)
    return kii, b[interior], interior, xy
