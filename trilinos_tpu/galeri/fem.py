"""FE-based Galeri problems: elasticity and Helmholtz.

Analogues of the reference's Xpetra-side FE problems
(packages/galeri/src-xpetra/Galeri_Elasticity2DProblem.hpp,
Galeri_Elasticity3DProblem.hpp, Galeri_HelmholtzFEM2DProblem.hpp) — built
here through the framework's own FE assembly pipeline (``ops.fe``):
closed-form Q1 element stiffness matrices on a structured grid, assembled
with the vectorized COO Export-sum.

  * ``elasticity2d`` — plane-strain linear elasticity, Q1 quads,
    2 dofs/node (E, ν parameters as in the reference's defaults)
  * ``helmholtz2d``  — FD Helmholtz: Laplace2D − (k·h)² I (the shifted
    stencil form; the FEM mass-matrix variant reduces to the same pattern)
  * ``uniflow2d``    — constant-velocity convection-diffusion
    (Galeri_CrsMatrices.cpp "UniFlow2D"), upwinded like Recirc2D
"""
from __future__ import annotations

import numpy as np

from ..ops.fe import fe_assemble
from ..ops.formats import CsrHost
from .stencils import cross2d_stencil, laplace2d, _emit


def _q1_elasticity_ke(e_mod: float, nu: float) -> np.ndarray:
    """8×8 plane-strain Q1 element stiffness (unit square element),
    2×2 Gauss quadrature; dof order (ux0, uy0, ux1, uy1, ...) with nodes
    (0,0),(1,0),(1,1),(0,1)."""
    lam = e_mod * nu / ((1 + nu) * (1 - 2 * nu))
    mu = e_mod / (2 * (1 + nu))
    d_mat = np.array([[lam + 2 * mu, lam, 0],
                      [lam, lam + 2 * mu, 0],
                      [0, 0, mu]])
    gp = np.array([-1, 1]) / np.sqrt(3.0)
    nodes = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    ke = np.zeros((8, 8))
    for xi in gp:
        for eta in gp:
            s, t = (xi + 1) / 2, (eta + 1) / 2  # map to [0,1]^2
            dn = np.array([  # dN/ds, dN/dt for the 4 bilinear shapes
                [-(1 - t), -(1 - s)],
                [(1 - t), -s],
                [t, s],
                [-t, (1 - s)],
            ])
            b_mat = np.zeros((3, 8))
            for a in range(4):
                b_mat[0, 2 * a] = dn[a, 0]
                b_mat[1, 2 * a + 1] = dn[a, 1]
                b_mat[2, 2 * a] = dn[a, 1]
                b_mat[2, 2 * a + 1] = dn[a, 0]
            # unit element: |J| = 1/4 per GP pair weight (2x2 rule, w=1 in
            # xi-space; ds/dxi = 1/2 each)
            ke += 0.25 * b_mat.T @ d_mat @ b_mat
    return ke


def elasticity2d(nx: int, ny: int, e_mod: float = 1e9, nu: float = 0.25,
                 dtype=np.float64) -> CsrHost:
    """Plane-strain elasticity on an (nx-1)×(ny-1)-element Q1 grid of
    nx×ny nodes → 2·nx·ny dofs. Dirichlet handled by the usual Galeri
    convention (no boundary elimination — the operator is the assembled
    Neumann stiffness plus a diagonal shift on the boundary nodes to keep
    it SPD, matching the reference's default usable-out-of-the-box form).
    """
    ke = _q1_elasticity_ke(e_mod, nu).astype(dtype)
    ex, ey = nx - 1, ny - 1
    # element -> its 4 node ids (lexicographic nodes, x fastest)
    e_i, e_j = np.meshgrid(np.arange(ex), np.arange(ey), indexing="ij")
    n0 = (e_j * nx + e_i).reshape(-1)
    enodes = np.stack([n0, n0 + 1, n0 + nx + 1, n0 + nx], axis=1)
    # node ids -> dof ids (ux, uy interleaved)
    connect = np.empty((enodes.shape[0], 8), dtype=np.int64)
    connect[:, 0::2] = 2 * enodes
    connect[:, 1::2] = 2 * enodes + 1
    mats = np.broadcast_to(ke, (enodes.shape[0], 8, 8))
    a = fe_assemble(connect, mats, 2 * nx * ny)
    # SPD shift on boundary-node dofs (pin rigid-body modes)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    boundary = ((ii == 0) | (ii == nx - 1) | (jj == 0)
                | (jj == ny - 1)).reshape(-1, order="F")
    nodes_b = np.nonzero(boundary)[0]
    dofs = np.concatenate([2 * nodes_b, 2 * nodes_b + 1])
    shift = float(e_mod)
    from ..ops.matrix_ops import spadd

    d = CsrHost.from_coo(dofs, dofs, shift * np.ones(len(dofs), dtype=dtype),
                         a.shape, sum_duplicates=True)
    return spadd(a, d)


def helmholtz2d(nx: int, ny: int, k: float = 1.0, h: float | None = None,
                dtype=np.float64, fmt: str = "csr"):
    """Shifted Laplacian Helmholtz operator: A = Laplace2D − (k·h)² I."""
    h = h if h is not None else 1.0 / (nx + 1)
    shift = (k * h) ** 2
    st = cross2d_stencil(4.0 - shift, -1.0, -1.0, -1.0, -1.0)
    return _emit((nx, ny), st, dtype, fmt)


def uniflow2d(nx: int, ny: int, lx: float = 1.0, ly: float = 1.0,
              conv: float = 1.0, diff: float = 1e-5, alpha: float = 0.0,
              dtype=np.float64, fmt: str = "csr"):
    """Constant-velocity convection-diffusion (UniFlow2D,
    packages/galeri/src-epetra/Galeri_CrsMatrices.cpp): velocity
    (cos α, sin α)·conv, upwind discretization like Recirc2D."""
    hx = lx / (nx + 1)
    hy = ly / (ny + 1)
    cx = conv * np.cos(alpha) / hx
    cy = conv * np.sin(alpha) / hy
    a = diff * 2 / hx ** 2 + diff * 2 / hy ** 2
    b = -diff / hx ** 2
    c = -diff / hx ** 2
    d = -diff / hy ** 2
    e = -diff / hy ** 2
    if cx < 0:
        c += cx
        a -= cx
    else:
        b -= cx
        a += cx
    if cy < 0:
        e += cy
        a -= cy
    else:
        d -= cy
        a += cy
    st = cross2d_stencil(a, b, c, d, e)
    return _emit((nx, ny), st, dtype, fmt)
