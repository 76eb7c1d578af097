"""Mortar coupling (Moertel analogue): projections, patch test, saddle
form. Reference behaviors: packages/moertel/src/mortar mrtr_manager.cpp
(D/M assembly, condensed + saddle systems), lmshape_lineardual."""
import dataclasses

import numpy as np
import pytest

from trilinos_tpu.fem import structured_quad_mesh, stiffness_matrix
from trilinos_tpu.fem.mortar import (block_diag, interface_dofs,
                                     mortar_glue, mortar_projection_1d,
                                     mortar_saddle)


class TestProjection:
    def test_reproduces_linears(self):
        xs = np.linspace(0, 1, 9)
        xm = np.array([0.0, 0.15, 0.4, 0.55, 0.8, 1.0])
        for kind in ("dual", "standard"):
            d, m, p = mortar_projection_1d(xs, xm, kind=kind)
            for a, b in [(1.0, 0.0), (0.0, 1.0), (2.0, -3.0)]:
                got = p @ (a + b * xm)
                np.testing.assert_allclose(got, a + b * xs, atol=1e-12)
            np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)

    def test_dual_d_is_diagonal(self):
        xs = np.linspace(0, 1, 7)
        xm = np.linspace(0, 1, 5)
        d, _, _ = mortar_projection_1d(xs, xm, kind="dual")
        # interior-multiplier block is diagonal (biorthogonality); the
        # endpoint columns vanish for duals
        dint = d[:, 1:-1]
        off = dint - np.diag(np.diag(dint))
        assert np.max(np.abs(off)) < 1e-13
        assert np.max(np.abs(d[:, [0, -1]])) < 1e-13

    def test_matching_grids_identity(self):
        x = np.linspace(0, 2, 6)
        _, _, p = mortar_projection_1d(x, x, kind="dual")
        np.testing.assert_allclose(p, np.eye(6), atol=1e-12)

    def test_span_mismatch_rejected(self):
        with pytest.raises(ValueError, match="span"):
            mortar_projection_1d(np.linspace(0, 1, 4),
                                 np.linspace(0, 2, 4))


def _strip_mesh(nx, ny, y0, y1):
    mesh = structured_quad_mesh(nx, ny)
    coords = mesh.coords.copy()
    coords[:, 1] = y0 + coords[:, 1] * (y1 - y0)
    return dataclasses.replace(mesh, coords=coords)


def _glued_poisson(nx_a=5, ny_a=3, nx_b=7, ny_b=4, kind="dual"):
    """Poisson on the unit square split at y=0.5 into nonmatching
    strips; A = bottom (master side), B = top (slave side)."""
    mesh_a = _strip_mesh(nx_a, ny_a, 0.0, 0.5)
    mesh_b = _strip_mesh(nx_b, ny_b, 0.5, 1.0)
    k_a, _, xy_a = stiffness_matrix(mesh_a)
    k_b, _, xy_b = stiffness_matrix(mesh_b)
    master, xm = interface_dofs(xy_a, axis=1, value=0.5)
    slave, xs = interface_dofs(xy_b, axis=1, value=0.5)
    d, m, p = mortar_projection_1d(xs, xm, kind=kind)
    k_red, f_red, c, red_of_full = mortar_glue(
        k_a, k_b, np.zeros(len(xy_a)), np.zeros(len(xy_b)),
        slave, master, p)
    # reduced-dof coordinates
    keep_b = np.setdiff1d(np.arange(len(xy_b)), slave)
    xy_red = np.vstack([xy_a, xy_b[keep_b]])
    return (k_red, f_red, c, xy_red, (k_a, k_b, slave, master, d, m),
            red_of_full)


class TestGluedPoisson:
    @pytest.mark.parametrize("kind", ["dual", "standard"])
    def test_patch_test_exact_linear(self, kind):
        """The mortar patch test: u = x (in both FE spaces) must pass
        through the nonmatching interface exactly."""
        k_red, f_red, c, xy, extras, _ = _glued_poisson(kind=kind)
        n = k_red.shape[0]
        on_bnd = ((np.abs(xy[:, 0]) < 1e-9)
                  | (np.abs(xy[:, 0] - 1) < 1e-9)
                  | (np.abs(xy[:, 1]) < 1e-9)
                  | (np.abs(xy[:, 1] - 1) < 1e-9))
        interior = np.nonzero(~on_bnd)[0]
        u = np.zeros(n)
        u[on_bnd] = xy[on_bnd, 0]
        kd = k_red.to_dense()
        rhs = f_red - kd @ u
        u[interior] = np.linalg.solve(kd[np.ix_(interior, interior)],
                                      rhs[interior])
        np.testing.assert_allclose(u, xy[:, 0], atol=1e-10)
        # the full (unreduced) vector satisfies the mortar constraint
        k_a, k_b, slave, master, d, m = extras
        u_full = c.matvec_host(u)
        _, b = mortar_saddle(k_a, k_b, slave, master, d, m)
        assert np.max(np.abs(b.matvec_host(u_full))) < 1e-10

    def test_nonmatching_accuracy_vs_fine_reference(self):
        """f=1, u=0 boundary: glued nonmatching solve agrees with a
        fine conforming reference at the domain center."""
        from trilinos_tpu.fem import poisson_dirichlet

        k_red, _, _, xy, _, _ = _glued_poisson(nx_a=8, ny_a=4,
                                               nx_b=12, ny_b=6)
        # assemble load f=1 on both meshes through the same reduction
        mesh_a = _strip_mesh(8, 4, 0.0, 0.5)
        mesh_b = _strip_mesh(12, 6, 0.5, 1.0)
        from trilinos_tpu.fem import load_vector
        f_a, _, _ = load_vector(mesh_a, lambda x: np.ones(x.shape[:-1]))
        f_b, _, _ = load_vector(mesh_b, lambda x: np.ones(x.shape[:-1]))
        k_a, _, xy_a = stiffness_matrix(mesh_a)
        k_b, _, xy_b = stiffness_matrix(mesh_b)
        master, xm = interface_dofs(xy_a, 1, 0.5)
        slave, xs = interface_dofs(xy_b, 1, 0.5)
        _, _, p = mortar_projection_1d(xs, xm)
        k_red, f_red, _, _ = mortar_glue(k_a, k_b, f_a, f_b, slave,
                                         master, p)
        on_bnd = ((np.abs(xy[:, 0]) < 1e-9)
                  | (np.abs(xy[:, 0] - 1) < 1e-9)
                  | (np.abs(xy[:, 1]) < 1e-9)
                  | (np.abs(xy[:, 1] - 1) < 1e-9))
        interior = np.nonzero(~on_bnd)[0]
        kd = k_red.to_dense()
        u = np.zeros(k_red.shape[0])
        u[interior] = np.linalg.solve(kd[np.ix_(interior, interior)],
                                      f_red[interior])
        # center (0.5, 0.5) is a master interface node
        ic = np.argmin(np.abs(xy[:, 0] - 0.5) + np.abs(xy[:, 1] - 0.5))
        # fine conforming reference
        kii, b, int_ids, xyr = poisson_dirichlet(
            structured_quad_mesh(32, 32),
            lambda x: np.ones(x.shape[:-1]))
        ur = np.zeros(len(xyr))
        ur[int_ids] = np.linalg.solve(kii.to_dense(), b)
        jc = np.argmin(np.abs(xyr[:, 0] - 0.5)
                       + np.abs(xyr[:, 1] - 0.5))
        assert abs(u[ic] - ur[jc]) < 3e-3

    def test_block_diag(self):
        a = stiffness_matrix(structured_quad_mesh(2, 2))[0]
        bd = block_diag(a, a)
        n = a.shape[0]
        dense = bd.to_dense()
        np.testing.assert_allclose(dense[:n, :n], a.to_dense())
        np.testing.assert_allclose(dense[n:, n:], a.to_dense())
        assert np.max(np.abs(dense[:n, n:])) == 0.0
