"""Plane-masked chunked stencil kernel (round-2 fast path) vs XLA reference.

The plane path replaces in-kernel per-offset boundary-mask integer math with
precomputed coefficient*mask z-plane arrays (see stencil_op.py). These tests
pin its logic (interpret mode) across 3-D, 2-D, diagonal-offset (Star2D) and
corner-offset (Brick3D) stencils, including padded z-planes.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import stencils
from trilinos_tpu.ops.pallas.stencil_op import (
    StencilOp, _plane_plan, stencil_spmv_planes, stencil_spmv_xla)


def padded_x(n_pad, n, seed=0):
    x = np.zeros(n_pad, np.float32)
    x[:n] = np.random.default_rng(seed).standard_normal(n)
    return jnp.asarray(x)


CASES = [
    # (dims, stencil) — all satisfy (nx*ny) % 128 == 0, P % 8 == 0
    ((32, 32, 8), stencils.cross3d_stencil(6.0, *([-1.0] * 6))),
    ((64, 32, 4), stencils.cross3d_stencil(6.0, *([-1.0] * 6))),
    ((128, 40, 1), stencils.cross2d_stencil(4.0, -1.0, -1.0, -1.0, -1.0)),
    # Star2D: diagonal offsets (dx and dy both nonzero share one plane)
    ((64, 64, 1), stencils.star2d_stencil(8.0, *([-1.0] * 8))),
    # Brick3D: 27-point — corner offsets combine plane masks with z select
    ((32, 32, 6), stencils.brick3d_stencil(26.0, -1.0, -0.5, -0.25)),
]


class TestPlaneKernel:
    @pytest.mark.parametrize("dims,st", CASES)
    def test_matches_xla(self, dims, st):
        d = dims if dims[2] > 1 else dims[:2]
        op = StencilOp.create(d, st)
        assert _plane_plan(op) is not None, "plane plan must apply"
        x = padded_x(op.n_rows_pad, op.n_rows)
        y_k = stencil_spmv_planes(op, x, interpret=True)
        y_x = stencil_spmv_xla(op, x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    def test_padded_planes(self):
        # n_rows_pad with extra whole z-planes: pad chunks are identity rows
        st = stencils.cross3d_stencil(6.0, *([-1.0] * 6))
        op = StencilOp.create((32, 32, 6), st,
                              n_rows_pad=32 * 32 * 8)  # 2 pad planes
        assert _plane_plan(op) is not None
        x = padded_x(op.n_rows_pad, op.n_rows_pad, seed=1)  # nonzero pad
        y_k = stencil_spmv_planes(op, x, interpret=True)
        y_x = stencil_spmv_xla(op, x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    def test_not_applicable_odd_plane(self):
        # nx*ny not a multiple of 128 -> no plane plan
        st = stencils.cross2d_stencil(4.0, -1.0, -1.0, -1.0, -1.0)
        op = StencilOp.create((100, 100), st)
        assert _plane_plan(op) is None


class TestStencilSpmm:
    """Packed multivector plane kernel vs XLA (interpret mode)."""

    @pytest.mark.parametrize("k", [2, 4])
    def test_matches_xla(self, k):
        from trilinos_tpu.ops.pallas.stencil_op import (
            stencil_spmm_applicable, stencil_spmm_pallas)

        st = stencils.cross3d_stencil(6.0, *([-1.0] * 6))
        op = StencilOp.create((32, 32, 8), st)
        assert stencil_spmm_applicable(op, k)
        n = op.n_rows_pad
        x = np.zeros((n, k), np.float32)
        x[: op.n_rows] = np.random.default_rng(0).standard_normal(
            (op.n_rows, k))
        y_k = stencil_spmm_pallas(op, jnp.asarray(x), interpret=True)
        y_x = stencil_spmv_xla(op, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)
