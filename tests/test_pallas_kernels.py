"""Pallas kernel correctness in interpreter mode (CPU-runnable).

The compiled kernels are additionally exercised on the real chip by the
verify flow and bench.py; these tests pin the kernel LOGIC against the
XLA reference implementations.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d, laplace3d, stencils
import trilinos_tpu.ops.matvec as mv
from trilinos_tpu.ops.pallas.dia_spmv import dia_spmv_pallas, _plan as dia_plan
from trilinos_tpu.ops.pallas.stencil_op import (
    StencilOp, _plan as st_plan, stencil_spmv_pallas, stencil_spmv_xla)


def padded_x(n_pad, n, seed=0):
    x = np.zeros(n_pad, np.float32)
    x[:n] = np.random.default_rng(seed).standard_normal(n)
    return jnp.asarray(x)


class TestDiaKernel:
    @pytest.mark.parametrize("dims", [(32, 16, 16), (64, 16, 8), (128, 24, 1)])
    def test_matches_xla(self, dims):
        if dims[2] == 1:
            a = laplace2d(dims[0], dims[1], dtype=np.float32, fmt="dia")
        else:
            a = laplace3d(*dims, dtype=np.float32, fmt="dia")
        assert dia_plan(a.offsets, a.n_rows_pad, a.data.shape[0]) is not None
        x = padded_x(a.n_rows_pad, a.n_rows)
        y_k = dia_spmv_pallas(a, x, interpret=True)
        y_x = mv.spmv(a, x, impl="xla")
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    def test_not_applicable_small(self):
        a = laplace2d(4, 4, dtype=np.float32, fmt="dia")
        assert dia_plan(a.offsets, a.n_rows_pad, a.data.shape[0]) is None


class TestStencilOp:
    @pytest.mark.parametrize("dims", [(32, 16, 8), (30, 20, 1), (128, 40, 1)])
    def test_xla_path_matches_stored(self, dims):
        st = (stencils.cross3d_stencil(6.0, *([-1.0] * 6)) if dims[2] > 1
              else stencils.cross2d_stencil(4.0, -1.0, -1.0, -1.0, -1.0))
        d = dims if dims[2] > 1 else dims[:2]
        op = StencilOp.create(d, st)
        a = stencils.stencil_csr(d, st, dtype=np.float64)
        x = padded_x(op.n_rows_pad, op.n_rows)
        y = stencil_spmv_xla(op, x)
        want = a.to_dense() @ np.asarray(x)[: op.n_rows]
        np.testing.assert_allclose(np.asarray(y)[: op.n_rows], want,
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("dims", [(32, 16, 8), (128, 40, 1)])
    def test_kernel_matches_xla(self, dims):
        st = (stencils.cross3d_stencil(6.0, *([-1.0] * 6)) if dims[2] > 1
              else stencils.cross2d_stencil(4.0, -1.0, -1.0, -1.0, -1.0))
        d = dims if dims[2] > 1 else dims[:2]
        op = StencilOp.create(d, st)
        assert st_plan(op) is not None
        x = padded_x(op.n_rows_pad, op.n_rows)
        y_k = stencil_spmv_pallas(op, x, interpret=True)
        y_x = stencil_spmv_xla(op, x)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    def test_transpose_symmetric(self):
        op = laplace2d(16, 12, dtype=np.float32, fmt="stencil")
        x = padded_x(op.n_rows_pad, op.n_rows)
        y_f = mv.spmv(op, x)
        y_t = mv.spmv(op, x, transpose=True)
        # Laplacian is symmetric: transpose apply must agree
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_t),
                                   rtol=1e-4, atol=1e-6)

    def test_cg_with_stencil_op(self):
        from trilinos_tpu.solvers import cg

        op = laplace2d(20, 20, dtype=np.float64, fmt="stencil")
        a = laplace2d(20, 20)
        x_true = np.random.default_rng(3).standard_normal(400)
        b = np.zeros(op.n_rows_pad)
        b[:400] = a.to_dense() @ x_true
        res = cg(lambda v: mv.spmv(op, v), jnp.asarray(b), rtol=1e-10,
                 maxiter=2000)
        np.testing.assert_allclose(np.asarray(res.x)[:400], x_true,
                                   rtol=1e-6, atol=1e-8)

    def test_nnz_counts_boundary_truncation(self):
        op = laplace2d(10, 10, dtype=np.float32, fmt="stencil")
        a = laplace2d(10, 10)
        assert op.nnz == a.nnz


class TestDiaSpmm:
    """Packed multivector DIA kernel (round-2: KokkosSparse_spmv.hpp:156
    multivector analogue) vs XLA, interpret mode."""

    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_matches_xla(self, k):
        from trilinos_tpu.ops.pallas.dia_spmv import (dia_spmm_applicable,
                                                      dia_spmm_pallas)

        a = laplace3d(32, 16, 16, dtype=np.float32, fmt="dia")
        assert dia_spmm_applicable(a, k)
        n = a.n_rows_pad
        x = np.zeros((n, k), np.float32)
        x[: a.n_rows] = np.random.default_rng(0).standard_normal(
            (a.n_rows, k))
        y_k = dia_spmm_pallas(a, jnp.asarray(x), interpret=True)
        y_x = mv.spmv(a, jnp.asarray(x), impl="xla")
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)


class TestBf16Storage:
    """bf16 diagonal storage with f32 accumulation (ROADMAP perf item):
    halves the dominant data stream; exact for integer-coefficient
    stencils like the Laplacian."""

    def test_kernel_matches_f32(self):
        a16 = laplace3d(32, 16, 16, dtype=jnp.bfloat16, fmt="dia")
        a32 = laplace3d(32, 16, 16, dtype=np.float32, fmt="dia")
        n = a16.n_rows_pad
        x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        dtype=jnp.float32)
        y16 = dia_spmv_pallas(a16, x, interpret=True)
        y32 = mv.spmv(a32, x, impl="xla")
        np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                                   rtol=1e-5, atol=1e-5)

    def test_cg_converges_with_bf16_matrix(self):
        from trilinos_tpu.solvers import cg

        a16 = laplace2d(24, 24, dtype=jnp.bfloat16, fmt="dia")
        a = laplace2d(24, 24)
        n, npad = a.shape[0], a16.n_rows_pad
        b = np.zeros(npad, np.float32)
        b[:n] = np.random.default_rng(2).standard_normal(n)
        res = cg(lambda v: mv.spmv(a16, v, impl="xla"), jnp.asarray(b),
                 rtol=1e-5, maxiter=2000)
        assert bool(res.converged.all())
        x = np.asarray(res.x, dtype=np.float64)[:n]
        rel = (np.linalg.norm(b[:n] - a.to_dense() @ x)
               / np.linalg.norm(b[:n]))
        assert rel <= 5e-5


class TestBdiaKernel:
    """Block-diagonal (block-stencil) kernel vs XLA plane path, interpret
    mode (the BSR fast path; design in ops/pallas/bdia_spmv.py)."""

    def _elasticity_bdia(self, nx=64, ny=48):
        from trilinos_tpu.galeri import elasticity2d
        from trilinos_tpu.ops import formats as F

        a = elasticity2d(nx, ny, e_mod=1.0)
        return a, F.csr_to_bdia(a, 2, dtype=np.float32)

    def test_spmv_matches_xla(self):
        from trilinos_tpu.ops.pallas.bdia_spmv import (
            bdia_pallas_applicable, bdia_spmv_pallas)

        a, dev = self._elasticity_bdia()
        assert bdia_pallas_applicable(dev, 1)
        x = padded_x(dev.n_rows_pad, dev.n_rows)
        y_k = bdia_spmv_pallas(dev, x, interpret=True)
        y_x = mv.spmv(dev, x, impl="xla")
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k", [2, 4])
    def test_spmm_matches_xla(self, k):
        from trilinos_tpu.ops.pallas.bdia_spmv import (
            bdia_pallas_applicable, bdia_spmm_pallas)

        _, dev = self._elasticity_bdia()
        assert bdia_pallas_applicable(dev, k)
        n = dev.n_rows_pad
        x = np.zeros((n, k), np.float32)
        x[: dev.n_rows] = np.random.default_rng(1).standard_normal(
            (dev.n_rows, k))
        y_k = bdia_spmm_pallas(dev, jnp.asarray(x), interpret=True)
        y_x = mv.spmv(dev, jnp.asarray(x), impl="xla")
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)

    def test_negative_lane_offsets(self):
        """Block offsets spanning ±(nx+1) exercise ro<0 and lo!=0 paths."""
        from trilinos_tpu.ops.pallas.bdia_spmv import _plan

        _, dev = self._elasticity_bdia(96, 32)
        plan = _plan(dev.offsets, dev.block_size, dev.nbr_pad,
                     len(dev.offsets), 1)
        assert plan is not None

    def test_not_applicable_small(self):
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops.pallas.bdia_spmv import bdia_pallas_applicable
        from trilinos_tpu.galeri import elasticity2d

        a = elasticity2d(6, 5, e_mod=1.0)
        dev = F.csr_to_bdia(a, 2, dtype=np.float32)
        assert not bdia_pallas_applicable(dev, 1)


class TestBdiaPlaneSolverOp:
    """Plane-layout solve adapter: the whole Krylov solve runs on packed
    planes (pack/unpack once per solve; dots/axpys are permutation-
    invariant)."""

    def test_op_commutes_with_pack(self):
        from trilinos_tpu.galeri import elasticity2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops.pallas.bdia_spmv import bdia_plane_solver_op

        a = elasticity2d(10, 8, e_mod=1.0)
        dev = F.csr_to_bdia(a, 2)
        op, pack, unpack = bdia_plane_solver_op(dev)
        x = np.random.default_rng(0).standard_normal(dev.n_rows_pad)
        xj = jnp.asarray(x)
        np.testing.assert_allclose(np.asarray(unpack(pack(xj))), x)
        got = np.asarray(unpack(op(pack(xj))))
        want = np.asarray(mv.spmv(dev, xj, impl="xla"))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_cg_in_plane_layout(self):
        from trilinos_tpu.galeri import elasticity2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops.pallas.bdia_spmv import bdia_plane_solver_op
        from trilinos_tpu.solvers import cg

        a = elasticity2d(8, 6, e_mod=1.0)
        dev = F.csr_to_bdia(a, 2)
        op, pack, unpack = bdia_plane_solver_op(dev)
        n = a.shape[0]
        b = np.zeros(dev.n_rows_pad)
        b[:n] = np.random.default_rng(1).standard_normal(n)
        res = cg(op, pack(jnp.asarray(b)), rtol=1e-10, maxiter=2000)
        assert bool(res.converged.all())
        x = np.asarray(unpack(res.x))[:n]
        rel = (np.linalg.norm(b[:n] - a.to_dense() @ x)
               / np.linalg.norm(b[:n]))
        assert rel <= 1e-8


class TestDiaRingKernel:
    """Ring-buffer DIA kernel (x read once) vs the XLA roll reference."""

    def _make(self, n, offsets, seed=0):
        from trilinos_tpu.ops.formats import DiaMatrix

        rng = np.random.default_rng(seed)
        nd = len(offsets)
        data = rng.standard_normal((nd, n)).astype(np.float32)
        rows = np.arange(n)
        for d, o in enumerate(offsets):
            data[d, (rows + o < 0) | (rows + o >= n)] = 0.0
        r = n // 128
        return DiaMatrix(data=jnp.asarray(data.reshape(nd, r, 128)),
                         offsets=tuple(offsets), n_rows=n, n_cols=n,
                         nnz=int((data != 0).sum()))

    @pytest.mark.parametrize("k", [1, 4])
    @pytest.mark.parametrize("offsets", [
        (-2560, -256, -1, 0, 1, 256, 2560),   # deep ring (u=3, s=8 at br=8)
        (-1024, -256, -1, 0, 1, 256, 1024),   # shift multiples of br
        (-129, -3, 0, 3, 129),                # lane-carry + concat reads
    ])
    def test_matches_reference(self, k, offsets):
        from trilinos_tpu.ops.pallas import dia_spmv as D

        n = 64 * 128
        a = self._make(n, offsets)
        plan = D._plan_ring(a.offsets, n, a.data.shape[0], k)
        assert plan is not None
        rng = np.random.default_rng(1)
        xk = rng.standard_normal((k, n // 128, 128)).astype(np.float32)
        y = np.asarray(D.dia_spmm_ring(a, jnp.asarray(xk), interpret=True))
        data = np.asarray(a.data).reshape(len(offsets), n)
        want = np.zeros((k, n), np.float32)
        for d, o in enumerate(offsets):
            want += data[d] * np.roll(xk.reshape(k, n), -o, axis=1)
        np.testing.assert_allclose(y.reshape(k, n), want, rtol=2e-5,
                                   atol=2e-5)

    def test_single_rhs_dispatch_uses_ring(self):
        """dia_spmv_pallas prefers the ring plan when one exists."""
        from trilinos_tpu.ops.pallas import dia_spmv as D

        a = self._make(64 * 128, (-2560, -1, 0, 1, 2560))
        assert D._plan_ring(a.offsets, a.n_rows_pad, a.data.shape[0], 1)
        x = padded_x(a.n_rows_pad, a.n_rows, seed=3)
        y = np.asarray(D.dia_spmv_pallas(a, x, interpret=True))
        want = np.asarray(mv.spmv(a, x, impl="xla"))
        np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)


class TestWindowPlanInvariant:
    """Regression for the round-2 window-plan bug: a plan with br < h makes
    the mid-block DMA start jnp.clip(blk*br - h, ...) clamp at the edges,
    silently shifting every read of that block (at 256^3 k=4 the old
    planner chose br=512 < h=520 and corrupted blocks 1 and nb-2)."""

    def test_planners_reject_br_lt_h(self):
        from trilinos_tpu.ops.pallas.dia_spmv import _plan, _plan_mv

        # the exact 256^3 7-point geometry that shipped the bug
        offs = (-65536, -256, -1, 0, 1, 256, 65536)
        n_pad = 256 ** 3
        for k in (1, 2, 4, 8, 16):
            plan = _plan_mv(offs, n_pad, 7, k)
            assert plan is None or plan[0] >= plan[1]
        plan = _plan(offs, n_pad, 7)
        assert plan is None or plan[0] >= plan[1]
        # sweep of synthetic reaches around the br ~ h crossover
        for m in (60, 120, 180, 250, 400, 511):
            offs = (-m * 128, 0, m * 128)
            for k in (1, 4):
                plan = _plan_mv(offs, 512 * 128, 3, k)
                assert plan is None or plan[0] >= plan[1], (m, k, plan)

    def test_stencil_plane_plan_invariant(self):
        from trilinos_tpu.ops.pallas.stencil_op import (StencilOp,
                                                        _plane_plan)

        st = stencils.cross3d_stencil(6.0, *([-1.0] * 6))
        for dims in ((32, 16, 8), (64, 64, 64), (128, 128, 16)):
            op = StencilOp.create(dims, st)
            plan = _plane_plan(op)
            if plan is not None:
                br, q, h, p = plan
                assert br >= h, (dims, plan)
