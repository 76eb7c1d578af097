"""GMRES / BiCGStab / MINRES / TFQMR integration tests.

Mirrors packages/belos/tpetra/test/{BlockGmres,BiCGStab,Minres,TFQMR}
drivers: solve Galeri problems to tolerance, assert the TRUE residual.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d, recirc2d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops import matvec as S
from trilinos_tpu.solvers.gmres import fgmres, gmres
from trilinos_tpu.solvers.bicgstab import bicgstab
from trilinos_tpu.solvers.minres import minres
from trilinos_tpu.solvers.tfqmr import tfqmr


def make_problem(a_csr, nrhs=0, seed=5):
    dev = F.csr_to_dia(a_csr)
    n, npad = a_csr.shape[0], dev.n_rows_pad
    rng = np.random.default_rng(seed)
    shape = (npad,) if nrhs == 0 else (npad, nrhs)
    b = np.zeros(shape)
    b[:n] = rng.standard_normal((n,) if nrhs == 0 else (n, nrhs))
    op = lambda x: S.spmv(dev, x, impl="xla")
    return op, jnp.asarray(b), a_csr.to_dense(), n


def true_rel_res(b, dense, x, n):
    r = np.asarray(b)[:n] - dense @ np.asarray(x)[:n]
    return np.linalg.norm(r, axis=0) / np.linalg.norm(np.asarray(b)[:n], axis=0)


class TestGmres:
    @pytest.mark.parametrize("ortho", ["CGS2", "DGKS"])
    def test_laplace2d(self, ortho):
        a = laplace2d(30, 30)
        op, b, dense, n = make_problem(a)
        res = gmres(op, b, restart=30, rtol=1e-8, maxiter=900, ortho=ortho)
        assert true_rel_res(b, dense, res.x, n) <= 1.1e-8
        assert bool(res.converged)

    def test_nonsymmetric_recirc2d(self):
        a = recirc2d(20, 20, diff=1e-2)
        op, b, dense, n = make_problem(a)
        res = gmres(op, b, restart=40, rtol=1e-8, maxiter=2000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6

    def test_multivector_pseudo_block(self):
        a = laplace2d(16, 16)
        op, b, dense, n = make_problem(a, nrhs=3)
        res = gmres(op, b, restart=30, rtol=1e-8, maxiter=600)
        assert (true_rel_res(b, dense, res.x, n) <= 1.1e-8).all()
        assert bool(res.converged.all())

    def test_right_preconditioned(self):
        a = laplace2d(20, 20)
        op, b, dense, n = make_problem(a)
        dinv = np.zeros(b.shape[0])
        dinv[:n] = 1.0 / np.diag(dense)
        dinv[n:] = 1.0
        dinv = jnp.asarray(dinv)
        res = gmres(op, b, prec=lambda v: dinv * v, restart=30, rtol=1e-8,
                    maxiter=600)
        assert true_rel_res(b, dense, res.x, n) <= 1.1e-8

    def test_x0_nonzero(self):
        a = laplace2d(12, 12)
        op, b, dense, n = make_problem(a)
        x0 = jnp.ones_like(b) * 0.1
        x0 = x0.at[n:].set(0)
        res = gmres(op, b, x0=x0, restart=30, rtol=1e-10, maxiter=600)
        assert true_rel_res(b, dense, res.x, n) <= 1e-9

    def test_restart_smaller_than_needed(self):
        """GMRES(5) must still converge through restarts on SPD problem."""
        a = laplace2d(10, 10)
        op, b, dense, n = make_problem(a)
        res = gmres(op, b, restart=5, rtol=1e-8, maxiter=3000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7

    def test_fgmres_with_variable_prec(self):
        a = laplace2d(16, 16)
        op, b, dense, n = make_problem(a)
        # inner CG as (nonlinear) preconditioner — classic FGMRES use
        from trilinos_tpu.solvers import cg

        def prec(v):
            return cg(op, v, rtol=1e-2, maxiter=5).x

        res = fgmres(op, b, prec=prec, restart=20, rtol=1e-8, maxiter=400)
        assert true_rel_res(b, dense, res.x, n) <= 1.1e-8


class TestBicgstab:
    def test_laplace2d(self):
        a = laplace2d(20, 20)
        op, b, dense, n = make_problem(a)
        res = bicgstab(op, b, rtol=1e-8, maxiter=2000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7

    def test_nonsymmetric(self):
        a = recirc2d(16, 16, diff=1e-2)
        op, b, dense, n = make_problem(a)
        res = bicgstab(op, b, rtol=1e-9, maxiter=4000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7

    def test_multivector(self):
        a = laplace2d(12, 12)
        op, b, dense, n = make_problem(a, nrhs=2)
        res = bicgstab(op, b, rtol=1e-9, maxiter=2000)
        assert (true_rel_res(b, dense, res.x, n) <= 1e-7).all()

    def test_jacobi_prec(self):
        a = recirc2d(14, 14, diff=1e-1)
        op, b, dense, n = make_problem(a)
        dinv = np.zeros(b.shape[0])
        dinv[:n] = 1.0 / np.diag(dense)
        dinv[n:] = 1.0
        res = bicgstab(op, b, prec=lambda v: jnp.asarray(dinv) * v,
                       rtol=1e-9, maxiter=2000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7


class TestMinres:
    def test_spd(self):
        a = laplace2d(20, 20)
        op, b, dense, n = make_problem(a)
        res = minres(op, b, rtol=1e-8, maxiter=2000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6

    def test_indefinite(self):
        """MINRES' raison d'être: symmetric indefinite (shifted Laplacian)."""
        a = laplace2d(14, 14)
        dense0 = a.to_dense()
        shift = 1.5  # inside the spectrum -> indefinite
        coo_rows, coo_cols = np.nonzero(dense0)
        vals = dense0[coo_rows, coo_cols]
        shifted = F.CsrHost.from_coo(
            np.concatenate([coo_rows, np.arange(196)]),
            np.concatenate([coo_cols, np.arange(196)]),
            np.concatenate([vals, -shift * np.ones(196)]), (196, 196))
        op, b, dense, n = make_problem(shifted)
        assert (np.linalg.eigvalsh(dense) < 0).any()
        res = minres(op, b, rtol=1e-8, maxiter=3000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6


class TestTfqmr:
    def test_laplace2d(self):
        a = laplace2d(16, 16)
        op, b, dense, n = make_problem(a)
        res = tfqmr(op, b, rtol=1e-8, maxiter=3000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6

    def test_nonsymmetric(self):
        a = recirc2d(12, 12, diff=1e-1)
        op, b, dense, n = make_problem(a)
        res = tfqmr(op, b, rtol=1e-9, maxiter=3000)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6


class TestSstepGmres:
    @pytest.mark.parametrize("s", [2, 4])
    def test_matches_gmres_quality(self, s):
        from trilinos_tpu.solvers.sstep_gmres import sstep_gmres

        a = laplace2d(16, 16)
        op, b, dense, n = make_problem(a)
        res = sstep_gmres(op, b, s=s, t_blocks=30 // s, max_restarts=30,
                          rtol=1e-8)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7
        assert bool(res.converged)

    def test_nonsymmetric(self):
        from trilinos_tpu.solvers.sstep_gmres import sstep_gmres

        a = recirc2d(14, 14, diff=1e-2)
        op, b, dense, n = make_problem(a)
        res = sstep_gmres(op, b, s=4, t_blocks=10, max_restarts=40,
                          rtol=1e-8)
        assert true_rel_res(b, dense, res.x, n) <= 1e-6

    def test_with_prec(self):
        from trilinos_tpu.solvers.sstep_gmres import sstep_gmres

        a = laplace2d(14, 14)
        op, b, dense, n = make_problem(a)
        dinv = np.ones(b.shape[0]) * 0.25
        res = sstep_gmres(op, b, s=3, t_blocks=8, max_restarts=20,
                          prec=lambda v: jnp.asarray(dinv) * v, rtol=1e-8)
        assert true_rel_res(b, dense, res.x, n) <= 1e-7

    def test_fused_matrix_powers_basis(self):
        """basis_impl='fused' (single-HBM-pass Pallas matrix-powers
        kernel, interpreted on CPU) reproduces the loop basis: the
        per-cycle residual trajectory is identical, so resnorm/iters
        match exactly."""
        from trilinos_tpu.galeri import laplace3d
        from trilinos_tpu.solvers.sstep_gmres import sstep_gmres

        op = laplace3d(32, 32, 8, dtype=np.float32, fmt="stencil")
        npad = op.n_rows_pad
        b = np.zeros(npad, np.float32)
        b[:op.n_rows] = np.random.default_rng(5).standard_normal(
            op.n_rows)
        bj = jnp.asarray(b)
        kw = dict(s=4, t_blocks=4, max_restarts=8, rtol=1e-4)
        r_loop = sstep_gmres(op, bj, basis_impl="loop", **kw)
        r_fused = sstep_gmres(op, bj, basis_impl="fused", **kw)
        assert int(r_fused.iters) == int(r_loop.iters)
        np.testing.assert_allclose(float(r_fused.resnorm),
                                   float(r_loop.resnorm), rtol=1e-5)
        assert float(r_fused.resnorm) <= 1e-4 * float(
            jnp.linalg.norm(bj)) * 1.001 or not bool(r_fused.converged)

    def test_fused_basis_rejects_nonstencil(self):
        from trilinos_tpu.solvers.sstep_gmres import sstep_gmres

        a = laplace2d(14, 14)
        op, b, dense, n = make_problem(a)
        with pytest.raises(ValueError, match="fused"):
            sstep_gmres(op, b, basis_impl="fused")
