"""True block CG (shared block Krylov space — Belos BlockCGIter,
packages/belos/src/BelosBlockCGIter.hpp / BelosBlockCGSolMgr.hpp)."""
import numpy as np

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d, laplace3d
from trilinos_tpu.ops import choose_format, matvec as S
from trilinos_tpu.solvers import block_cg, cg


def _setup(gen, *dims, s=4, seed=0):
    a = gen(*dims)
    dev = choose_format(a)
    n, npad = a.shape[0], dev.n_rows_pad
    rng = np.random.default_rng(seed)
    b = np.zeros((npad, s))
    b[:n] = rng.standard_normal((n, s))
    return a, dev, n, jnp.asarray(b)


class TestBlockCg:
    def test_converges_and_solves(self):
        a, dev, n, b = _setup(laplace2d, 20, 18)
        r = block_cg(lambda v: S.spmv(dev, v), b, rtol=1e-9, maxiter=400)
        assert bool(jnp.all(r.converged))
        x = np.asarray(r.x)[:n]
        bn = np.asarray(b)[:n]
        rel = np.linalg.norm(bn - a.to_dense() @ x) / np.linalg.norm(bn)
        assert rel <= 2e-9

    def test_shared_space_beats_single_rhs(self):
        """The block space serves every column: block iterations <=
        the single-RHS CG count (typically strictly fewer)."""
        a, dev, n, b = _setup(laplace3d, 12, 12, 12, s=6)
        rb = block_cg(lambda v: S.spmv(dev, v), b, rtol=1e-8,
                      maxiter=400)
        r1 = cg(lambda v: S.spmv(dev, v), b[:, 0], rtol=1e-8,
                maxiter=400)
        assert bool(jnp.all(rb.converged))
        assert int(rb.iters) <= int(r1.iters)

    def test_dependent_columns_rank_robust(self):
        """Linearly dependent right-hand sides: the minimum-norm block
        coefficients keep the iteration finite (the reference deflates
        columns instead)."""
        a, dev, n, b = _setup(laplace2d, 16, 14, s=3)
        b = b.at[:, 2].set(2.0 * b[:, 0])  # duplicate direction
        r = block_cg(lambda v: S.spmv(dev, v), b, rtol=1e-8,
                     maxiter=400)
        assert bool(jnp.all(jnp.isfinite(r.x)))
        assert bool(jnp.all(r.converged))
        x = np.asarray(r.x)[:n]
        np.testing.assert_allclose(x[:, 2], 2.0 * x[:, 0], rtol=1e-6,
                                   atol=1e-9)

    def test_preconditioned(self):
        from trilinos_tpu import precond

        a, dev, n, b = _setup(laplace2d, 24, 24, s=4)
        # degree 1 (the Ifpack2 default) is a scaled-Jacobi step — a
        # SCALAR for the constant-diagonal Laplacian, which CG is
        # invariant to; degree 4 is a real polynomial preconditioner
        m = precond.create("CHEBYSHEV", a,
                           {"chebyshev: degree": 4}).compute()
        r = block_cg(lambda v: S.spmv(dev, v), b, prec=m, rtol=1e-8,
                     maxiter=200)
        r0 = block_cg(lambda v: S.spmv(dev, v), b, rtol=1e-8,
                      maxiter=200)
        assert bool(jnp.all(r.converged))
        assert int(r.iters) < int(r0.iters)

    def test_single_vector_rhs(self):
        a, dev, n, b2 = _setup(laplace2d, 12, 10, s=1)
        b = b2[:, 0]
        r = block_cg(lambda v: S.spmv(dev, v), b, rtol=1e-9)
        assert r.x.ndim == 1 and bool(r.converged)
        r_cg = cg(lambda v: S.spmv(dev, v), b, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(r.x), np.asarray(r_cg.x),
                                   rtol=1e-7, atol=1e-9)

    def test_factory_block_cg_is_true_block(self):
        from trilinos_tpu.solvers import LinearProblem
        from trilinos_tpu.solvers.factory import SolverManager

        mgr = SolverManager("Block CG", {"Convergence Tolerance": 1e-8})
        assert mgr.kind == "block_cg"
        a, dev, n, b = _setup(laplace2d, 14, 12, s=3)
        res = mgr.solve(LinearProblem(lambda v: S.spmv(dev, v), b))
        assert bool(jnp.all(res.converged))

    def test_distributed_block_cg(self):
        """The block driver runs unchanged through dist_solve (block
        reductions become psums over the mesh axis)."""
        import jax.numpy as jnp

        from trilinos_tpu.parallel import distmatrix as D
        from trilinos_tpu.parallel import driver as drv

        a = laplace2d(16, 16)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        n = a.shape[0]
        rng = np.random.default_rng(0)
        b = rng.standard_normal((n, 3))
        bg = jnp.asarray(np.stack(
            [dm.row_map.to_padded(b[:, j]) for j in range(3)], axis=1))
        r = drv.dist_solve(block_cg, dm, bg, mesh=mesh, rtol=1e-8,
                           maxiter=200)
        assert bool(jnp.all(r.converged))
        x = np.stack([dm.row_map.from_padded(np.asarray(r.x[:, j]))
                      for j in range(3)], axis=1)
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 2e-8
