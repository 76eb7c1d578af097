"""Compensated (double-single) reduction tests.

VERDICT r3 #10 / SURVEY hard part #5: error-free-transformation dots
(ops/compensated.py) vs f64 oracles, wiring into cg/gmres, and the
distributed psum_ff path. End-to-end attainability findings are
documented in docs/PRECISION.md (the honest result: reductions were not
the attainability floor; gains are at the reduction level).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.ops import compensated as C
from trilinos_tpu.parallel.comm import SerialComm


def f32(x):
    return jnp.asarray(np.asarray(x, np.float32))


class TestPrimitives:
    def test_two_sum_exact(self, rng):
        a = f32(rng.standard_normal(1000) * 1e6)
        b = f32(rng.standard_normal(1000))
        s, e = C.two_sum(a, b)
        # a+b == s+e exactly: verify in f64
        lhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
        rhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(lhs, rhs)

    def test_two_prod_exact(self, rng):
        a = f32(rng.standard_normal(1000))
        b = f32(rng.standard_normal(1000))
        p, e = C.two_prod(a, b)
        lhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        rhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(lhs, rhs)

    @pytest.mark.parametrize("n", [1, 2, 3, 7, 1000, 4097])
    def test_comp_sum_sizes(self, rng, n):
        x = f32(rng.standard_normal(n))
        hi, lo = C.comp_sum(x)
        exact = np.sum(np.asarray(x, np.float64))
        got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
        assert abs(got - exact) <= 4 * np.finfo(np.float32).eps * max(
            abs(exact), float(jnp.sum(jnp.abs(x))) * 1e-3)

    def test_comp_dot_beats_plain_50x(self, rng):
        n = 100_000
        x = f32(rng.standard_normal(n))
        y = f32(rng.standard_normal(n))
        exact = np.dot(np.asarray(x, np.float64), np.asarray(y, np.float64))
        plain = float(jnp.dot(x, y))
        comp = float(C.comp_dot_global(SerialComm(), x, y))
        err_plain = abs(plain - exact)
        err_comp = abs(comp - exact)
        assert err_comp * 50 <= max(err_plain,
                                    abs(exact) * 1e-9)

    def test_comp_dot_cancellation(self, rng):
        n = 10_000
        body = rng.standard_normal(n)
        x = f32(np.concatenate([[1e8], body, [-1e8]]))
        y = jnp.ones_like(x)
        exact = np.sum(np.asarray(x, np.float64))
        comp = float(C.comp_dot_global(SerialComm(), x, y))
        plain = float(jnp.sum(x))
        assert abs(comp - exact) < 1e-2
        assert abs(plain - exact) > 1e-1  # plain genuinely loses here

    def test_comp_dot_columnwise(self, rng):
        x = f32(rng.standard_normal((500, 3)))
        y = f32(rng.standard_normal((500, 3)))
        got = np.asarray(C.comp_dot_global(SerialComm(), x, y))
        exact = np.einsum("nk,nk->k", np.asarray(x, np.float64),
                          np.asarray(y, np.float64))
        np.testing.assert_allclose(got, exact, rtol=1e-6)


class TestDistributed:
    def test_psum_ff_matches_serial(self, rng):
        """Sharded compensated dot == serial compensated dot (the hi/lo
        pair rides one psum per word)."""
        import functools

        import jax
        from jax.sharding import PartitionSpec as Pspec

        from trilinos_tpu.parallel.comm import AxisComm
        from trilinos_tpu.parallel.driver import make_mesh

        n = 4 * 1024
        x = f32(rng.standard_normal(n))
        y = f32(rng.standard_normal(n))
        mesh = make_mesh(4)
        comm = AxisComm("rows", 4)

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(Pspec("rows"), Pspec("rows")),
                           out_specs=Pspec())
        def dist_dot(xl, yl):
            return C.comp_dot_global(comm, xl, yl)

        got = float(dist_dot(x, y))
        want = float(C.comp_dot_global(SerialComm(), x, y))
        # shard boundaries reorder the tree; agreement to ~eps of result
        assert abs(got - want) <= 1e-5 * max(abs(want), 1.0)


class TestSolverWiring:
    def test_cg_compensated_converges(self, rng):
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops import matvec as S
        from trilinos_tpu.solvers import cg

        a = F.csr_to_dia(laplace2d(16, 16), dtype=np.float32)
        b = f32(np.r_[rng.standard_normal(a.shape[0]),
                      np.zeros(a.n_rows_pad - a.shape[0])])
        op = lambda x: S.spmv(a, x)
        r_p = cg(op, b, rtol=1e-5, maxiter=800)
        r_c = cg(op, b, rtol=1e-5, maxiter=800, compensated=True)
        assert bool(r_c.converged)
        np.testing.assert_allclose(np.asarray(r_c.x), np.asarray(r_p.x),
                                   atol=1e-4)

    def test_gmres_compensated_converges(self, rng):
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops import matvec as S
        from trilinos_tpu.solvers import gmres

        a = F.csr_to_ell(laplace2d(12, 12), dtype=np.float32)
        b = f32(np.r_[rng.standard_normal(a.shape[0]),
                      np.zeros(a.n_rows_pad - a.shape[0])])
        op = lambda x: S.spmv(a, x)
        r_c = gmres(op, b, rtol=1e-5, restart=20, maxiter=200,
                    compensated=True)
        assert bool(r_c.converged)

    def test_dist_solve_compensated(self, rng):
        """compensated=True works through dist_solve/shard_map."""
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.parallel import distmatrix as D
        from trilinos_tpu.parallel import driver as drv
        from trilinos_tpu.solvers import cg

        a = laplace2d(12, 12)
        dm = D.distribute(a, 4, dtype=np.float32)
        mesh = drv.make_mesh(4)
        b = rng.standard_normal(a.shape[0]).astype(np.float32)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-4,
                             maxiter=400, compensated=True)
        assert bool(res.converged)
