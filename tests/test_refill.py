"""Values-only refill (graph/plan reuse) tests.

VERDICT r3 #4: the resumeFill/fillComplete graph-reuse contract
(Tpetra_CrsMatrix_decl.hpp:2897) + the Ifpack2 initialize/compute split
(Ifpack2_Preconditioner.hpp:81-97) — a nonlinear outer loop must pay for
ONE halo-plan build total.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv
from trilinos_tpu.parallel.map import Map


def perturbed(a, rng, scale=0.3):
    """Same pattern, new values (keeps diagonal dominance)."""
    vals = a.vals * (1.0 + scale * rng.uniform(-1, 1, len(a.vals)))
    return F.CsrHost(a.row_ptr, a.cols, vals, a.shape)


class TestRefillValues:
    @pytest.mark.parametrize("fmt", ["dia", "ell", "bsr"])
    def test_refilled_spmv_matches_fresh_distribute(self, rng, fmt):
        a = laplace2d(16, 16)
        n_shards = 4
        kw = dict(block_size=2) if fmt == "bsr" else {}
        dm = D.distribute(a, n_shards, fmt=fmt, **kw)
        plan = D.build_refill(a, dm)

        a_new = perturbed(a, rng)
        builds_before = D.PLAN_BUILD_COUNT
        dm_refilled = D.refill_values(dm, plan, a_new.vals)
        assert D.PLAN_BUILD_COUNT == builds_before  # NO plan rebuild

        dm_fresh = D.distribute(a_new, n_shards, fmt=fmt, **kw)
        mesh = drv.make_mesh(n_shards)
        x = rng.standard_normal(a.shape[0])
        xg = jnp.asarray(dm.row_map.to_padded(x))
        y_ref = np.asarray(drv.dist_spmv(dm_fresh, xg, mesh))
        y_fill = np.asarray(drv.dist_spmv(dm_refilled, xg, mesh))
        np.testing.assert_allclose(y_fill, y_ref, atol=1e-12)

    def test_wrong_nnz_raises(self, rng):
        a = laplace2d(8, 8)
        dm = D.distribute(a, 2)
        plan = D.build_refill(a, dm)
        with pytest.raises(ValueError, match="value count"):
            D.refill_values(dm, plan, a.vals[:-1])

    def test_newton_style_loop_builds_one_plan(self, rng):
        """A mock Newton loop: Jacobian values change every step; the
        frozen plan is reused — ONE build_halo_plans call total (plus the
        one inside build_refill's symbolic pass)."""
        from trilinos_tpu.solvers import cg

        a = laplace2d(12, 12)
        n_shards = 4
        dm = D.distribute(a, n_shards)
        plan = D.build_refill(a, dm)
        mesh = drv.make_mesh(n_shards)
        b = rng.standard_normal(a.shape[0])
        bg = jnp.asarray(dm.row_map.to_padded(b))

        builds_before = D.PLAN_BUILD_COUNT
        for _ in range(4):  # 4 "Newton steps" with fresh values
            a = perturbed(a, rng, scale=0.05)
            dm = D.refill_values(dm, plan, a.vals)
            res = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-6,
                                 maxiter=300)
            assert bool(res.converged)
        assert D.PLAN_BUILD_COUNT == builds_before


class TestPrecondRecompute:
    @pytest.mark.parametrize("name", ["RELAXATION", "CHEBYSHEV", "RILUK"])
    def test_recompute_matches_fresh(self, rng, name):
        from trilinos_tpu import precond

        a = laplace2d(12, 12)
        a_new = perturbed(a, rng)
        m = precond.create(name, a).compute()
        m.recompute(a_new)
        fresh = precond.create(name, a_new).compute()
        import trilinos_tpu.ops.formats as FF

        npad = FF.round_up(a.shape[0], FF.ROW_ALIGN)
        x = np.zeros(npad)
        x[:a.shape[0]] = rng.standard_normal(a.shape[0])
        xj = jnp.asarray(x)
        np.testing.assert_allclose(np.asarray(m.apply(xj)),
                                   np.asarray(fresh.apply(xj)), atol=1e-12)

    def test_pattern_change_raises(self, rng):
        from trilinos_tpu import precond

        a = laplace2d(10, 10)
        m = precond.create("RELAXATION", a).compute()
        other = laplace2d(10, 11)
        with pytest.raises(ValueError, match="sparsity"):
            m.recompute(other)
