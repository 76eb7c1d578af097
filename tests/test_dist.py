"""Distributed-layer tests on the virtual 8-device CPU mesh.

The analogue of the reference's NUM_MPI_PROCS-parameterized test pattern
(packages/tpetra/core/test/ImportExport/CMakeLists.txt:18-144 — same body
run at 1,2,4,8 ranks): every test is parameterized over shard counts and
checks the distributed result against the serial one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trilinos_tpu.galeri import laplace2d, laplace3d
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops import matvec as S
from trilinos_tpu.parallel.map import Map
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv
from trilinos_tpu.solvers import cg, cg_pipeline, gmres


def random_square_csr(rng, n, density=0.05):
    nnz = max(int(n * n * density), n)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    # make it diagonally dominant for solver tests
    d_rows = np.arange(n)
    return F.CsrHost.from_coo(
        np.concatenate([rows, d_rows]), np.concatenate([cols, d_rows]),
        np.concatenate([vals, 10.0 * np.ones(n)]), (n, n))


class TestMap:
    @pytest.mark.parametrize("n,p", [(100, 4), (64, 8), (7, 4)])
    def test_partition_covers(self, n, p):
        m = Map.uniform(n, p)
        total = sum(m.n_owned(s) for s in range(p))
        assert total == n
        for s in range(p):
            assert m.n_owned(s) <= m.n_local_pad

    def test_padded_round_trip(self, rng):
        m = Map.uniform(37, 4)
        x = rng.standard_normal(37)
        np.testing.assert_array_equal(m.from_padded(m.to_padded(x)), x)

    def test_owner_of(self):
        m = Map.uniform(100, 4)
        np.testing.assert_array_equal(m.owner_of([0, 24, 25, 99]),
                                      [0, 0, 1, 3])


@pytest.mark.parametrize("n_shards", [2, 4, 8])
class TestDistSpmv:
    def test_stencil_matches_serial(self, n_shards, rng):
        a = laplace2d(12, 11)
        dm = D.distribute(a, n_shards)
        assert dm.plan.mode in ("ppermute", "a2a")
        mesh = drv.make_mesh(n_shards)
        x = rng.standard_normal(a.shape[0])
        xp = jnp.asarray(dm.row_map.to_padded(x))
        y = drv.dist_spmv(dm, xp, mesh)
        got = dm.row_map.from_padded(np.asarray(y))
        np.testing.assert_allclose(got, a.to_dense() @ x, rtol=1e-12)

    def test_random_matrix_a2a(self, n_shards, rng):
        a = random_square_csr(rng, 60)
        dm = D.distribute(a, n_shards, fmt="ell")
        mesh = drv.make_mesh(n_shards)
        x = rng.standard_normal(60)
        xp = jnp.asarray(dm.row_map.to_padded(x))
        y = drv.dist_spmv(dm, xp, mesh)
        got = dm.row_map.from_padded(np.asarray(y))
        np.testing.assert_allclose(got, a.to_dense() @ x, rtol=1e-11)

    def test_multivector(self, n_shards, rng):
        a = laplace2d(8, 9)
        dm = D.distribute(a, n_shards)
        mesh = drv.make_mesh(n_shards)
        x = rng.standard_normal((a.shape[0], 3))
        xp = jnp.asarray(dm.row_map.to_padded(x))
        y = drv.dist_spmv(dm, xp, mesh)
        got = dm.row_map.from_padded(np.asarray(y))
        np.testing.assert_allclose(got, a.to_dense() @ x, rtol=1e-12)


class TestDistBsr:
    """Distributed BlockCrsMatrix analogue: blocked interior apply +
    scalar halo (Tpetra_BlockCrsMatrix_decl.hpp:53)."""

    @pytest.mark.parametrize("n_shards", [2, 4])
    def test_bsr_apply_matches_serial(self, n_shards, rng):
        from trilinos_tpu.galeri import elasticity2d
        from trilinos_tpu.ops.formats import BsrMatrix

        a = elasticity2d(8, 8, e_mod=1.0)   # n = 128, b = 2
        dm = D.distribute(a, n_shards, fmt="bsr", block_size=2)
        assert isinstance(dm.interior, BsrMatrix)
        mesh = drv.make_mesh(n_shards)
        x = rng.standard_normal(a.shape[0])
        xp = jnp.asarray(dm.row_map.to_padded(x))
        y = drv.dist_spmv(dm, xp, mesh)
        got = dm.row_map.from_padded(np.asarray(y))
        dense = a.to_dense() @ x
        np.testing.assert_allclose(got, dense, rtol=1e-10,
                                   atol=1e-10 * np.abs(dense).max())

    def test_bsr_jacobi_gmres_solve(self, rng):
        from trilinos_tpu.galeri import elasticity2d

        a = elasticity2d(8, 6, e_mod=1.0)   # n = 96
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 4, fmt="bsr", block_size=2)
        mesh = drv.make_mesh(4)
        prec = drv.dist_jacobi(a, dm.row_map)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(gmres, dm, bg, mesh=mesh, prec=prec,
                             rtol=1e-9, maxiter=400)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1e-7, rel

    def test_block_misalignment_rejected(self):
        a = laplace2d(5, 5)                 # n = 25: odd shard sizes
        with pytest.raises(ValueError):
            D.distribute(a, 2, fmt="bsr", block_size=2)


class TestDistSolve:
    @pytest.mark.parametrize("n_shards", [4, 8])
    def test_cg_matches_serial(self, n_shards, rng):
        a = laplace2d(20, 20)
        n = a.shape[0]
        b = rng.standard_normal(n)
        # serial
        dev = F.csr_to_dia(a)
        bp = np.zeros(dev.n_rows_pad)
        bp[:n] = b
        serial = cg(lambda v: S.spmv(dev, v), jnp.asarray(bp), rtol=1e-10)
        # distributed
        dm = D.distribute(a, n_shards)
        mesh = drv.make_mesh(n_shards)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-10)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1.1e-10
        assert abs(int(res.iters) - int(serial.iters)) <= 2

    def test_cg_condest_dist(self, rng):
        """dist_solve threads the replicated condest leaf through the
        shard_map out_specs; the distributed estimate must match the
        serial AZ_cg_condnum value (coefficients are psum'd, identical
        per shard)."""
        a = laplace2d(20, 20)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dev = F.csr_to_dia(a)
        bp = np.zeros(dev.n_rows_pad)
        bp[:n] = b
        serial = cg(lambda v: S.spmv(dev, v), jnp.asarray(bp),
                    rtol=1e-10, condest_window=200)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-10,
                             condest_window=200)
        assert res.condest is not None
        np.testing.assert_allclose(float(res.condest),
                                   float(serial.condest), rtol=1e-8)

    def test_pipelined_cg_dist(self, rng):
        a = laplace3d(8, 8, 8)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 8)
        mesh = drv.make_mesh(8)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(cg_pipeline, dm, bg, mesh=mesh, rtol=1e-9)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1e-8

    def test_gmres_with_dist_jacobi(self, rng):
        a = laplace2d(16, 16)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        prec = drv.dist_jacobi(a, dm.row_map)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(gmres, dm, bg, mesh=mesh, prec=prec,
                             restart=30, rtol=1e-9)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1.1e-9

    def test_gmres_bf16_basis_distributed(self, rng):
        """Narrow (bf16) Krylov-basis storage under shard_map: the
        true-residual-gated restarts refine past eps(bf16) exactly as
        on one chip."""
        a = laplace2d(16, 16)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        res = drv.dist_solve(gmres, dm, bg, mesh=mesh, restart=30,
                             rtol=1e-6, maxiter=600,
                             basis_dtype=jnp.bfloat16)
        assert bool(res.converged)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1e-6

    def test_cg_with_dist_chebyshev(self, rng):
        a = laplace2d(16, 16)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        prec = drv.dist_chebyshev(a, dm.row_map, lmax=1.95, degree=3)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        plain = drv.dist_solve(cg, dm, bg, mesh=mesh, rtol=1e-9)
        res = drv.dist_solve(cg, dm, bg, mesh=mesh, prec=prec, rtol=1e-9)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1.1e-9
        assert int(res.iters) < int(plain.iters)


class TestPlanInternals:
    def test_stencil_uses_ppermute(self):
        a = laplace2d(10, 10)
        dm = D.distribute(a, 4)
        assert dm.plan.mode == "ppermute"
        # contiguous rows of a 5-point stencil only talk to +-1 neighbors
        assert set(dm.plan.offsets) <= {1, 3}  # mod-4 arithmetic: -1 ≡ 3

    def test_single_shard_degenerate(self, rng):
        a = laplace2d(6, 6)
        dm = D.distribute(a, 1)
        mesh = drv.make_mesh(1)
        x = rng.standard_normal(36)
        xp = jnp.asarray(dm.row_map.to_padded(x))
        y = drv.dist_spmv(dm, xp, mesh)
        np.testing.assert_allclose(dm.row_map.from_padded(np.asarray(y)),
                                   a.to_dense() @ x, rtol=1e-12)


class TestDistIlu:
    def test_gmres_with_dist_ilu0(self, rng):
        from trilinos_tpu.galeri import recirc2d

        a = recirc2d(16, 16, diff=1e-2)
        n = a.shape[0]
        b = rng.standard_normal(n)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        plain = drv.dist_solve(gmres, dm, bg, mesh=mesh, restart=40,
                               rtol=1e-8, maxiter=3000)
        prec = drv.dist_ilu0(a, dm.row_map, sweeps=10)
        res = drv.dist_solve(gmres, dm, bg, mesh=mesh, prec=prec,
                             restart=40, rtol=1e-8, maxiter=3000)
        x = dm.row_map.from_padded(np.asarray(res.x))
        rel = np.linalg.norm(b - a.to_dense() @ x) / np.linalg.norm(b)
        assert rel <= 1e-6
        assert int(res.iters) < int(plain.iters)


class TestDistIluK:
    def test_dist_iluk_fill_reduces_iterations(self):
        """fill_level plumbs through the distributed local-ILU path."""
        from trilinos_tpu.galeri import recirc2d
        from trilinos_tpu.parallel import distmatrix as D
        from trilinos_tpu.parallel import driver as drv
        from trilinos_tpu.solvers import gmres

        a = recirc2d(16, 16, diff=1e-2)
        n = a.shape[0]
        b = np.random.default_rng(3).standard_normal(n)
        dm = D.distribute(a, 4)
        mesh = drv.make_mesh(4)
        bg = jnp.asarray(dm.row_map.to_padded(b))
        its = {}
        for k in (0, 2):
            prec = drv.dist_ilu0(a, dm.row_map, sweeps=8, fill_level=k)
            res = drv.dist_solve(gmres, dm, bg, mesh=mesh, prec=prec,
                                 rtol=1e-8, maxiter=1000, restart=30)
            assert bool(res.converged)
            its[k] = int(res.iters)
        assert its[2] < its[0]
