"""CombineMode semantics for the Export-direction transfer
(reference: packages/tpetra/core/src/Tpetra_CombineMode.hpp:59-88,
Tpetra_Export_decl.hpp — reversal of an Import plan)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.parallel import distmatrix as D
from trilinos_tpu.parallel import driver as drv


def setup(n_shards, rng):
    a = laplace2d(12, 11)
    dm = D.distribute(a, n_shards)
    mesh = drv.make_mesh(n_shards)
    x = rng.standard_normal(a.shape[0])
    xg = jnp.asarray(dm.row_map.to_padded(x))
    return a, dm, mesh, xg, x


def run_export(dm, mesh, xg, n_shards, mode, scale):
    """exchange (import) then export ghosts*scale back with ``mode``."""

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(drv.AXIS), P(drv.AXIS)),
                       out_specs=P(drv.AXIS))
    def run(a_sh, x_loc):
        al = D.unstack_local(a_sh)
        ghosts = D.exchange(x_loc, al.plan, drv.AXIS, n_shards)
        return D.export_combine(x_loc * 0.0 + x_loc, ghosts * scale,
                                al.plan, drv.AXIS, n_shards, mode=mode)

    return run(dm, xg)


def ghost_counts(a, dm):
    """Host reference: how many shards ghost each global row."""
    rmap = dm.row_map
    n = a.shape[0]
    counts = np.zeros(n)
    rows_all = np.repeat(np.arange(n), a.row_lengths())
    for s in range(rmap.n_shards):
        lo, hi = rmap.shard_lo(s), rmap.shard_hi(s)
        sl = slice(a.row_ptr[lo], a.row_ptr[hi])
        cs = a.cols[sl].astype(np.int64)
        ghosts = np.unique(cs[(cs < lo) | (cs >= hi)])
        counts[ghosts] += 1
    return counts


@pytest.mark.parametrize("n_shards", [2, 4, 8])
class TestCombineModes:
    def test_add(self, n_shards, rng):
        a, dm, mesh, xg, x = setup(n_shards, rng)
        y = np.asarray(run_export(dm, mesh, xg, n_shards, "ADD", 1.0))
        got = dm.row_map.from_padded(y)
        counts = ghost_counts(a, dm)
        np.testing.assert_allclose(got, x * (1 + counts), rtol=1e-12)

    def test_zero_bypasses(self, n_shards, rng):
        a, dm, mesh, xg, x = setup(n_shards, rng)
        y = np.asarray(run_export(dm, mesh, xg, n_shards, "ZERO", 1.0))
        np.testing.assert_array_equal(y, np.asarray(xg))

    def test_replace(self, n_shards, rng):
        a, dm, mesh, xg, x = setup(n_shards, rng)
        y = np.asarray(run_export(dm, mesh, xg, n_shards, "REPLACE", 3.0))
        got = dm.row_map.from_padded(y)
        counts = ghost_counts(a, dm)
        exp = np.where(counts > 0, 3.0 * x, x)
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_absmax(self, n_shards, rng):
        a, dm, mesh, xg, x = setup(n_shards, rng)
        y = np.asarray(run_export(dm, mesh, xg, n_shards, "ABSMAX", -2.0))
        got = dm.row_map.from_padded(y)
        counts = ghost_counts(a, dm)
        exp = np.where(counts > 0, np.maximum(np.abs(x), 2 * np.abs(x)), x)
        np.testing.assert_allclose(got, exp, rtol=1e-12)
