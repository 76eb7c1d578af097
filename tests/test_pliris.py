"""Distributed dense LU (Pliris analogue).

Reference behaviors: packages/pliris/src/Pliris.h (dense distributed
factor+solve with partial pivoting)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from trilinos_tpu.solvers.pliris import dense_solve, dist_dense_solve


def _mesh(p=8):
    return Mesh(np.array(jax.devices()[:p]), ("cols",))


def _system(n, seed=0, need_pivot=False):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    if need_pivot:
        # zero the leading diagonal entries so unpivoted LU would break
        a[0, 0] = 0.0
        a[1, 1] = 0.0
    else:
        a += n * np.eye(n)
    b = rng.standard_normal(n)
    return a, b


class TestPliris:
    def test_single_device(self):
        a, b = _system(64)
        x = np.asarray(dense_solve(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, atol=1e-9)

    @pytest.mark.parametrize("n,nb", [(128, 16), (256, 32)])
    def test_distributed_matches_numpy(self, n, nb):
        mesh = _mesh()
        a, b = _system(n, seed=1)
        x = np.asarray(dist_dense_solve(mesh, a, b, nb=nb))
        np.testing.assert_allclose(x, np.linalg.solve(a, b),
                                   rtol=1e-9, atol=1e-9)

    def test_partial_pivoting_required(self):
        """Zero leading diagonal entries: unpivoted LU would divide by
        zero; the pivoted distributed solve must still be accurate."""
        mesh = _mesh()
        a, b = _system(128, seed=2, need_pivot=True)
        x = np.asarray(dist_dense_solve(mesh, a, b, nb=16))
        assert np.all(np.isfinite(x))
        np.testing.assert_allclose(a @ x, b, atol=1e-8)

    def test_multiple_rhs(self):
        mesh = _mesh()
        a, _ = _system(128, seed=3)
        b = np.random.default_rng(4).standard_normal((128, 5))
        x = np.asarray(dist_dense_solve(mesh, a, b, nb=16))
        assert x.shape == (128, 5)
        np.testing.assert_allclose(a @ x, b, atol=1e-8)

    def test_panel_crossing_shards(self):
        """Panel width == columns/shard: every panel sits on a
        different owner."""
        mesh = _mesh()
        n = 64  # c = 8 columns/shard
        a, b = _system(n, seed=5)
        x = np.asarray(dist_dense_solve(mesh, a, b, nb=8))
        np.testing.assert_allclose(a @ x, b, atol=1e-9)

    def test_validation(self):
        mesh = _mesh()
        a, b = _system(64)
        with pytest.raises(ValueError, match="divisible"):
            dist_dense_solve(mesh, a[:60, :60], b[:60])
        with pytest.raises(ValueError, match="square"):
            dist_dense_solve(mesh, a[:, :32], b)
