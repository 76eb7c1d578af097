"""Native C++ kernel tests: parity with the pure-Python fallbacks."""
import io

import numpy as np
import pytest

from trilinos_tpu import native
from trilinos_tpu.galeri import laplace2d, recirc2d
from trilinos_tpu.io import read_sparse, write_sparse
from trilinos_tpu.ops import formats as F
from trilinos_tpu.ops import matrix_ops as MO


@pytest.fixture(scope="module")
def have_native():
    if native.lib() is None:
        pytest.skip("native library unavailable (no g++?)")
    return True


class TestNativeMM:
    def test_round_trip(self, have_native, tmp_path, rng):
        a = laplace2d(9, 7)
        p = tmp_path / "m.mtx"
        write_sparse(str(p), a)
        got = native.read_mm_native(str(p))
        assert got is not None
        rows, cols, vals, shape, symm = got
        b = F.CsrHost.from_coo(rows, cols, vals, shape)
        np.testing.assert_allclose(b.to_dense(), a.to_dense())

    def test_read_sparse_uses_native(self, have_native, tmp_path):
        a = laplace2d(5, 5)
        p = tmp_path / "m.mtx"
        write_sparse(str(p), a)
        b = read_sparse(str(p))
        np.testing.assert_allclose(b.to_dense(), a.to_dense())

    def test_reference_file(self, have_native):
        import os

        p = "/root/reference/packages/isorropia/test/mtx/west0067.mtx"
        if not os.path.exists(p):
            pytest.skip("reference matrix unavailable")
        import scipy.io as sio

        np.testing.assert_allclose(read_sparse(p).to_dense(),
                                   sio.mmread(p).toarray())


class TestNativeIlu0:
    def test_matches_python_fallback(self, have_native, monkeypatch):
        from trilinos_tpu import precond

        a = recirc2d(8, 8, diff=1e-1)
        l_n, u_n = precond.ilu0_factor(a)
        # force the python path
        monkeypatch.setattr("trilinos_tpu.native.ilu0_native",
                            lambda *args: None)
        l_p, u_p = precond.ilu0_factor(a)
        np.testing.assert_allclose(l_n.to_dense(), l_p.to_dense(),
                                   atol=1e-12)
        np.testing.assert_allclose(u_n.to_dense(), u_p.to_dense(),
                                   atol=1e-12)

    def test_tridiag_exact(self, have_native):
        from trilinos_tpu.galeri import laplace1d
        from trilinos_tpu import precond

        a = laplace1d(30)
        L, U = precond.ilu0_factor(a)
        np.testing.assert_allclose(L.to_dense() @ U.to_dense(),
                                   a.to_dense(), atol=1e-12)


class TestNativeSpgemm:
    def test_matches_dense(self, have_native, rng):
        m, k, n = 20, 15, 17
        def rnd(r, c):
            nnz = r * c // 5
            return F.CsrHost.from_coo(rng.integers(0, r, nnz),
                                      rng.integers(0, c, nnz),
                                      rng.standard_normal(nnz), (r, c))
        a, b = rnd(m, k), rnd(k, n)
        c = MO.spgemm(a, b)
        np.testing.assert_allclose(c.to_dense(), a.to_dense() @ b.to_dense(),
                                   atol=1e-12)


class TestNativeIlut:
    def test_matches_python_fallback(self, have_native, monkeypatch):
        from trilinos_tpu.precond.ilut import ilut_factor

        a = recirc2d(10, 10, diff=1e-1)
        l_n, u_n = ilut_factor(a, fill=2.0, droptol=1e-3)
        monkeypatch.setattr("trilinos_tpu.native.ilut_native",
                            lambda *args: None)
        l_p, u_p = ilut_factor(a, fill=2.0, droptol=1e-3)
        np.testing.assert_allclose(l_n.to_dense(), l_p.to_dense(),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(u_n.to_dense(), u_p.to_dense(),
                                   rtol=1e-12, atol=1e-14)

    def test_precond_quality(self, have_native):
        """Native-factored ILUT must reduce CG iterations vs none."""
        import jax.numpy as jnp
        from trilinos_tpu.ops import choose_format, spmv
        from trilinos_tpu.precond import create
        from trilinos_tpu.solvers import cg

        a = laplace2d(24, 24)
        dev = choose_format(a)
        m = create("ILUT", a, {"fact: drop tolerance": 1e-4})
        m.initialize()
        m.compute()
        n, npad = a.shape[0], dev.n_rows_pad
        b = np.zeros(npad)
        b[:n] = np.random.default_rng(0).standard_normal(n)
        plain = cg(lambda x: spmv(dev, x), jnp.asarray(b), rtol=1e-8,
                   maxiter=500)
        prec = cg(lambda x: spmv(dev, x), jnp.asarray(b), rtol=1e-8,
                  maxiter=500, prec=m.apply)
        assert bool(prec.converged.all())
        assert int(prec.iters) < int(plain.iters)


class TestNativeGhostSlots:
    def test_matches_numpy(self, have_native, rng):
        bc = rng.integers(100, 10_000, 500).astype(np.int64)
        gids, slots = native.ghost_slots_native(bc)
        want_gids = np.unique(bc)
        np.testing.assert_array_equal(gids, want_gids)
        np.testing.assert_array_equal(want_gids[slots], bc)

    def test_empty(self, have_native):
        gids, slots = native.ghost_slots_native(np.zeros(0, np.int64))
        assert len(gids) == 0 and len(slots) == 0


class TestNativeGzip:
    def test_gz_round_trip(self, have_native, tmp_path):
        import gzip as _gz

        a = laplace2d(9, 7)
        p = tmp_path / "m.mtx"
        write_sparse(str(p), a)
        gz = tmp_path / "m.mtx.gz"
        with open(p, "rb") as f, _gz.open(gz, "wb") as g:
            g.write(f.read())
        got = native.read_mm_native(str(gz))
        assert got is not None
        rows, cols, vals, shape, symm = got
        b = F.CsrHost.from_coo(rows, cols, vals, shape)
        np.testing.assert_allclose(b.to_dense(), a.to_dense())
