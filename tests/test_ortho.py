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
    assert ortho.resolve_method("IMGS") == "MGS1"
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
