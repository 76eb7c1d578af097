"""MiniTensor analogue: batched small-tensor math for constitutive models.

Reference behaviors: packages/minitensor/src/MiniTensor_LinearAlgebra.h
(inverse/det/invariants/polar/exp-log/eig_sym) and MiniTensor_Mechanics.h
(vol/dev, Piola transforms, ellipticity)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import trilinos_tpu.minitensor as mt


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("dim", [2, 3])
def test_inverse_det_batched(dim):
    a = _rand((5, 4, dim, dim)) + 3.0 * jnp.eye(dim)
    ainv = mt.inverse(a)
    ident = mt.dot(a, ainv)
    assert np.allclose(np.asarray(ident),
                       np.eye(dim), atol=5e-5)
    assert np.allclose(np.asarray(mt.det(a)),
                       np.linalg.det(np.asarray(a)), rtol=1e-4)


def test_invariants_cayley_hamilton():
    # A^3 - I1 A^2 + I2 A - I3 I = 0 for 3x3
    a = _rand((7, 3, 3), seed=1)
    i1, i2, i3 = mt.I1(a), mt.I2(a), mt.I3(a)
    a2, a3 = mt.dot(a, a), mt.dot(mt.dot(a, a), a)
    ch = (a3 - i1[..., None, None] * a2 + i2[..., None, None] * a
          - i3[..., None, None] * jnp.eye(3))
    assert np.max(np.abs(np.asarray(ch))) < 1e-4


def test_vol_dev_split():
    a = _rand((4, 3, 3), seed=2)
    assert np.allclose(np.asarray(mt.vol(a) + mt.dev(a)),
                       np.asarray(a), atol=1e-6)
    assert np.max(np.abs(np.asarray(mt.trace(mt.dev(a))))) < 1e-5


@pytest.mark.parametrize("dim", [2, 3])
def test_eigvals_sym_closed_form(dim):
    s = mt.sym(_rand((6, dim, dim), seed=3))
    got = np.asarray(mt.eigvals_sym(s))
    want = np.linalg.eigvalsh(np.asarray(s))
    assert np.allclose(got, want, atol=2e-5)
    # degenerate (isotropic) case: p == 0 branch
    iso = 2.5 * jnp.eye(dim)[None]
    assert np.allclose(np.asarray(mt.eigvals_sym(iso)), 2.5, atol=1e-6)


def test_exp_log_sym_roundtrip():
    s = mt.sym(_rand((5, 3, 3), seed=4)) + 4.0 * jnp.eye(3)  # SPD
    assert np.allclose(np.asarray(mt.exp_sym(mt.log_sym(s))),
                       np.asarray(s), rtol=1e-3, atol=1e-4)
    r = np.asarray(mt.sqrt_sym(s))
    assert np.allclose(r @ r, np.asarray(s), atol=1e-4)


def test_polar_decompositions():
    f = 0.6 * _rand((8, 3, 3), seed=5) + 2.0 * jnp.eye(3)
    assert bool(jnp.all(mt.det(f) > 0))  # proper deformation gradients
    r, u = mt.polar_right(f)
    v, r2 = mt.polar_left(f)
    fn = np.asarray(f)
    assert np.allclose(np.asarray(mt.dot(r, u)), fn, atol=1e-4)
    assert np.allclose(np.asarray(mt.dot(v, r2)), fn, atol=1e-4)
    rtr = np.asarray(mt.dot(mt.transpose(r), r))
    assert np.allclose(rtr, np.eye(3), atol=1e-5)
    # rotation log/exp roundtrip
    rn = np.asarray(mt.exp_skew_symmetric(mt.log_rotation(r)))
    assert np.allclose(rn, np.asarray(r), atol=1e-4)
    _, _, logv = mt.polar_left_logV(f)
    assert np.allclose(np.asarray(mt.exp_sym(logv)), np.asarray(v),
                       atol=1e-3)


def test_piola_transforms():
    f = _rand((4, 3, 3), seed=6) + 2.0 * jnp.eye(3)
    sigma = mt.sym(_rand((4, 3, 3), seed=7))
    p = mt.piola(f, sigma)
    back = mt.piola_inverse(f, p)
    assert np.allclose(np.asarray(back), np.asarray(sigma), atol=1e-4)
    # covariant pull-back then push-forward is identity
    u = _rand((4, 3), seed=8)
    w = mt.push_forward_covariant(f, mt.pull_back_covariant(f, u))
    assert np.allclose(np.asarray(w), np.asarray(u), atol=1e-4)
    t = mt.push_forward_contravariant(
        f, mt.pull_back_contravariant(f, sigma))
    assert np.allclose(np.asarray(t), np.asarray(sigma), atol=1e-4)


def test_elasticity_tensor_and_ellipticity():
    lam, mu, dim = 1.2, 0.8, 3
    c = mt.elasticity_tensor(lam, mu, dim)
    # C : eps reproduces isotropic Hooke's law
    eps = mt.sym(_rand((5, dim, dim), seed=9))
    sig = mt.dot42(jnp.broadcast_to(c, (5, dim, dim, dim, dim)), eps)
    want = (lam * np.trace(np.asarray(eps), axis1=-2, axis2=-1)
            [..., None, None] * np.eye(dim)
            + 2 * mu * np.asarray(eps))
    assert np.allclose(np.asarray(sig), want, atol=1e-5)
    # acoustic tensor of isotropic C has eigenvalues {mu, mu, lam+2mu}
    n = jnp.asarray([1.0, 0.0, 0.0])
    q = mt.acoustic_tensor(c, n)
    ev = np.sort(np.linalg.eigvalsh(np.asarray(q)))
    assert np.allclose(ev, [mu, mu, lam + 2 * mu], atol=1e-5)
    ok, m = mt.check_strong_ellipticity(c)
    assert bool(ok) and abs(float(m) - mu) < 1e-3
    bad = mt.elasticity_tensor(1.0, -0.5, dim)
    ok2, _ = mt.check_strong_ellipticity(bad)
    assert not bool(ok2)


def test_norms_and_solve():
    a = _rand((3, 3), seed=10) + 3 * jnp.eye(3)
    an = np.asarray(a)
    assert np.isclose(float(mt.norm(a)), np.linalg.norm(an), rtol=1e-5)
    assert np.isclose(float(mt.norm_1(a)),
                      np.abs(an).sum(0).max(), rtol=1e-5)
    assert np.isclose(float(mt.norm_infinity(a)),
                      np.abs(an).sum(1).max(), rtol=1e-5)
    b = _rand((3,), seed=11)
    x = mt.solve(a, b)
    assert np.allclose(an @ np.asarray(x), np.asarray(b), atol=1e-4)
    assert np.isclose(float(mt.cond(a)), np.linalg.cond(an), rtol=1e-3)


def test_jit_grad_compose():
    """Constitutive-model shape: neo-Hookean energy via minitensor ops is
    jit+grad composable (the Sacado/autodiff story, batched)."""
    lam, mu = 1.0, 0.5

    def energy(f):
        j = mt.det(f)
        c = mt.dot(mt.transpose(f), f)
        return jnp.sum(0.5 * mu * (mt.trace(c) - 3.0 - 2 * jnp.log(j))
                       + 0.5 * lam * jnp.log(j) ** 2)

    f = _rand((10, 3, 3), seed=12) * 0.1 + jnp.eye(3)
    p = jax.jit(jax.grad(energy))(f)
    assert p.shape == f.shape and bool(jnp.all(jnp.isfinite(p)))
    # at F = I the stress is zero
    p0 = jax.grad(energy)(jnp.eye(3)[None])
    assert np.max(np.abs(np.asarray(p0))) < 1e-5


def test_log_rotation_near_pi():
    """Angle-pi rotations: skew(R) ~ 0, the axis must come from the
    symmetric part (MiniTensor log_rotation_pi)."""
    # exact pi rotations about each axis and a skew axis
    axes = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
            np.array([0, 0, 1.0]),
            np.array([1.0, 2.0, -0.5]) / np.linalg.norm([1, 2, -0.5])]
    for ax in axes:
        for th in (np.pi, np.pi - 1e-6):
            k = np.array([[0, -ax[2], ax[1]],
                          [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            r = (np.eye(3) + np.sin(th) * k
                 + (1 - np.cos(th)) * (k @ k))
            rj = jnp.asarray(r, jnp.float32)[None]
            back = np.asarray(mt.exp_skew_symmetric(mt.log_rotation(rj)))
            assert np.allclose(back[0], r, atol=5e-4), (ax, th)
    # identity stays zero
    lg = np.asarray(mt.log_rotation(jnp.eye(3)[None]))
    assert np.max(np.abs(lg)) < 1e-6
