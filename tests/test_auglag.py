"""Equality-constrained optimization (ROL Type-E augmented Lagrangian,
ROL_AugmentedLagrangianStep.hpp)."""
import numpy as np

import jax.numpy as jnp

from trilinos_tpu.optim import augmented_lagrangian


def test_quadratic_with_linear_constraint():
    """min 1/2 x'Qx - b'x  s.t.  Ax = d — KKT solution known exactly."""
    rng = np.random.default_rng(0)
    n, m = 8, 3
    q = rng.standard_normal((n, n))
    q = q @ q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    a = rng.standard_normal((m, n))
    d = rng.standard_normal(m)
    # stationarity Qx - b + A'lam = 0 with Ax = d:
    kkt = np.block([[q, a.T], [a, np.zeros((m, m))]])
    sol = np.linalg.solve(kkt, np.concatenate([b, d]))
    x_star, lam_star = sol[:n], sol[n:]

    qj, bj, aj, dj = map(jnp.asarray, (q, b, a, d))
    res, lam = augmented_lagrangian(
        lambda x: 0.5 * x @ (qj @ x) - bj @ x,
        lambda x: aj @ x - dj,
        jnp.zeros(n), ctol=1e-10, gtol=1e-10)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-7)
    # multiplier estimate matches the KKT multiplier
    np.testing.assert_allclose(np.asarray(lam), lam_star, atol=1e-5)


def test_rosenbrock_on_circle():
    """Rosenbrock restricted to the unit circle: feasibility to ctol and
    stationarity of the Lagrangian."""
    def rosen(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    def circle(x):
        return jnp.atleast_1d(x @ x - 1.0)

    res, lam = augmented_lagrangian(rosen, circle,
                                    jnp.asarray([0.5, 0.5]),
                                    ctol=1e-10, gtol=1e-8)
    assert res.converged
    x = np.asarray(res.x)
    assert abs(x @ x - 1.0) < 1e-9
    # known constrained minimum of Rosenbrock on the unit circle
    np.testing.assert_allclose(x, [0.7864, 0.6177], atol=1e-3)


def test_multiple_constraints():
    """Projection problem: closest point to p on {x: sum x = 1,
    x0 - x1 = 0} has a closed form."""
    p = jnp.asarray([3.0, -1.0, 2.0])

    def obj(x):
        return 0.5 * jnp.vdot(x - p, x - p)

    def con(x):
        return jnp.asarray([jnp.sum(x) - 1.0, x[0] - x[1]])

    res, _ = augmented_lagrangian(obj, con, jnp.zeros(3),
                                  ctol=1e-10, gtol=1e-10)
    assert res.converged
    # solve the KKT system directly
    a = np.array([[1.0, 1, 1], [1, -1, 0]])
    kkt = np.block([[np.eye(3), a.T], [a, np.zeros((2, 2))]])
    sol = np.linalg.solve(kkt, np.concatenate([np.asarray(p), [1.0, 0]]))
    np.testing.assert_allclose(np.asarray(res.x), sol[:3], atol=1e-7)


def test_infeasible_stationary_reported():
    """Unreachable constraint: must NOT report converged."""
    res, _ = augmented_lagrangian(
        lambda x: jnp.vdot(x, x),
        lambda x: jnp.atleast_1d(x[0] ** 2 + 1.0),  # never zero
        jnp.ones(2), maxouter=6)
    assert not res.converged
