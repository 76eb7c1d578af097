"""Optimization tests (ROL analogue).

Mirrors the reference's ROL test pattern (packages/rol/test/step/:
run each step type on the Zakharov/Rosenbrock zoo from
rol/src/zoo/ROL_TestObjectives.hpp and check gnorm/solution error)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trilinos_tpu.optim import (lbfgs, projected_gradient,
                                trust_region_newton)


def rosenbrock(x):
    """The ROL zoo's Rosenbrock (ROL_Rosenbrock.hpp), any even dim."""
    return jnp.sum(100.0 * (x[1::2] - x[::2] ** 2) ** 2
                   + (1.0 - x[::2]) ** 2)


def quadratic_factory(n, cond=100.0, seed=0):
    rng = np.random.default_rng(seed)
    d = np.logspace(0, np.log10(cond), n)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = q @ np.diag(d) @ q.T
    b = rng.standard_normal(n)
    a_j, b_j = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    xstar = np.linalg.solve(a, b)
    return (lambda x: 0.5 * x @ (a_j @ x) - b_j @ x), xstar


class TestTrustRegion:
    def test_quadratic_exact(self):
        obj, xstar = quadratic_factory(64)
        res = trust_region_newton(obj, jnp.zeros(64, jnp.float32),
                                  gtol=1e-4)
        assert res.converged
        assert np.linalg.norm(np.asarray(res.x) - xstar) < 1e-3

    def test_rosenbrock_2d(self):
        res = trust_region_newton(rosenbrock,
                                  jnp.asarray([-1.2, 1.0]), gtol=1e-6,
                                  maxiter=200)
        assert res.converged, (res.gnorm, res.iters)
        assert np.allclose(np.asarray(res.x), 1.0, atol=1e-4)

    def test_rosenbrock_100d_f64(self):
        x0 = jnp.asarray(np.full(100, -1.2))   # f64 under test x64
        res = trust_region_newton(rosenbrock, x0, gtol=1e-8,
                                  maxiter=300)
        assert res.converged, (res.gnorm, res.iters)
        assert np.allclose(np.asarray(res.x), 1.0, atol=1e-6)

    def test_rosenbrock_100d_f32_floor(self):
        """f32: the gradient noise floor for this objective is ~2e-4;
        assert the solver reaches the solution even though gnorm can't
        reach fp64-style tolerances (documents the f32 contract)."""
        x0 = jnp.asarray(np.full(100, -1.2), jnp.float32)
        res = trust_region_newton(rosenbrock, x0, gtol=5e-4,
                                  maxiter=300)
        assert np.allclose(np.asarray(res.x), 1.0, atol=1e-3)

    def test_negative_curvature_escape(self):
        """Start at a saddle-adjacent point of a nonconvex objective;
        truncated CG must use the negative-curvature boundary step."""
        obj = lambda x: x[0] ** 4 - x[0] ** 2 + 0.5 * x[1] ** 2
        res = trust_region_newton(obj, jnp.asarray([1e-3, 1.0]),
                                  gtol=1e-6)
        assert res.converged
        assert abs(abs(float(res.x[0])) - np.sqrt(0.5)) < 1e-3


class TestLbfgs:
    def test_quadratic(self):
        obj, xstar = quadratic_factory(64)
        res = lbfgs(obj, jnp.zeros(64, jnp.float32), gtol=1e-4,
                    maxiter=400)
        assert res.converged, (res.gnorm, res.iters)
        assert np.linalg.norm(np.asarray(res.x) - xstar) < 2e-3

    def test_rosenbrock(self):
        res = lbfgs(rosenbrock, jnp.asarray([-1.2, 1.0]), gtol=1e-5,
                    maxiter=400)
        assert res.converged, (res.gnorm, res.iters)
        assert np.allclose(np.asarray(res.x), 1.0, atol=1e-3)

    def test_memory_one_still_works(self):
        obj, xstar = quadratic_factory(16, cond=10.0)
        res = lbfgs(obj, jnp.zeros(16, jnp.float32), memory=1,
                    gtol=1e-4, maxiter=500)
        assert res.converged

    def test_f64_tight(self):
        obj = lambda x: jnp.sum((x - 0.5) ** 4 + x ** 2)
        res = lbfgs(obj, jnp.zeros(8), gtol=1e-6, maxiter=200)
        assert res.converged and res.gnorm <= 1e-6


class TestProjectedGradient:
    def test_active_bounds_match_closed_form(self):
        """min 0.5||x - c||^2 on [0,1]^n: solution is clip(c, 0, 1)."""
        rng = np.random.default_rng(1)
        c = jnp.asarray(rng.uniform(-1.0, 2.0, 32), jnp.float32)
        obj = lambda x: 0.5 * jnp.sum((x - c) ** 2)
        res = projected_gradient(obj, jnp.full(32, 0.5, jnp.float32),
                                 0.0, 1.0, gtol=1e-5)
        assert res.converged
        assert np.allclose(np.asarray(res.x),
                           np.clip(np.asarray(c), 0.0, 1.0), atol=1e-4)

    def test_interior_solution_unconstrained_match(self):
        obj, xstar = quadratic_factory(16, cond=10.0)
        lo, hi = -10.0, 10.0   # inactive box
        res = projected_gradient(obj, jnp.zeros(16, jnp.float32),
                                 lo, hi, gtol=1e-4, maxiter=3000)
        assert res.converged
        assert np.linalg.norm(np.asarray(res.x) - xstar) < 2e-3

    def test_start_outside_box_is_projected(self):
        obj = lambda x: jnp.sum(x ** 2)
        res = projected_gradient(obj, jnp.full(4, 5.0, jnp.float32),
                                 1.0, 2.0, gtol=1e-6)
        assert np.allclose(np.asarray(res.x), 1.0, atol=1e-5)


class TestSharedCompilation:
    def test_cached_pieces_reused(self):
        """Two runs against the same objective share jitted pieces
        (the _obj_fns lru_cache) — assert identity, the compile-cost
        contract the package documents."""
        from trilinos_tpu.optim.base import _obj_fns
        obj = rosenbrock
        a = _obj_fns(obj)
        b = _obj_fns(obj)
        assert a[0] is b[0] and a[1] is b[1]
