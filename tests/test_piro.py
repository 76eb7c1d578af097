"""Piro-analogue analysis driver tests: steady solve + response,
adjoint sensitivities vs finite differences, transient response, and
reduced-space optimization recovering a known optimum.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trilinos_tpu import piro
from trilinos_tpu.galeri import laplace2d
from trilinos_tpu.ops import choose_format, spmv


def _bratu_model(n=12):
    """1-D Bratu f(u, p) = -u'' - p[0] e^u - p[1] x with a quadratic
    mismatch response against a frozen target."""
    h = 1.0 / (n + 1)
    x = jnp.linspace(h, 1 - h, n)
    target = jnp.sin(jnp.pi * x) * 0.1

    def residual(u, p):
        upad = jnp.concatenate([jnp.zeros(1), u, jnp.zeros(1)])
        lap = (2 * upad[1:-1] - upad[:-2] - upad[2:]) / h / h
        return lap - p[0] * jnp.exp(u) - p[1] * x

    def response(u, p):
        return 0.5 * jnp.sum((u - target) ** 2)

    return piro.Model(residual, response), x


class TestSteady:
    def test_solve_and_response(self):
        model, x = _bratu_model()
        n = x.shape[0]
        r = piro.solve_steady(model, jnp.zeros(n),
                              jnp.array([1.0, 0.5]), rtol=1e-12)
        assert r.converged
        resid = model.residual(r.u, jnp.array([1.0, 0.5]))
        assert float(jnp.linalg.norm(resid)) < 1e-9
        assert r.g is not None and float(r.g) >= 0

    def test_adjoint_sensitivity_matches_fd(self):
        model, x = _bratu_model()
        n = x.shape[0]
        p = jnp.array([0.8, 0.3])
        r = piro.solve_steady(model, jnp.zeros(n), p,
                              sensitivities=True, rtol=1e-13,
                              adjoint_rtol=1e-12)
        assert r.converged and r.dgdp is not None
        eps = 1e-6
        fd = np.zeros(2)
        for k in range(2):
            gs = []
            for sgn in (+1, -1):
                pk = np.asarray(p, np.float64).copy()
                pk[k] += sgn * eps
                rr = piro.solve_steady(model, r.u, jnp.asarray(pk),
                                       rtol=1e-13)
                gs.append(float(rr.g))
            fd[k] = (gs[0] - gs[1]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(r.dgdp), fd, rtol=1e-5,
                                   atol=1e-10)


class TestTransient:
    def test_linear_decay_response(self):
        """du/dt = -K u: the transient driver matches the dense expm."""
        a = laplace2d(5, 5)
        dev = choose_format(a)
        n, npad = a.shape[0], dev.n_rows_pad

        def residual(u, p):
            return p[0] * spmv(dev, u)

        def response(u, p):
            return jnp.sum(u[:n] ** 2)

        model = piro.Model(residual, response)
        rng = np.random.default_rng(0)
        u0 = np.zeros(npad)
        u0[:n] = rng.standard_normal(n)
        res, g = piro.solve_transient(model, jnp.asarray(u0),
                                      jnp.array([0.5]), 0.0, 0.1, 1e-3,
                                      rtol=1e-7, atol=1e-10)
        import scipy.linalg as sla  # available in the baked image?

        want = sla.expm(-0.05 * a.to_dense()) @ u0[:n]
        got = np.asarray(res.u)[:n]
        np.testing.assert_allclose(got, want, atol=5e-5)
        np.testing.assert_allclose(float(g), np.sum(want ** 2), rtol=1e-3)


class TestCoupled:
    def test_two_field_coupling_matches_monolithic(self):
        """u'' = c v, v'' = c u coupled by Gauss-Seidel sweeps matches
        the monolithic Newton solve of the stacked residual."""
        n = 16
        h = 1.0 / (n + 1)
        xs = jnp.linspace(h, 1 - h, n)

        def lap(u):
            up = jnp.concatenate([jnp.zeros(1), u, jnp.zeros(1)])
            return (2 * up[1:-1] - up[:-2] - up[2:]) / h / h

        def resid_u(u, p):  # p = frozen v-field source
            return lap(u) + 0.5 * u ** 3 - p - jnp.sin(jnp.pi * xs)

        def resid_v(v, p):  # p = frozen u-field source
            return lap(v) - p

        models = [piro.Model(resid_u), piro.Model(resid_v)]
        couplers = [lambda s: 2.0 * s[1], lambda s: 3.0 * s[0]]
        res = piro.solve_coupled(models, [jnp.zeros(n)] * 2, couplers,
                                 tol=1e-12, maxiter=60)
        assert res.converged, res.delta

        from trilinos_tpu.nonlinear import newton_krylov

        def mono(w):
            u, v = w[:n], w[n:]
            return jnp.concatenate([resid_u(u, 2.0 * v),
                                    resid_v(v, 3.0 * u)])

        m = newton_krylov(mono, jnp.zeros(2 * n), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(res.states[0]),
                                   np.asarray(m.x[:n]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.states[1]),
                                   np.asarray(m.x[n:]), atol=1e-9)

    def test_jacobi_mode_converges(self):
        n = 8
        h = 1.0 / (n + 1)

        def lap(u):
            up = jnp.concatenate([jnp.zeros(1), u, jnp.zeros(1)])
            return (2 * up[1:-1] - up[:-2] - up[2:]) / h / h

        models = [piro.Model(lambda u, p: lap(u) - p - 1.0),
                  piro.Model(lambda v, p: lap(v) - p)]
        couplers = [lambda s: s[1], lambda s: s[0]]
        res = piro.solve_coupled(models, [jnp.zeros(n)] * 2, couplers,
                                 tol=1e-11, maxiter=80, mode="jacobi")
        assert res.converged


class TestAnalysis:
    def test_recovers_source_strength(self):
        """Fit p so the Bratu state matches a target generated at a known
        p_true: the reduced-space optimizer must recover it."""
        model, x = _bratu_model()
        n = x.shape[0]
        p_true = jnp.array([0.6, 0.8])
        truth = piro.solve_steady(model, jnp.zeros(n), p_true, rtol=1e-13)

        def response(u, p):
            return 0.5 * jnp.sum((u - truth.u) ** 2)

        fit = piro.Model(model.residual, response)
        res = piro.perform_analysis(fit, jnp.zeros(n),
                                    jnp.array([1.2, 0.1]), gtol=1e-10,
                                    maxiter=60,
                                    newton_kw=dict(rtol=1e-13))
        assert res.g < 1e-12, (res.g, res.gnorm)
        np.testing.assert_allclose(np.asarray(res.p),
                                   np.asarray(p_true), atol=1e-4)


class TestConstrainedAnalysis:
    def test_budgeted_source_fit(self):
        """Fit the two source strengths subject to a design budget
        p0 + p1 = 1: the constrained optimum differs from the
        unconstrained fit and satisfies the budget + KKT stationarity."""
        model, x = _bratu_model()
        n = x.shape[0]
        p_true = jnp.array([0.6, 0.8])
        truth = piro.solve_steady(model, jnp.zeros(n), p_true,
                                  rtol=1e-13)

        def response(u, p):
            return 0.5 * jnp.sum((u - truth.u) ** 2)

        fit = piro.Model(model.residual, response)

        def budget(p):
            return jnp.atleast_1d(jnp.sum(p) - 1.0)

        res = piro.perform_analysis(fit, jnp.zeros(n),
                                    jnp.array([0.5, 0.5]),
                                    constraint=budget, gtol=1e-8,
                                    ctol=1e-9, maxiter=40,
                                    newton_kw=dict(rtol=1e-13))
        assert res.converged
        p = np.asarray(res.p)
        assert abs(p.sum() - 1.0) < 1e-8   # budget held
        # p_true sums to 1.4 -> constrained optimum must differ and
        # the misfit must exceed the unconstrained (perfect-fit) one
        assert res.g > 1e-8
        # KKT: the reduced gradient is parallel to the constraint
        # normal (1, 1): its components must be (near-)equal
        r = piro.solve_steady(fit, jnp.zeros(n), res.p,
                              sensitivities=True, rtol=1e-13)
        dg = np.asarray(r.dgdp)
        assert abs(dg[0] - dg[1]) < 1e-5 * max(1.0, np.abs(dg).max())
