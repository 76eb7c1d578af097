"""Phalanx/Panzer analogue: evaluator DAG + physics-block assembly.

Reference behaviors: packages/phalanx/src/Phalanx_DAG_Manager.hpp
(topological evaluation, cycle/missing-field diagnostics),
Phalanx_Evaluator_AliasField.hpp; panzer gather->evaluate->scatter."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trilinos_tpu.fem import structured_quad_mesh
from trilinos_tpu.fem.phalanx import Evaluator, FieldManager, PhysicsBlock


class TestFieldManagerDag:
    def _diamond(self):
        fm = FieldManager()
        calls = []

        @fm.add("a", provides="a", requires="x")
        def _a(x):
            calls.append("a")
            return x + 1

        @fm.add("b", provides="b", requires="a")
        def _b(a):
            calls.append("b")
            return a * 2

        @fm.add("c", provides="c", requires="a")
        def _c(a):
            calls.append("c")
            return a * 3

        @fm.add("d", provides="d", requires=("b", "c"))
        def _d(b, c):
            calls.append("d")
            return b + c

        return fm, calls

    def test_topological_order_and_single_eval(self):
        fm, calls = self._diamond()
        run = fm.compile(["d"], inputs=["x"])
        out = run({"x": jnp.asarray(1.0)})
        assert float(out["d"]) == (2 * 2) + (2 * 3)
        assert calls.count("a") == 1  # diamond dep evaluated once
        assert calls.index("a") < calls.index("b")
        assert calls.index("b") < calls.index("d")

    def test_jit_compose(self):
        fm, _ = self._diamond()
        run = fm.compile(["d", "b"], inputs=["x"])
        f = jax.jit(lambda x: run({"x": x})["d"])
        assert float(f(jnp.asarray(2.0))) == 3 * 2 + 3 * 3

    def test_cycle_detection(self):
        fm = FieldManager()
        fm.register(Evaluator("e1", ("p",), ("q",), lambda q: q))
        fm.register(Evaluator("e2", ("q",), ("p",), lambda p: p))
        with pytest.raises(ValueError, match="cycle"):
            fm.order(["p"])

    def test_missing_provider(self):
        fm = FieldManager()
        fm.register(Evaluator("e", ("y",), ("z",), lambda z: z))
        with pytest.raises(KeyError, match="no evaluator provides"):
            fm.order(["y"], inputs=[])

    def test_duplicate_provider_rejected(self):
        fm = FieldManager()
        fm.register(Evaluator("e1", ("y",), (), lambda: 0))
        with pytest.raises(ValueError, match="already provided"):
            fm.register(Evaluator("e2", ("y",), (), lambda: 1))

    def test_alias(self):
        fm = FieldManager()
        fm.register(Evaluator("e", ("y",), ("x",), lambda x: 2 * x))
        fm.alias("y2", "y")
        out = fm.compile(["y2"], inputs=["x"])({"x": 3.0})
        assert out["y2"] == 6.0

    def test_multi_output_evaluator(self):
        fm = FieldManager()
        fm.register(Evaluator("split", ("lo", "hi"), ("x",),
                              lambda x: (x - 1, x + 1)))
        out = fm.compile(["hi", "lo"], inputs=["x"])({"x": 5.0})
        assert out["lo"] == 4.0 and out["hi"] == 6.0


class TestPhysicsBlock:
    def _linear_fm(self):
        fm = FieldManager()

        @fm.add("flux", provides="flux_qp", requires="grad_u_qp")
        def _flux(g):
            return g

        @fm.add("source", provides="source_qp", requires="x_qp")
        def _src(x):
            return jnp.ones(x.shape[:-1], x.dtype)

        return fm

    def test_linear_poisson_matches_matrix_path(self):
        """flux = grad u, source = 1 assembled through the DAG equals
        K u - b from the classical matrix assembly."""
        from trilinos_tpu.fem import (load_vector, poisson_dirichlet,
                                      stiffness_matrix)

        mesh = structured_quad_mesh(5, 4)
        pb = PhysicsBlock(mesh, dtype=jnp.float64)
        r = pb.residual_function(self._linear_fm())
        k, conn, xy = stiffness_matrix(mesh)
        b, _, _ = load_vector(mesh, lambda x: np.ones(x.shape[:-1]))
        u = np.random.default_rng(0).standard_normal(pb.n_dof)
        got = np.asarray(r(jnp.asarray(u)))
        want = k.matvec_host(u) - b
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_dirichlet_rows(self):
        mesh = structured_quad_mesh(4, 4)
        pb = PhysicsBlock(mesh, dtype=jnp.float64)
        bnd = pb.boundary_dofs()
        r = pb.residual_function(self._linear_fm(), dirichlet=bnd,
                                 g=0.5)
        u = jnp.asarray(
            np.random.default_rng(1).standard_normal(pb.n_dof))
        got = np.asarray(r(u))
        np.testing.assert_allclose(got[bnd], np.asarray(u)[bnd] - 0.5)

    def test_nonlinear_poisson_jfnk(self):
        """-div((1+u^2) grad u) = 4, u=0 on boundary, solved by the
        framework's JFNK Newton straight through the DAG residual
        (Sacado's AD role played by jax.jvp)."""
        from trilinos_tpu.nonlinear import newton_krylov

        fm = FieldManager()

        @fm.add("kappa", provides="kappa_qp", requires="u_qp")
        def _k(u):
            return 1.0 + u * u

        @fm.add("flux", provides="flux_qp",
                requires=("kappa_qp", "grad_u_qp"))
        def _flux(k, g):
            return k[..., None] * g

        @fm.add("source", provides="source_qp", requires="x_qp")
        def _src(x):
            return 4.0 * jnp.ones(x.shape[:-1], x.dtype)

        mesh = structured_quad_mesh(8, 8)
        pb = PhysicsBlock(mesh, dtype=jnp.float64)
        bnd = pb.boundary_dofs()
        r = pb.residual_function(fm, dirichlet=bnd)
        res = newton_krylov(r, jnp.zeros(pb.n_dof), rtol=1e-10)
        assert bool(res.converged)
        x = np.asarray(res.x)
        assert np.linalg.norm(np.asarray(r(res.x))) < 1e-8
        # physical sanity: positive interior hump, zero boundary
        assert x.max() > 0.1 and np.abs(x[bnd]).max() < 1e-12
        # nonlinearity matters: linear solve differs
        fm_lin = self._linear_fm()
        r_lin = pb.residual_function(fm_lin, dirichlet=bnd)
        res_lin = newton_krylov(r_lin, jnp.zeros(pb.n_dof), rtol=1e-10)
        assert not np.allclose(x, np.asarray(res_lin.x), atol=1e-6)

    def test_parameter_fields(self):
        """Extra input fields flow through residual kwargs (parameter
        sensitivity hook)."""
        fm = FieldManager()

        @fm.add("flux", provides="flux_qp", requires="grad_u_qp")
        def _f(g):
            return g

        @fm.add("source", provides="source_qp",
                requires=("x_qp", "amp"))
        def _s(x, amp):
            return amp * jnp.ones(x.shape[:-1], x.dtype)

        mesh = structured_quad_mesh(3, 3)
        pb = PhysicsBlock(mesh, dtype=jnp.float64)
        r = pb.residual_function(fm, params=("amp",))
        u = jnp.zeros(pb.n_dof)
        r1 = np.asarray(r(u, amp=1.0))
        r2 = np.asarray(r(u, amp=2.0))
        np.testing.assert_allclose(r2, 2 * r1, atol=1e-14)
        # and it is differentiable in the parameter
        dr = jax.jacfwd(lambda a: r(u, amp=a))(1.0)
        np.testing.assert_allclose(np.asarray(dr), r1, atol=1e-14)
