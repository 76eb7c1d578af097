"""Stochastic Galerkin / PCE (Stokhos analogue) tests.

Mirrors the reference's test strategy (stokhos/test/UnitTest):
basis orthonormality + recurrence identities, triple-product values,
quadrature exactness, PCE arithmetic vs pointwise evaluation, SG
matrix-free apply vs the fully assembled Kronecker matrix, SG solve
moments vs NISP, and KL covariance reconstruction.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from trilinos_tpu import uq
from trilinos_tpu.solvers import cg, gmres


class TestOneDBases:
    @pytest.mark.parametrize("maker,dom", [
        (uq.hermite_basis, "hermite"),
        (uq.legendre_basis, "legendre"),
    ])
    def test_orthonormal(self, maker, dom):
        b = maker(6)
        x, w = b.gauss(12)
        tab = b.evaluate(x)
        gram = np.einsum("q,qi,qj->ij", w, tab, tab)
        np.testing.assert_allclose(gram, np.eye(7), atol=1e-10)

    def test_jacobi_orthonormal(self):
        b = uq.jacobi_basis(5, 1.5, 0.5)
        x, w = b.gauss(12)
        tab = b.evaluate(x)
        np.testing.assert_allclose(np.einsum("q,qi,qj->ij", w, tab, tab),
                                   np.eye(6), atol=1e-10)

    def test_rys_orthonormal(self):
        b = uq.rys_basis(5, cut=2.5)
        x, w = b.gauss(12)
        tab = b.evaluate(x)
        np.testing.assert_allclose(np.einsum("q,qi,qj->ij", w, tab, tab),
                                   np.eye(6), atol=1e-8)

    def test_gauss_hermite_vs_numpy(self):
        # probabilists' rule == hermite_e rule normalized to weight 1
        x, w = uq.hermite_basis(4).gauss(7)
        xe, we = np.polynomial.hermite_e.hermegauss(7)
        np.testing.assert_allclose(np.sort(x), np.sort(xe), atol=1e-10)
        np.testing.assert_allclose(sum(w), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.sort(w), np.sort(we / we.sum()),
                                   atol=1e-12)

    def test_gauss_legendre_moments(self):
        x, w = uq.legendre_basis(3).gauss(6)
        for k in range(10):  # exact through degree 11
            np.testing.assert_allclose(
                np.sum(w * x ** k),
                (1 / (k + 1) if k % 2 == 0 else 0.0), atol=1e-12)


class TestProductBasis:
    def test_size_binomial(self):
        from math import comb
        for d, p in [(2, 3), (3, 2), (4, 4)]:
            basis = uq.TotalOrderBasis.make(
                [uq.hermite_basis(p)] * d, p)
            assert basis.size == comb(d + p, p)

    def test_multivariate_orthonormal(self):
        basis = uq.TotalOrderBasis.make([uq.hermite_basis(3),
                                         uq.legendre_basis(3)], 3)
        q = uq.tensor_quadrature(basis.bases, 6)
        tab = basis.evaluate(q.points)
        gram = np.einsum("q,qi,qj->ij", q.weights, tab, tab)
        np.testing.assert_allclose(gram, np.eye(basis.size), atol=1e-10)

    def test_hermite_triple_products(self):
        # orthonormal probabilists' Hermite: <psi_1 psi_1 psi_2> = sqrt(2)
        basis = uq.TotalOrderBasis.make([uq.hermite_basis(4)], 4)
        c = basis.triple_product_tensor()
        np.testing.assert_allclose(c[1, 1, 2], np.sqrt(2.0), atol=1e-10)
        np.testing.assert_allclose(c[:, :, 0], np.eye(basis.size),
                                   atol=1e-12)
        # symmetry in all index pairs
        np.testing.assert_allclose(c, c.transpose(1, 0, 2), atol=1e-12)
        np.testing.assert_allclose(c, c.transpose(2, 1, 0), atol=1e-12)


class TestQuadrature:
    def test_smolyak_exactness(self):
        bases = [uq.legendre_basis(8)] * 3
        q = uq.smolyak_quadrature(bases, 3)
        qt = uq.tensor_quadrature(bases, 5)
        # integrates a degree-4 separable polynomial like the tensor rule
        def f(p):
            return (p[:, 0] ** 4 + p[:, 1] ** 3 * p[:, 2]
                    + p[:, 0] * p[:, 1] * p[:, 2])
        np.testing.assert_allclose(np.dot(q.weights, f(q.points)),
                                   np.dot(qt.weights, f(qt.points)),
                                   atol=1e-10)
        assert len(q.weights) < len(qt.weights)  # sparser than tensor
        np.testing.assert_allclose(q.weights.sum(), 1.0, atol=1e-12)

    def test_smolyak_aniso(self):
        bases = [uq.legendre_basis(8)] * 2
        q = uq.smolyak_quadrature(bases, 3, weights=[1.0, 3.0])
        qi = uq.smolyak_quadrature(bases, 3)
        assert len(q.weights) < len(qi.weights)
        np.testing.assert_allclose(q.weights.sum(), 1.0, atol=1e-12)
        np.testing.assert_allclose(  # still exact for dim-0-heavy terms
            np.dot(q.weights, q.points[:, 0] ** 3), 0.0, atol=1e-10)


class TestPCEArithmetic:
    def setup_method(self):
        self.basis = uq.TotalOrderBasis.make([uq.hermite_basis(4),
                                              uq.hermite_basis(4)], 4)
        self.ex = uq.QuadExpansion(self.basis)
        self.samples = np.random.default_rng(0).standard_normal((64, 2))

    def _check(self, pce, truth_fn, atol=1e-6):
        got = np.asarray(pce.eval(self.samples))
        want = truth_fn(self.samples)
        np.testing.assert_allclose(got, want, atol=atol * max(
            1.0, np.abs(want).max()))

    def test_polynomial_exact(self):
        x0, x1 = self.ex.variable(0), self.ex.variable(1)
        expr = (x0 + 2.0 * x1) * (x0 - x1) + 3.0
        self._check(expr, lambda s: (s[:, 0] + 2 * s[:, 1])
                    * (s[:, 0] - s[:, 1]) + 3.0, atol=1e-10)

    def test_pow(self):
        x0 = self.ex.variable(0)
        self._check(x0 ** 3, lambda s: s[:, 0] ** 3, atol=1e-10)

    def test_division_roundtrip(self):
        x0 = self.ex.variable(0)
        den = 4.0 + x0          # bounded away from 0 on typical samples
        expr = (x0 * x0) / den * den
        # project-back truncation: compare PCE coefficients
        np.testing.assert_allclose(np.asarray(expr.c),
                                   np.asarray((x0 * x0).c), atol=1e-8)

    def test_exp_moments(self):
        # exp(a*xi): mean e^{a^2/2} — needs order headroom, use small a
        basis = uq.TotalOrderBasis.make([uq.hermite_basis(8)], 8)
        ex = uq.QuadExpansion(basis)
        a = 0.3
        e = (ex.variable(0) * a).exp()
        np.testing.assert_allclose(float(e.mean()), np.exp(a * a / 2),
                                   rtol=1e-8)
        true_var = np.exp(a * a) * (np.exp(a * a) - 1.0)
        np.testing.assert_allclose(float(e.variance()), true_var, rtol=1e-6)

    def test_nisp_matches_intrusive(self):
        f = uq.nisp_project(lambda xi: jnp.sin(xi[0]) + xi[1] ** 2, self.ex)
        x0, x1 = self.ex.variable(0), self.ex.variable(1)
        g = x0.sin() + x1 * x1
        np.testing.assert_allclose(np.asarray(f.c), np.asarray(g.c),
                                   atol=1e-7)


def _sg_problem(nx=24, d=2, p=2):
    """1-D diffusion -(a u')' = 1 with affine lognormal-ish coefficient
    a(x, xi) = 2 + sum_k 0.3/k * sin(k pi x) xi_k (uniform germs)."""
    from trilinos_tpu.ops.formats import CsrHost

    h = 1.0 / (nx + 1)
    xc = np.linspace(h / 2, 1 - h / 2, nx + 1)  # staggered edges

    def tridiag_from_edges(ae):
        lo, hi = ae[:-1], ae[1:]
        rows, cols, vals = [], [], []
        for i in range(nx):
            rows.append(i), cols.append(i), vals.append((lo[i] + hi[i]) / h / h)
            if i > 0:
                rows.append(i), cols.append(i - 1), vals.append(-lo[i] / h / h)
            if i < nx - 1:
                rows.append(i), cols.append(i + 1), vals.append(-hi[i] / h / h)
        return CsrHost.from_coo(np.array(rows), np.array(cols),
                                np.array(vals, np.float64), (nx, nx))

    mats = [tridiag_from_edges(2.0 * np.ones(nx + 1))]
    for k in range(1, d + 1):
        mats.append(tridiag_from_edges(0.3 / k * np.sin(k * np.pi * xc)))
    basis = uq.TotalOrderBasis.make([uq.legendre_basis(p)] * d, p)
    return mats, basis, np.ones(nx)


class TestStochasticGalerkin:
    def test_matrix_free_matches_assembled(self):
        mats, basis, _ = _sg_problem(nx=10, d=2, p=2)
        dense = [m.to_dense() for m in mats]
        sg = uq.SGOperator(dense_ops := [
            (lambda u, a=jnp.asarray(a): a @ u) for a in dense], basis)
        a_sg = uq.assemble_sg_dense(dense, basis)
        rng = np.random.default_rng(1)
        u = rng.standard_normal((10, basis.size))
        y_mf = np.asarray(sg(jnp.asarray(u)))
        # assembled uses interleaved flatten: rows blocked by grid point
        y_as = (a_sg @ u.reshape(-1)).reshape(10, basis.size)
        np.testing.assert_allclose(y_mf, y_as, rtol=1e-8, atol=1e-8)

    def _sg_moments(self, p):
        mats, basis, rhs = _sg_problem(nx=16, d=2, p=p)
        dense = [jnp.asarray(m.to_dense()) for m in mats]
        # AFFINE germ form: A(xi) = A0 + sum_d A_d xi_d
        sg = uq.SGOperator.from_affine(
            [(lambda u, a=a: a @ u) for a in dense], basis)
        n = rhs.shape[0]
        b = jnp.zeros((n, basis.size)).at[:, 0].set(jnp.asarray(rhs))
        d0inv = 1.0 / jnp.diag(dense[0])
        prec = uq.mean_based_prec(lambda u: d0inv[:, None] * u, basis)
        u, res = uq.sg_solve(cg, sg, b, prec=prec, rtol=1e-10, maxiter=3000)
        assert res.converged
        u = np.asarray(u)
        return basis, rhs, [np.asarray(a) for a in dense], \
            u[:, 0], (u[:, 1:] ** 2).sum(axis=1)

    def test_sg_solve_moments_vs_nisp(self):
        """SG moments approach the sampled (NISP) moments as p grows —
        the Galerkin solution differs from the truth by PC truncation, so
        the right check is convergence, not exact agreement."""
        errs_m, errs_v = [], []
        for p in (1, 2, 3):
            basis, rhs, a_np, mean_sg, var_sg = self._sg_moments(p)
            # reference moments: exact deterministic solves on a quadrature
            # rule well beyond the SG order
            quad = uq.tensor_quadrature(basis.bases, 8)

            def det_solve(xi):
                a_tot = a_np[0] + sum(x * ak
                                      for x, ak in zip(xi, a_np[1:]))
                return np.linalg.solve(a_tot, rhs)

            sols = np.stack([det_solve(pt) for pt in quad.points])
            mean_ref = quad.weights @ sols
            var_ref = quad.weights @ sols ** 2 - mean_ref ** 2
            errs_m.append(np.abs(mean_sg - mean_ref).max()
                          / np.abs(mean_ref).max())
            errs_v.append(np.abs(var_sg - var_ref).max() / var_ref.max())
        assert errs_m[2] < errs_m[1] < errs_m[0], errs_m
        assert errs_v[2] < errs_v[1] < errs_v[0], errs_v
        assert errs_m[2] < 5e-3 and errs_v[2] < 5e-2, (errs_m, errs_v)

    def test_sparse_formats_through_sg(self):
        """SG apply with device sparse formats: each A_k SpMMs the whole
        (n, P) block (the multivector kernel path)."""
        from trilinos_tpu.ops import choose_format

        mats, basis, rhs = _sg_problem(nx=16, d=2, p=2)
        sg = uq.SGOperator.from_affine([choose_format(m) for m in mats],
                                       basis)
        npad = choose_format(mats[0]).n_rows_pad
        n = rhs.shape[0]
        b = jnp.zeros((npad, basis.size)).at[:n, 0].set(jnp.asarray(rhs))
        dinv = jnp.asarray(
            np.concatenate([1.0 / mats[0].diagonal(), np.ones(npad - n)]))
        prec = uq.mean_based_prec(lambda u: dinv[:, None] * u, basis)
        u, res = uq.sg_solve(cg, sg, b, prec=prec, rtol=1e-10, maxiter=3000)
        assert res.converged
        # parity vs dense-callable SG solve
        dense = [jnp.asarray(m.to_dense()) for m in mats]
        sg_d = uq.SGOperator.from_affine(
            [(lambda v, a=a: a @ v) for a in dense], basis)
        u2, _ = uq.sg_solve(cg, sg_d, jnp.asarray(b[:n]), prec=None,
                            rtol=1e-10, maxiter=3000)
        np.testing.assert_allclose(np.asarray(u)[:n], np.asarray(u2),
                                   rtol=1e-6, atol=1e-8)

    def test_approx_jacobi_beats_mean_based(self):
        mats, basis, rhs = _sg_problem(nx=12, d=2, p=2)
        dense = [jnp.asarray(m.to_dense()) for m in mats]
        sg = uq.SGOperator([(lambda u, a=a: a @ u) for a in dense], basis)
        n = rhs.shape[0]
        b = jnp.zeros((n, basis.size)).at[:, 0].set(jnp.asarray(rhs))
        a0inv = jnp.asarray(np.linalg.inv(np.asarray(dense[0])))
        p_mean = uq.mean_based_prec(lambda u: a0inv @ u, basis)
        p_aj = uq.approx_jacobi_prec(sg, lambda u: a0inv @ u, n_iter=2)
        _, r1 = uq.sg_solve(gmres, sg, b, prec=p_mean, rtol=1e-8,
                            maxiter=200)
        _, r2 = uq.sg_solve(gmres, sg, b, prec=p_aj, rtol=1e-8,
                            maxiter=200)
        assert r1.converged and r2.converged
        assert int(r2.iters) <= int(r1.iters)

    def test_gauss_seidel_prec_solves(self):
        mats, basis, rhs = _sg_problem(nx=8, d=2, p=1)  # small P
        dense = [jnp.asarray(m.to_dense()) for m in mats]
        sg = uq.SGOperator([(lambda u, a=a: a @ u) for a in dense], basis)
        n = rhs.shape[0]
        b = jnp.zeros((n, basis.size)).at[:, 0].set(jnp.asarray(rhs))
        a0inv = jnp.asarray(np.linalg.inv(np.asarray(dense[0])))
        p_gs = uq.approx_gauss_seidel_prec(sg, lambda v: a0inv @ v)
        _, r = uq.sg_solve(gmres, sg, b, prec=p_gs, rtol=1e-8, maxiter=100)
        assert r.converged


class TestKL:
    def test_eigen_decay_and_covariance(self):
        x = np.linspace(-1, 1, 60)
        kl = uq.ExponentialKL1D.make(20, a=1.0, corr_len=0.5)
        assert np.all(np.diff(kl.lam) <= 1e-12)  # descending
        err20 = kl.covariance_error(x)
        err5 = uq.ExponentialKL1D.make(5, a=1.0,
                                       corr_len=0.5).covariance_error(x)
        assert err20 < err5 < 1.0
        # max error sits on the C(x,x) kink and equals the spectral tail
        # sum (~ sum_{k>M} 16/(pi k)^2 ≈ 0.08 at M=20, corr_len=0.5)
        assert err20 < 0.1

    def test_modes_orthogonal(self):
        # eigenfunction L2 orthogonality on a fine trapezoid grid
        x = np.linspace(-1, 1, 4001)
        kl = uq.ExponentialKL1D.make(6, a=1.0, corr_len=1.0)
        f = kl.modes(x) / np.sqrt(kl.lam)[None, :]
        gram = np.trapezoid(f[:, :, None] * f[:, None, :], x, axis=0)
        np.testing.assert_allclose(gram, np.eye(6), atol=1e-4)

    def test_multi_d_field(self):
        pts = np.stack(np.meshgrid(np.linspace(-1, 1, 8),
                                   np.linspace(-1, 1, 8)),
                       axis=-1).reshape(-1, 2)
        mu, modes = uq.exponential_kl(12, pts, corr_len=0.7, mean=1.5)
        assert modes.shape == (64, 12)
        # realization variance <= sigma^2, approaching it with more terms
        var = (modes ** 2).sum(axis=1)
        assert np.all(var < 1.0 + 1e-9)
        _, modes4 = uq.exponential_kl(4, pts, corr_len=0.7)
        assert var.mean() > (modes4 ** 2).sum(axis=1).mean()
