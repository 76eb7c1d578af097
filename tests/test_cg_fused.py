"""Fused-iteration CG kernel (one Pallas launch per iteration) vs the
unfused single-reduce driver — interpret mode on CPU."""
import numpy as np
import pytest

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.ops import matvec as S
from trilinos_tpu.ops.pallas.cg_fused import (cg_fused_applicable,
                                              cg_fused_iteration,
                                              _fused_plan)
from trilinos_tpu.solvers import cg_fused, cg_single_reduce


class TestCgFused:
    def test_applicable(self):
        op = laplace3d(32, 32, 8, dtype=np.float32, fmt="stencil")
        assert cg_fused_applicable(op), _fused_plan(op)

    def test_iterations_match_reference_recurrence(self):
        """Four fused iterations track a float64 hand-rolled CG-SR."""
        op = laplace3d(32, 32, 8, dtype=np.float32, fmt="stencil")
        n = op.n_rows_pad
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        x = jnp.zeros(n, jnp.float32)
        r = b
        w = S.spmv(op, r, impl="xla")
        rz = float(jnp.vdot(r, r))
        delta = float(jnp.vdot(r, w))
        scal = jnp.asarray([[rz, delta, 0.0, 1.0]], dtype=jnp.float32)
        p = jnp.zeros_like(r)
        q = jnp.zeros_like(r)

        def aref(v):
            return np.asarray(S.spmv(op, jnp.asarray(v, jnp.float32),
                                     impl="xla"), np.float64)

        xr = np.zeros(n)
        rr_ = np.asarray(b, np.float64)
        pr = np.zeros(n)
        qr = np.zeros(n)
        rzr, dlr, rzp, alp = rz, delta, 0.0, 1.0
        for it in range(4):
            x, r, w, p, q, scal = cg_fused_iteration(
                op, x, r, w, p, q, scal, interpret=True)
            beta = rzr / rzp if rzp > 0 else 0.0
            alpha = rzr / (dlr - beta * rzr / alp)
            pr = rr_ + beta * pr
            qr = aref(pr)  # q = A p, recomputed exactly for the reference
            xr = xr + alpha * pr
            rr_new = rr_ - alpha * qr
            wr = aref(rr_new)
            rzp, alp = rzr, alpha
            rzr, dlr = rr_new @ rr_new, rr_new @ wr
            rr_ = rr_new
            np.testing.assert_allclose(np.asarray(x), xr, rtol=2e-4,
                                       atol=2e-4, err_msg=f"x it{it}")
            np.testing.assert_allclose(np.asarray(r), rr_, rtol=2e-4,
                                       atol=2e-4, err_msg=f"r it{it}")
            np.testing.assert_allclose(float(scal[0, 0]), rzr,
                                       rtol=2e-3, err_msg=f"rz it{it}")

    def test_solve_parity_with_single_reduce(self):
        op = laplace3d(32, 32, 8, dtype=np.float32, fmt="stencil")
        n = op.n_rows_pad
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        res_f = cg_fused(op, b, rtol=1e-5, maxiter=400, interpret=True)
        res_u = cg_single_reduce(lambda v: S.spmv(op, v, impl="xla"), b,
                                 rtol=1e-5, maxiter=400)
        assert bool(res_f.converged), float(res_f.resnorm)
        assert abs(int(res_f.iters) - int(res_u.iters)) <= 5, \
            (int(res_f.iters), int(res_u.iters))
        np.testing.assert_allclose(float(res_f.resnorm),
                                   float(res_u.resnorm), rtol=0.5)
