"""Trait-conformance harness for operators and comm implementations.

Analogue of ``Belos::MVOPTester``
(packages/belos/src/BelosMVOPTester.hpp:86 TestMultiVecTraits, :1454
TestOperatorTraits) — the reference validates every adapter against the
abstraction contract; here any user-supplied operator/preconditioner can
be checked before it is handed to a solver.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def validate_operator(op: Callable, n: int, *, nrhs: int = 3,
                      symmetric: bool | None = None, seed: int = 0,
                      rtol: float = 1e-6) -> list[str]:
    """Check the operator contract; returns a list of violation messages
    (empty = conformant).

    Checks: shape preservation (1-D and 2-D), linearity, column
    consistency (batched apply == per-column apply), determinism, zero
    maps to zero, finiteness, and optionally symmetry in the inner
    product."""
    rng = np.random.default_rng(seed)
    problems: list[str] = []
    x1 = jnp.asarray(rng.standard_normal(n))
    x2 = jnp.asarray(rng.standard_normal(n))
    xm = jnp.asarray(rng.standard_normal((n, nrhs)))

    y1 = op(x1)
    if y1.shape != (n,):
        problems.append(f"1-D apply changed shape: {x1.shape}->{y1.shape}")
        return problems  # downstream checks assume conforming shapes
    ym = op(xm)
    if ym.shape != (n, nrhs):
        problems.append(f"2-D apply changed shape: {xm.shape}->{ym.shape}")
        return problems
    # linearity
    lhs = op(2.5 * x1 - 1.5 * x2)
    rhs = 2.5 * op(x1) - 1.5 * op(x2)
    if not np.allclose(np.asarray(lhs), np.asarray(rhs), rtol=rtol,
                       atol=rtol):
        problems.append("operator is not linear")
    # batched consistency
    cols = jnp.stack([op(xm[:, j]) for j in range(nrhs)], axis=1)
    if not np.allclose(np.asarray(ym), np.asarray(cols), rtol=rtol,
                       atol=rtol):
        problems.append("batched apply disagrees with per-column apply")
    # determinism
    if not np.array_equal(np.asarray(op(x1)), np.asarray(y1)):
        problems.append("operator is not deterministic")
    # zero
    z = op(jnp.zeros(n))
    if float(jnp.abs(z).max()) > rtol:
        problems.append("op(0) != 0")
    if not bool(jnp.isfinite(y1).all()):
        problems.append("apply produced non-finite values")
    if symmetric:
        a = float(jnp.vdot(x1, op(x2)))
        b = float(jnp.vdot(op(x1), x2))
        if abs(a - b) > rtol * max(abs(a), abs(b), 1.0):
            problems.append(f"<x,Ay> != <Ax,y>: {a} vs {b}")
    return problems


def validate_comm(comm, n: int = 16) -> list[str]:
    """Check the Comm contract (psum of a replicated-consistent value)."""
    problems: list[str] = []
    x = jnp.arange(float(n))
    s = comm.psum(jnp.sum(x))
    expect = comm.size * float(jnp.sum(x))
    if abs(float(s) - expect) > 1e-9 * max(expect, 1.0):
        problems.append(f"psum mismatch: {float(s)} != {expect}")
    return problems


def validate_preconditioner(prec: Callable, n: int, *, spd: bool = False,
                            seed: int = 0, rtol: float = 1e-6
                            ) -> list[str]:
    """Preconditioner-contract checks (the MVOPTester discipline applied
    to the prec slot): linearity, shape, finiteness; with ``spd=True``
    also symmetry in the inner product and positivity of x'Mx — the
    conditions CG requires of its preconditioner."""
    problems = validate_operator(prec, n, symmetric=spd or None,
                                 seed=seed, rtol=rtol)
    if spd:
        rng = np.random.default_rng(seed + 1)
        for t in range(3):
            x = jnp.asarray(rng.standard_normal(n))
            q = float(jnp.vdot(x, prec(x)))
            if not q > 0:
                problems.append(f"x'Mx = {q} <= 0 (not positive definite)")
                break
    return problems


def validate_multivector_traits(n: int = 64, nrhs: int = 3,
                                seed: int = 0) -> list[str]:
    """TestMultiVecTraits analogue for the array+Comm multivector model
    (BelosMVOPTester.hpp:86): columnwise dot/norm semantics, GEMM-update
    (MvTimesMatAddMv), SetBlock-style column updates."""
    from .ops.blas import local_dot

    problems: list[str] = []
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((n, nrhs)))
    b = jnp.asarray(rng.standard_normal((n, nrhs)))
    d = local_dot(a, b)
    if d.shape != (nrhs,):
        problems.append(f"local_dot shape {d.shape} != ({nrhs},)")
    want = np.einsum("ij,ij->j", np.asarray(a), np.asarray(b))
    if not np.allclose(np.asarray(d), want, rtol=1e-10):
        problems.append("local_dot != columnwise inner products")
    # MvTimesMatAddMv: C = alpha*A@S + beta*C
    s_small = jnp.asarray(rng.standard_normal((nrhs, nrhs)))
    c = jnp.asarray(rng.standard_normal((n, nrhs)))
    got = 0.5 * (a @ s_small) + 2.0 * c
    want = 0.5 * np.asarray(a) @ np.asarray(s_small) + 2.0 * np.asarray(c)
    if not np.allclose(np.asarray(got), want, rtol=1e-10):
        problems.append("GEMM-update (MvTimesMatAddMv) mismatch")
    # SetBlock: column-range update
    upd = a.at[:, 1:2].set(b[:, 0:1])
    if not np.allclose(np.asarray(upd[:, 1]), np.asarray(b[:, 0])):
        problems.append("SetBlock-style column update mismatch")
    return problems
