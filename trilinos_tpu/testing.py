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
