"""Composable status tests (stopping criteria).

Jittable analogue of Belos' StatusTest hierarchy:
  * ``MaxIters``   — BelosStatusTestMaxIters.hpp
  * ``ResNorm``    — BelosStatusTestGenResNorm.hpp:455 (implicit vs explicit
    residual selection, NaN detection at :578)
  * ``Combo``      — BelosStatusTestCombo (AND / OR)

A status test is a pure function of a ``SolverState`` namespace of scalars,
evaluated inside the solver's while_loop. ``cg`` and ``gmres``/``fgmres``
take one via their ``stop=`` keyword (or ``LinearProblem.stop_test``
through the factory — the setUserConvStatusTest slot of
Belos::SolverManager); Passed means stop, OR-combined with the built-in
resnorm/maxiter checks. The StatusTestOutput residual *trace* is returned
as data instead of printed: pass ``history=True`` and read
``SolveResult.history``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolverState:
    """What status tests may read. resnorm is per RHS column."""

    iters: jax.Array
    resnorm: jax.Array
    rhs_norm: jax.Array


Test = Callable[[SolverState], jax.Array]  # -> bool per column (or scalar)


def max_iters(maxiter: int) -> Test:
    def check(s: SolverState):
        return s.iters >= maxiter

    return check


def res_norm(rtol: float, atol: float = 0.0, scaling: str = "rhs") -> Test:
    """||r|| <= rtol * scale + atol, per column. scaling: 'rhs' (||b||,
    Belos' default "Norm of RHS") or 'none' (absolute)."""

    def check(s: SolverState):
        if scaling == "rhs":
            scale = jnp.where(s.rhs_norm > 0, s.rhs_norm, 1)
        elif scaling == "none":
            scale = jnp.ones_like(s.resnorm)
        else:
            raise ValueError(f"unknown scaling {scaling!r}")
        return s.resnorm <= rtol * scale + atol

    return check


def nan_check() -> Test:
    """Residual became NaN → treat as 'passed' to stop the iteration
    (the solver reports converged=False since the resnorm test fails)."""

    def check(s: SolverState):
        return jnp.isnan(s.resnorm)

    return check


def combo_or(tests: Sequence[Test]) -> Test:
    def check(s: SolverState):
        out = tests[0](s)
        for t in tests[1:]:
            out = jnp.logical_or(out, t(s))
        return out

    return check


def combo_and(tests: Sequence[Test]) -> Test:
    def check(s: SolverState):
        out = tests[0](s)
        for t in tests[1:]:
            out = jnp.logical_and(out, t(s))
        return out

    return check


def standard_stop(rtol: float, atol: float, maxiter: int) -> Test:
    """The default Belos stack: OR(maxiters, AND-free resnorm, NaN)."""
    return combo_or([max_iters(maxiter),
                     lambda s: jnp.all(jnp.logical_or(
                         res_norm(rtol, atol)(s), nan_check()(s)))])
