"""Bound-constrained minimization: projected gradient / spectral PG.

Reference anchors: packages/rol/src/function/ROL_BoundConstraint.hpp
(project / pruneActive protocol), ROL_PrimalDualActiveSetStep.hpp and
the projected-search line searches (ROL_LineSearch.hpp's
"Iteration Scaling" along the projection arc).

Spectral (Barzilai-Borwein) projected gradient with a nonmonotone
Armijo search along the projection arc — the standard SPG method; each
candidate is one jitted project-and-evaluate. Criticality is measured
by the projected-gradient norm ||x - P(x - g)||, ROL's optimality
measure for bounds."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base import OptimizeResult, _obj_fns


@functools.lru_cache(maxsize=64)
def _pg_fns(obj):
    val_grad, _, value = _obj_fns(obj)

    @jax.jit
    def trial(x, g, t, lo, hi):
        x_new = jnp.clip(x - t * g, lo, hi)
        return x_new, value(x_new)

    @jax.jit
    def pgnorm(x, g, lo, hi):
        return jnp.linalg.norm(x - jnp.clip(x - g, lo, hi))

    return val_grad, trial, pgnorm


def projected_gradient(obj, x0, lower, upper, *, gtol: float = 1e-6,
                       maxiter: int = 1000, c1: float = 1e-4,
                       ls_maxsteps: int = 30, history: int = 10
                       ) -> OptimizeResult:
    """Minimize ``obj`` over the box [lower, upper] by spectral
    projected gradient (BB step + nonmonotone Armijo over the last
    `history` values; Birgin-Martinez-Raydan SPG, the method ROL's
    projected-search line search implements for bounds)."""
    val_grad, trial, pgnorm = _pg_fns(obj)
    lo = jnp.broadcast_to(jnp.asarray(lower, x0.dtype), x0.shape)
    hi = jnp.broadcast_to(jnp.asarray(upper, x0.dtype), x0.shape)

    x = jnp.clip(x0, lo, hi)
    fx, g = val_grad(x)
    fx = float(fx)
    eps = float(jnp.finfo(x.dtype).eps)
    fhist = [fx]
    crit = float(pgnorm(x, g, lo, hi))
    t_bb = 1.0
    it = inner = 0
    while crit > gtol and it < maxiter:
        t = t_bb
        accepted = False
        fmax = max(fhist)
        for _ in range(ls_maxsteps):
            x_new, f_new = trial(x, g, jnp.asarray(t, x.dtype), lo, hi)
            f_new = float(f_new)
            inner += 1
            dec = float(jnp.vdot(g, x_new - x))
            # rounding-noise allowance, as in lbfgs/trust_region
            if f_new <= fmax + c1 * dec + 10.0 * eps * max(abs(fx), 1.0):
                accepted = True
                break
            t *= 0.5
        if not accepted:
            break
        _, g_new = val_grad(x_new)
        s = x_new - x
        yv = g_new - g
        sy = float(jnp.vdot(s, yv))
        ss = float(jnp.vdot(s, s))
        t_bb = min(max(ss / sy, 1e-10), 1e10) if sy > 0 else 1.0
        x, g, fx = x_new, g_new, f_new
        fhist.append(fx)
        if len(fhist) > history:
            fhist.pop(0)
        crit = float(pgnorm(x, g, lo, hi))
        it += 1
    return OptimizeResult(x=x, fval=fx, gnorm=crit, iters=it,
                          converged=crit <= gtol, inner_iters=inner)
