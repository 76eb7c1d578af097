"""Trust-region Newton with Steihaug-Toint truncated CG (ROL analogue).

Reference anchors: packages/rol/src/step/ROL_TrustRegionStep.hpp (the
radius-update loop with gamma/eta constants), ROL_TrustRegion.hpp,
and the subproblem solver ROL_TruncatedCG.hpp (CG on the quadratic
model, exiting at negative curvature or the radius boundary).

The truncated-CG subproblem is ONE jitted `lax.while_loop` program —
iterate, gradient, radius and tolerance are all jit arguments, so every
outer iteration (and every new radius after a rejection) reuses the
same compiled kernel. Hessian actions are exact forward-over-reverse
autodiff; nothing is assembled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .base import OptimizeResult, _obj_fns

# ROL_TrustRegionStep defaults (ROL_TrustRegion.hpp ctor): step
# acceptance threshold eta0, radius-shrink/grow tests eta1/eta2,
# shrink/grow factors gamma1/gamma2.
_ETA0, _ETA1, _ETA2 = 1e-4, 0.25, 0.75
_GAMMA1, _GAMMA2 = 0.25, 2.0


@functools.lru_cache(maxsize=64)
def _tcg(obj, maxiter: int):
    """Compiled Steihaug-Toint truncated CG for `obj`'s quadratic model.

    Returns (d, pred_reduction, hit_boundary, iters): the step, the
    model decrease m(0)-m(d) >= 0, whether the radius or negative
    curvature terminated the solve, and CG iterations used."""
    _, hvp, _ = _obj_fns(obj)

    @jax.jit
    def solve(x, g, delta, tol, *args):
        n = g.shape[0]

        def boundary_tau(z, p, delta):
            # positive root of ||z + tau p||^2 = delta^2
            pp = jnp.vdot(p, p)
            zp = jnp.vdot(z, p)
            zz = jnp.vdot(z, z)
            disc = jnp.sqrt(jnp.maximum(zp * zp
                                        + pp * (delta * delta - zz),
                                        0.0))
            return (disc - zp) / jnp.maximum(pp, 1e-300)

        def cond(c):
            z, r, p, rr, it, done, _ = c
            return jnp.logical_and(jnp.logical_not(done), it < maxiter)

        def body(c):
            z, r, p, rr, it, done, hit = c
            hp = hvp(x, p, *args)
            kappa = jnp.vdot(p, hp)

            # negative curvature -> walk to the boundary along p
            tau_b = boundary_tau(z, p, delta)
            z_negcurv = z + tau_b * p

            alpha = rr / jnp.where(kappa > 0, kappa, 1.0)
            z_new = z + alpha * p
            crossed = jnp.vdot(z_new, z_new) >= delta * delta
            z_cross = z + tau_b * p

            r_new = r + alpha * hp
            rr_new = jnp.vdot(r_new, r_new)
            interior_done = jnp.sqrt(rr_new) <= tol
            beta = rr_new / jnp.maximum(rr, 1e-300)
            p_new = -r_new + beta * p

            neg = kappa <= 0
            z_out = jnp.where(neg, z_negcurv,
                              jnp.where(crossed, z_cross, z_new))
            done_now = jnp.logical_or(neg,
                                      jnp.logical_or(crossed,
                                                     interior_done))
            hit_now = jnp.logical_or(neg, crossed)
            return (z_out, r_new, p_new, rr_new, it + 1,
                    jnp.logical_or(done, done_now),
                    jnp.logical_or(hit, hit_now))

        z0 = jnp.zeros_like(g)
        rr0 = jnp.vdot(g, g)
        init = (z0, g, -g, rr0, jnp.asarray(0),
                jnp.asarray(False), jnp.asarray(False))
        z, r, p, rr, it, done, hit = jax.lax.while_loop(cond, body,
                                                        init)
        pred = -(jnp.vdot(g, z) + 0.5 * jnp.vdot(z, hvp(x, z, *args)))
        return z, pred, hit, it

    return solve


def trust_region_newton(obj, x0, *, args: tuple = (),
                        gtol: float = 1e-6,
                        maxiter: int = 100, delta0: float = 1.0,
                        delta_max: float = 1e8,
                        cg_maxiter: int = 250) -> OptimizeResult:
    """Minimize a smooth ``obj(x, *args) -> scalar`` by trust-region
    Newton-CG (ROL "Trust Region" step with the "Truncated CG"
    subproblem solver). ``args`` are extra jit-traced objective
    arguments (one compile serves every outer iteration of e.g. the
    augmented-Lagrangian loop).

    Inexact-Newton forcing: the CG tolerance is
    min(0.5, sqrt(gnorm)) * gnorm, giving superlinear convergence
    without over-solving far from the optimum."""
    val_grad, hvp, value = _obj_fns(obj)
    tcg = _tcg(obj, cg_maxiter)

    x = x0
    fx, g = val_grad(x, *args)
    fx = float(fx)
    gnorm = float(jnp.linalg.norm(g))
    delta = float(delta0)
    eps = float(jnp.finfo(x.dtype).eps)
    it = inner = 0
    while gnorm > gtol and it < maxiter:
        tol = min(0.5, np.sqrt(gnorm)) * gnorm
        d, pred, hit, cg_it = tcg(x, g, jnp.asarray(delta, x.dtype),
                                  jnp.asarray(tol, x.dtype), *args)
        inner += int(cg_it)
        pred = float(pred)
        f_new = float(value(x + d, *args))
        # noise-regularized ratio (Conn-Gould-Toint §17 practice): once
        # the model decrease sinks below the floating-point noise of f,
        # the raw ratio is rounding garbage and delta would collapse
        # spuriously — bias both sides by the noise level instead.
        noise = 10.0 * eps * max(abs(fx), 1.0)
        rho = (fx - f_new + noise) / (max(pred, 1e-300) + noise)
        dnorm = float(jnp.linalg.norm(d))
        if rho < _ETA1:
            delta = _GAMMA1 * dnorm
        elif rho > _ETA2 and bool(hit):
            delta = min(_GAMMA2 * delta, delta_max)
        if rho > _ETA0 and f_new <= fx + noise:
            x = x + d
            fx2, g = val_grad(x, *args)
            fx = float(fx2)
            gnorm = float(jnp.linalg.norm(g))
        it += 1
        if delta < 1e-14:
            break
    return OptimizeResult(x=x, fval=fx, gnorm=gnorm, iters=it,
                          converged=gnorm <= gtol, inner_iters=inner)
