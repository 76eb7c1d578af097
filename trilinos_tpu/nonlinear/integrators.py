"""Time integrators (Tempus analogue) for u' = f(t, u).

Reference anchors: packages/tempus/src/Tempus_StepperBackwardEuler_impl.hpp
(implicit residual u_dot - f = 0 solved by the wrapped NOX solver),
Tempus_StepperTrapezoidal_impl.hpp, Tempus_StepperBDF2_impl.hpp (BDF2
with a one-step startup stepper), Tempus_StepperExplicitRK_impl.hpp.

TPU-native form: implicit stages hand their stage residual to the JFNK
Newton driver (newton.py) — autodiff supplies (I - dt*gamma*df/du) v
actions, so there is no W-matrix assembly or lagged-Jacobian machinery.
The explicit RK4 path is a single `lax.scan` over steps: the whole
trajectory compiles into one XLA program (use it for nonstiff problems
or as a wall-clock baseline; the implicit steppers pay one small Newton
solve per step on the host loop, the Tempus structure).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..parallel.comm import Comm
from .base import default_comm
from .newton import newton_krylov

Rhs = Callable[[jax.Array, jax.Array], jax.Array]   # f(t, u)


@dataclasses.dataclass
class IntegratorResult:
    t: float                 # final time reached
    u: jax.Array             # state at t
    steps: int               # steps taken
    newton_iters: int        # total Newton iterations (implicit only)
    ts: np.ndarray | None = None        # optional trajectory times
    us: list[jax.Array] | None = None   # optional trajectory states


def _implicit_march(step_plan, u0, t0, t1, dt, *, save_every,
                    newton_kw, rtol, atol, comm):
    """Shared host loop for the implicit steppers.

    ``step_plan(u, hist, t, t_new)`` returns (resid_fn, args, guess);
    the per-step data travels through newton_krylov's ``args`` so each
    distinct residual function compiles exactly once for the whole
    march (Tempus reuses its NOX solver across steps the same way).

    Newton stops on a SOLUTION-SCALED absolute test,
    ||R|| <= atol + rtol*||u_n||, not relative to the predictor's
    residual: a good predictor makes ||R(guess)|| tiny, and a tolerance
    relative to it is unattainable in f32 (the Tempus/SUNDIALS
    (atol + rtol*|u|)-weighted convention, e.g.
    Tempus_WrapperModelEvaluatorBasic_impl.hpp's wrapped NOX NormF)."""
    nsteps = int(round((t1 - t0) / dt))
    u, t = u0, t0
    hist = {"prev": None}  # BDF2 history (u_{n-1})
    total_newton = 0
    ts, us = [t0], [u0]
    for k in range(nsteps):
        t_new = t0 + (k + 1) * dt
        resid, args, guess = step_plan(u, hist, t, t_new)
        tol_k = atol + rtol * float(
            jnp.linalg.norm(u.astype(jnp.float32)))
        res = newton_krylov(resid, guess, args=args, comm=comm,
                            rtol=0.0, atol=tol_k, **newton_kw)
        if not bool(jax.device_get(res.converged)):
            raise RuntimeError(
                f"implicit step {k} at t={t_new:g} failed to converge "
                f"(fnorm={float(res.fnorm):.3e})")
        total_newton += int(jax.device_get(res.iters))
        hist["prev"] = u
        u, t = res.x, t_new
        if save_every and (k + 1) % save_every == 0:
            ts.append(t)
            us.append(u)
    saved = (np.asarray(ts), us) if save_every else (None, None)
    return IntegratorResult(t=t, u=u, steps=nsteps,
                            newton_iters=total_newton,
                            ts=saved[0], us=saved[1])


def _default_tols(u0, rtol, atol):
    """Dtype-aware Newton tolerances: eps^0.75 relative to ||u_n||
    (~7e-6 in f32 on TPU, ~1.6e-12 in x64) unless the caller says."""
    eps = float(jnp.finfo(u0.dtype).eps)
    if rtol is None:
        rtol = eps ** 0.75
    if atol is None:
        atol = 10.0 * eps
    return rtol, atol


def theta_method(f: Rhs, u0: jax.Array, t0: float, t1: float, dt: float,
                 *, theta: float = 1.0, save_every: int = 0,
                 rtol: float | None = None, atol: float | None = None,
                 newton_maxiter: int = 20,
                 comm: Comm | None = None) -> IntegratorResult:
    """One-stage theta stepper: theta=1 is backward Euler
    (Tempus_StepperBackwardEuler), theta=0.5 trapezoidal/Crank-Nicolson
    (Tempus_StepperTrapezoidal). Stage residual
        R(u) = u - u_n - dt*[theta f(t_{n+1}, u) + (1-theta) f(t_n, u_n)]
    solved by JFNK with the forward-Euler predictor as the guess; the
    step is accepted when ||R|| <= atol + rtol*||u_n||."""
    if not 0.0 < theta <= 1.0:
        raise ValueError("theta in (0, 1]; use rk4 for explicit")
    comm = default_comm(comm)
    rtol, atol = _default_tols(u0, rtol, atol)
    newton_kw = dict(forcing="type2", maxiter=newton_maxiter)
    h = dt

    def resid(u, un, fn_prev, t_new):
        return (u - un - h * theta * f(t_new, u)
                - h * (1.0 - theta) * fn_prev)

    predictor = jax.jit(lambda un, t: un + h * f(t, un))

    def step_plan(un, hist, t, t_new):
        t_a = jnp.asarray(t, un.dtype)
        fn_prev = (f(t_a, un) if theta < 1.0
                   else jnp.zeros_like(un))
        guess = predictor(un, t_a)
        return resid, (un, fn_prev, jnp.asarray(t_new, un.dtype)), guess

    return _implicit_march(step_plan, u0, t0, t1, dt,
                           save_every=save_every, newton_kw=newton_kw,
                           rtol=rtol, atol=atol, comm=comm)


def backward_euler(f: Rhs, u0: jax.Array, t0: float, t1: float,
                   dt: float, **kw) -> IntegratorResult:
    return theta_method(f, u0, t0, t1, dt, theta=1.0, **kw)


def trapezoidal(f: Rhs, u0: jax.Array, t0: float, t1: float,
                dt: float, **kw) -> IntegratorResult:
    return theta_method(f, u0, t0, t1, dt, theta=0.5, **kw)


def bdf2(f: Rhs, u0: jax.Array, t0: float, t1: float, dt: float, *,
         save_every: int = 0, rtol: float | None = None,
         atol: float | None = None, newton_maxiter: int = 20,
         comm: Comm | None = None) -> IntegratorResult:
    """Fixed-step BDF2 with a backward-Euler startup step
    (Tempus_StepperBDF2_impl.hpp uses a pluggable one-step start stepper;
    BE is its default). Residual for n >= 1:
        R(u) = u - (4 u_n - u_{n-1})/3 - (2/3) dt f(t_{n+1}, u)."""
    comm = default_comm(comm)
    rtol, atol = _default_tols(u0, rtol, atol)
    newton_kw = dict(forcing="type2", maxiter=newton_maxiter)
    h = dt

    def resid_be(u, un, t_new):        # startup: backward Euler
        return u - un - h * f(t_new, u)

    def resid_bdf2(u, un, um1, t_new):
        return (u - (4.0 * un - um1) / 3.0
                - (2.0 / 3.0) * h * f(t_new, u))

    predictor = jax.jit(lambda un, t: un + h * f(t, un))

    def step_plan(un, hist, t, t_new):
        guess = predictor(un, jnp.asarray(t, un.dtype))
        t_a = jnp.asarray(t_new, un.dtype)
        if hist["prev"] is None:
            return resid_be, (un, t_a), guess
        return resid_bdf2, (un, hist["prev"], t_a), guess

    return _implicit_march(step_plan, u0, t0, t1, dt,
                           save_every=save_every, newton_kw=newton_kw,
                           rtol=rtol, atol=atol, comm=comm)


def rk4(f: Rhs, u0: jax.Array, t0: float, t1: float,
        dt: float) -> IntegratorResult:
    """Classic explicit RK4, the whole march as one `lax.scan` — compiles
    to a single XLA program (Tempus_StepperExplicitRK with the 'RK4'
    tableau; no per-step host dispatch here)."""
    nsteps = int(round((t1 - t0) / dt))

    @jax.jit
    def march(u):
        def step(carry, k):
            u, = carry
            t = t0 + k * dt
            k1 = f(t, u)
            k2 = f(t + dt / 2, u + dt / 2 * k1)
            k3 = f(t + dt / 2, u + dt / 2 * k2)
            k4 = f(t + dt, u + dt * k3)
            return (u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4),), None
        (uf,), _ = lax.scan(step, (u,), jnp.arange(nsteps, dtype=u.dtype))
        return uf

    return IntegratorResult(t=t0 + nsteps * dt, u=march(u0),
                            steps=nsteps, newton_iters=0)
