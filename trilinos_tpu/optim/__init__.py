"""Smooth optimization (ROL analogue): trust-region Newton-CG,
L-BFGS, bound-constrained spectral projected gradient.

All methods take a plain jax scalar objective; gradients and
Hessian-vector products are exact autodiff (`optim/base.py`), cached
and jitted per objective."""
from .base import OptimizeResult
from .bounds import projected_gradient
from .lbfgs import lbfgs
from .trust_region import trust_region_newton
from .auglag import augmented_lagrangian

__all__ = [
    "OptimizeResult",
    "trust_region_newton",
    "lbfgs",
    "projected_gradient",
    "augmented_lagrangian",
]
