"""Nonlinear solvers (NOX/LOCA analogue): JFNK Newton, Anderson,
dogleg trust region, parameter continuation."""
from .base import NonlinearResult, make_jvp_operator, make_vjp_operator
from .newton import newton_krylov
from .anderson import anderson
from .trust_region import newton_trust_region
from .continuation import ContinuationResult, continuation

__all__ = [
    "NonlinearResult",
    "make_jvp_operator",
    "make_vjp_operator",
    "newton_krylov",
    "anderson",
    "newton_trust_region",
    "continuation",
    "ContinuationResult",
]
