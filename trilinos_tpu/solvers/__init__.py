from .base import Operator, SolveResult, identity_prec
from .cg import cg, cg_pipeline, cg_single_reduce

__all__ = [
    "Operator",
    "SolveResult",
    "identity_prec",
    "cg",
    "cg_pipeline",
    "cg_single_reduce",
]
