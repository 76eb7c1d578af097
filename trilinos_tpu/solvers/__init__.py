from .base import Operator, SolveResult, identity_prec
from .cg import cg, cg_pipeline, cg_single_reduce
from .gmres import fgmres, gmres
from .bicgstab import bicgstab
from .minres import minres
from .tfqmr import tfqmr
from . import ortho, status

__all__ = [
    "Operator",
    "SolveResult",
    "identity_prec",
    "cg",
    "cg_pipeline",
    "cg_single_reduce",
    "gmres",
    "fgmres",
    "bicgstab",
    "minres",
    "tfqmr",
    "ortho",
    "status",
]
