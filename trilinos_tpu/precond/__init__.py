from .amg import SaAmg
from .block_amg import BlockStructuredAmg
from .base import Preconditioner, create
from .block_2x2 import (BlockedOperator2x2, block_diagonal_prec,
                        block_lower_triangular_prec, lsc_inv_schur,
                        simple_schur_2x2)
from .chebyshev import Chebyshev, fused_stencil_chebyshev
from .ilu import Ilu0, ilu0_factor
from .ilut import Ilut, ilut_factor
from .jacobi import BlockJacobi, Relaxation
from .poly import GmresPoly, gmres_poly_op
from .multicolor_gs import MulticolorGaussSeidel
from .schwarz import AdditiveSchwarz
from .two_level_schwarz import TwoLevelSchwarz

__all__ = [
    "Preconditioner",
    "create",
    "Chebyshev", "fused_stencil_chebyshev",
    "Ilu0",
    "ilu0_factor",
    "Ilut",
    "ilut_factor",
    "BlockJacobi",
    "Relaxation",
    "GmresPoly",
    "BlockStructuredAmg",
    "SaAmg",
    "AdditiveSchwarz",
    "TwoLevelSchwarz",
    "MulticolorGaussSeidel",
    "BlockedOperator2x2",
    "block_diagonal_prec",
    "block_lower_triangular_prec",
    "simple_schur_2x2",
    "lsc_inv_schur",
]
