from .fem import elasticity2d, elasticity3d, helmholtz2d, uniflow2d
from .stencils import (
    big_star2d,
    brick3d,
    create_matrix,
    laplace1d,
    laplace2d,
    laplace3d,
    recirc2d,
    star2d,
    stencil_csr,
    stencil_dia,
)

__all__ = [
    "elasticity2d",
    "elasticity3d",
    "helmholtz2d",
    "uniflow2d",
    "big_star2d",
    "brick3d",
    "create_matrix",
    "laplace1d",
    "laplace2d",
    "laplace3d",
    "recirc2d",
    "star2d",
    "stencil_csr",
    "stencil_dia",
]
