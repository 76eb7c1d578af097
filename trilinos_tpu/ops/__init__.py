from .formats import (
    BsrMatrix,
    CsrHost,
    DiaMatrix,
    EllMatrix,
    SparseMatrix,
    choose_format,
    csr_to_bsr,
    csr_to_dia,
    csr_to_ell,
    to_dense,
)
from .matvec import residual, spmm, spmv
from . import blas

__all__ = [
    "BsrMatrix",
    "CsrHost",
    "DiaMatrix",
    "EllMatrix",
    "SparseMatrix",
    "choose_format",
    "csr_to_bsr",
    "csr_to_dia",
    "csr_to_ell",
    "to_dense",
    "residual",
    "spmm",
    "spmv",
    "blas",
]
