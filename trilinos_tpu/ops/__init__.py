from .formats import (
    BdiaMatrix,
    BsrMatrix,
    CsrHost,
    DiaMatrix,
    EllMatrix,
    SparseMatrix,
    choose_format,
    csr_to_bdia,
    csr_to_bsr,
    csr_to_dia,
    csr_to_ell,
    to_dense,
)
from .matvec import residual, spmm, spmv
from .matrix_ops import diag_matrix, ptap, rap, spadd, spgemm
from . import fe, filters, komplex
from . import blas

__all__ = [
    "BdiaMatrix",
    "BsrMatrix",
    "CsrHost",
    "DiaMatrix",
    "EllMatrix",
    "SparseMatrix",
    "choose_format",
    "csr_to_bdia",
    "csr_to_bsr",
    "csr_to_dia",
    "csr_to_ell",
    "to_dense",
    "residual",
    "spmm",
    "spmv",
    "blas",
    "spgemm",
    "spadd",
    "ptap",
    "rap",
    "diag_matrix",
]
