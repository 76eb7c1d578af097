"""Pallas TPU kernels for the hot sparse paths.

Kernel selection: ``maybe_pallas(a, transpose, force)`` returns a callable
``(a, x) -> y`` when a Pallas kernel exists and is expected to beat the XLA
path for this format/shape, else None (dispatch falls back to XLA impls in
``trilinos_tpu.ops.spmv``).
"""
from __future__ import annotations

from ..formats import BsrMatrix, DiaMatrix, EllMatrix, SparseMatrix


def maybe_pallas(a: SparseMatrix, transpose: bool, force: bool = False):
    if transpose:
        return None
    try:
        if isinstance(a, DiaMatrix):
            from .dia_spmv import dia_spmv_pallas, dia_pallas_applicable

            if force or dia_pallas_applicable(a):
                return dia_spmv_pallas
    except ImportError:  # pragma: no cover
        return None
    return None
