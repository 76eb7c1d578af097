"""Pallas TPU kernels for the hot sparse paths.

Kernel selection: ``maybe_pallas(a, transpose, force)`` returns a callable
``(a, x) -> y`` when a Pallas kernel exists and is expected to beat the XLA
path for this format/shape, else None (dispatch falls back to XLA impls in
``trilinos_tpu.ops.spmv``).
"""
from __future__ import annotations

from ..formats import (BdiaMatrix, BsrMatrix, DiaMatrix, EllMatrix,
                       SparseMatrix)


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def maybe_pallas(a: SparseMatrix, transpose: bool, force: bool = False,
                 x_ndim: int = 1, nrhs: int = 1):
    if transpose:
        return None
    if not (force or _on_tpu()):
        return None
    try:
        if isinstance(a, DiaMatrix):
            from .dia_spmv import (dia_pallas_applicable, dia_spmm_applicable,
                                   dia_spmm_pallas, dia_spmv_vmappable)

            if x_ndim == 1 and dia_pallas_applicable(a, x_ndim):
                # vmappable wrapper: jax.vmap over columns lands on the
                # packed SpMM kernel instead of breaking Mosaic lowering
                return dia_spmv_vmappable
            if x_ndim == 2 and dia_spmm_applicable(a, nrhs):
                return dia_spmm_pallas
        if isinstance(a, BdiaMatrix):
            from .bdia_spmv import (bdia_pallas_applicable, bdia_spmm_pallas,
                                    bdia_spmv_vmappable)

            if x_ndim == 1 and bdia_pallas_applicable(a, 1):
                return bdia_spmv_vmappable
            if x_ndim == 2 and bdia_pallas_applicable(a, nrhs):
                return bdia_spmm_pallas
    except ImportError:  # pragma: no cover
        return None
    return None
