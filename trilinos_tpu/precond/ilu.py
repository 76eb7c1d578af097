"""ILU(0) with TPU-friendly iterative triangular solves.

TPU-native analogue of Ifpack2::RILUK at fill level 0
(packages/ifpack2/src/Ifpack2_RILUK_decl.hpp:243 — initialize builds the
fill graph, compute does the numeric factor, apply is two triangular
solves via LocalSparseTriangularSolver,
Ifpack2_LocalSparseTriangularSolver_decl.hpp:77).

Hard-part decision (SURVEY.md §7 hard-parts #4): level-scheduled sparse
tri-solve is a TPU anti-pattern (many tiny sequential levels), so the
apply uses **fixed-sweep Jacobi richardson iterations on the triangular
factors** — the strategy of the reference's own fine-grained-parallel
FastILU family (packages/ifpack2/src/Ifpack2_Details_FastILU_Base_decl.hpp,
backend shylu/shylu_node/fastilu). A fixed sweep count keeps the apply a
LINEAR operator (safe for CG/GMRES); sweeps ≥ nilpotency index would make
it exact.

The numeric factorization itself is the classic IKJ ILU(0) restricted to
the sparsity pattern, done on host at compute() (numpy); the factors are
packed to device formats once.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.formats import CsrHost, choose_format, round_up, ROW_ALIGN
from ..ops.matvec import spmv
from ..utils.params import Param
from .base import Preconditioner

_SPECS = {
    "fact: sweeps": Param("fact: sweeps", 6,
                          doc="Jacobi sweeps per triangular solve"),
    "dtype": Param("dtype", None),
}


def ilu0_factor(a: CsrHost) -> tuple[CsrHost, CsrHost]:
    """Classic IKJ ILU(0): returns (L unit-lower incl. diag=1, U upper).

    Fast path: the native C++ kernel (trilinos_tpu.native.ilu0_native);
    pure-Python fallback below."""
    from ..native import ilu0_native

    n = a.shape[0]
    # the native kernel requires column-sorted rows (CsrHost.from_coo
    # guarantees this; verify cheaply before trusting it)
    rows_rep_chk = np.repeat(np.arange(n), a.row_lengths())
    keys = rows_rep_chk.astype(np.int64) * (a.shape[1] + 1) + a.cols
    sorted_ok = bool(np.all(np.diff(keys) > 0)) if len(keys) else True
    fv = ilu0_native(n, a.row_ptr, a.cols, a.vals) if sorted_ok else None
    if fv is not None:
        rows_rep = np.repeat(np.arange(n), a.row_lengths())
        lower = a.cols < rows_rep
        upper = ~lower
        diag_rows = np.arange(n)
        l_m = CsrHost.from_coo(
            np.concatenate([rows_rep[lower], diag_rows]),
            np.concatenate([a.cols[lower].astype(np.int64), diag_rows]),
            np.concatenate([fv[lower], np.ones(n)]), a.shape,
            sum_duplicates=False)
        u_m = CsrHost.from_coo(rows_rep[upper],
                               a.cols[upper].astype(np.int64), fv[upper],
                               a.shape, sum_duplicates=False)
        return l_m, u_m
    # copy values into a row-indexed dict-of-rows for the sequential sweep
    row_cols = []
    row_vals = []
    for i in range(n):
        c, v = a.row(i)
        order = np.argsort(c)
        row_cols.append(c[order].astype(np.int64))
        row_vals.append(v[order].astype(np.float64).copy())
    col_pos = [dict(zip(rc.tolist(), range(len(rc)))) for rc in row_cols]
    for i in range(n):
        ci, vi = row_cols[i], row_vals[i]
        for kk in range(len(ci)):
            k = ci[kk]
            if k >= i:
                break
            ukk_pos = col_pos[k].get(k)
            if ukk_pos is None:
                continue
            ukk = row_vals[k][ukk_pos]
            if ukk == 0:
                continue
            vi[kk] = lik = vi[kk] / ukk
            # update row i against row k's upper part, pattern-restricted
            ck, vk = row_cols[k], row_vals[k]
            for jj in range(ukk_pos + 1, len(ck)):
                pos = col_pos[i].get(ck[jj])
                if pos is not None:
                    vi[pos] -= lik * vk[jj]
    # split into L (strict lower + unit diag) and U (diag + upper)
    lr, lc, lv, ur, uc, uv = [], [], [], [], [], []
    for i in range(n):
        ci, vi = row_cols[i], row_vals[i]
        lower = ci < i
        upper = ci >= i
        lr.append(np.full(lower.sum() + 1, i))
        lc.append(np.concatenate([ci[lower], [i]]))
        lv.append(np.concatenate([vi[lower], [1.0]]))
        ur.append(np.full(upper.sum(), i))
        uc.append(ci[upper])
        uv.append(vi[upper])
    l_m = CsrHost.from_coo(np.concatenate(lr), np.concatenate(lc),
                           np.concatenate(lv), a.shape, sum_duplicates=False)
    u_m = CsrHost.from_coo(np.concatenate(ur), np.concatenate(uc),
                           np.concatenate(uv), a.shape, sum_duplicates=False)
    return l_m, u_m


class Ilu0(Preconditioner):
    def _do_initialize(self) -> None:
        self.params.validate(_SPECS)
        if not isinstance(self.a, CsrHost):
            raise TypeError("Ilu0 expects a CsrHost matrix")

    def _do_compute(self) -> None:
        dtype = self.params["dtype"] or self.a.vals.dtype
        sweeps = int(self.params["fact: sweeps"])
        l_m, u_m = ilu0_factor(self.a)
        n = self.a.shape[0]
        npad = round_up(n, ROW_ALIGN)
        self._l = choose_format(l_m, dtype=dtype)
        self._u = choose_format(u_m, dtype=dtype)
        du = u_m.diagonal().astype(np.float64)
        dinv = np.ones(npad)
        dinv[:n] = 1.0 / np.where(du != 0, du, 1.0)
        self._udinv = jnp.asarray(dinv, dtype=dtype)
        self.sweeps = sweeps

    def _apply(self, r: jax.Array) -> jax.Array:
        """x = U⁻¹ L⁻¹ r via fixed-sweep Jacobi on each factor."""
        udinv = self._udinv if r.ndim == 1 else self._udinv[:, None]
        # L y = r, L unit-diagonal: y ← r − (L − I) y
        y = r
        for _ in range(self.sweeps):
            y = r - (spmv(self._l, y) - y)
        # U x = y: x ← D_U⁻¹ (y − (U − D_U) x)
        x = udinv * y
        for _ in range(self.sweeps):
            x = x + udinv * (y - spmv(self._u, x))
        return x
