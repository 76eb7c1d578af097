"""Smoothed-aggregation algebraic multigrid preconditioner.

TPU-native analogue of MueLu's SA-AMG
(packages/muelu/src/MueCentral/MueLu_Hierarchy_decl.hpp:103,238 —
``Setup`` builds P/R/Ac per level, ``Iterate`` runs the V-cycle with
recursive coarse solve, MueLu_Hierarchy_def.hpp:655,1081; aggregation and
prolongator smoothing under muelu/src/Transfers/; smoothers via Ifpack2).

Setup (host, at compute()):
  1. greedy distance-1 aggregation of the matrix graph
     (MueLu UncoupledAggregation analogue)
  2. tentative prolongator P_t (piecewise-constant, column-normalized)
  3. smoothed P = (I − ω D⁻¹A) P_t with ω = damping/λmax(D⁻¹A)
  4. coarse operator A_c = Pᵀ A P  (Galerkin, ops.matrix_ops.ptap)
  repeated until the coarse problem is small; coarsest level inverts
  densely.

Apply (device, jitted): a fixed V-cycle — damped-Jacobi pre/post smoothing,
residual restriction, recursive coarse correction, dense coarse solve —
unrolled over the (static) level list, so the whole preconditioner is one
fused XLA computation usable inside any Krylov driver.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.formats import CsrHost, choose_format, round_up, ROW_ALIGN
from ..ops.matrix_ops import ptap
from ..ops.matvec import spmv
from ..utils.params import Param
from .base import Preconditioner

_SPECS = {
    "max levels": Param("max levels", 10),
    "coarse: max size": Param("coarse: max size", 64),
    "aggregation: min agg size": Param("aggregation: min agg size", 2),
    "sa: damping factor": Param("sa: damping factor", 4.0 / 3.0),
    "smoother: sweeps": Param("smoother: sweeps", 2),
    "smoother: damping factor": Param("smoother: damping factor", 0.8),
    "smoother: type": Param("smoother: type", "jacobi",
                            choices=("jacobi", "chebyshev")),
    "cycle type": Param("cycle type", "V", choices=("V", "W")),
    "fine: matrix-free operator": Param("fine: matrix-free operator",
                                        None),
    "dtype": Param("dtype", None),
}


def aggregate(a: CsrHost, min_size: int = 2) -> np.ndarray:
    """Greedy distance-1 aggregation: agg id per node (MueLu
    UncoupledAggregation phase 1 + leftover attachment).

    Vectorized as rounds of a distance-2 maximal independent set
    (random priorities; a node roots an aggregate iff its priority is
    the max within graph distance 2, computed by two sparse
    max-propagations with ``np.maximum.at``) — no per-row Python loop,
    so setup scales to multi-million-row fine levels. Round count is
    O(log n) w.h.p.; each round assigns the winners' whole (fully
    unaggregated) neighborhoods."""
    n = a.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), a.row_lengths())
    cols = a.cols.astype(np.int64)
    keep = (cols != rows) & (cols < n)
    rows, cols = rows[keep], cols[keep]

    agg = np.full(n, -1, dtype=np.int64)
    prio = np.random.default_rng(0).permutation(n).astype(np.float64) + 1
    next_id = 0

    def edge_max(x):
        out = np.zeros(n, dtype=x.dtype)
        np.maximum.at(out, rows, x[cols])
        return np.maximum(out, x)

    while True:
        unagg = agg == -1
        # candidates: unaggregated nodes with a fully unaggregated
        # neighborhood (phase-1 root condition)
        nbr_agg = np.zeros(n, dtype=bool)
        np.maximum.at(nbr_agg, rows, ~unagg[cols])
        cand = unagg & ~nbr_agg
        if not cand.any():
            break
        pr = np.where(cand, prio, 0.0)
        winners = cand & (pr == edge_max(edge_max(pr))) & (pr > 0)
        w_ids = np.nonzero(winners)[0]
        if not len(w_ids):
            break
        agg[w_ids] = next_id + np.arange(len(w_ids))
        # winners are distance->2 independent: neighborhoods are
        # disjoint, so direct scatter is race-free
        sel = winners[rows]
        agg[cols[sel]] = agg[rows[sel]]
        next_id += len(w_ids)

    # phase 2: attach leftovers to an adjacent aggregate (a few rounds
    # pull in chains of leftovers)
    for _ in range(3):
        left = agg == -1
        if not left.any():
            break
        best = np.full(n, -1, dtype=np.int64)
        sel = left[rows] & (agg[cols] >= 0)
        np.maximum.at(best, rows[sel], agg[cols[sel]])
        take = left & (best >= 0)
        agg[take] = best[take]
    # isolated leftovers become singletons
    left = np.nonzero(agg == -1)[0]
    if len(left):
        agg[left] = next_id + np.arange(len(left))
    # renumber consecutively (some ids may be empty after attachment)
    uniq, agg = np.unique(agg, return_inverse=True)
    return agg.astype(np.int64)


def tentative_prolongator(agg: np.ndarray) -> CsrHost:
    n = len(agg)
    nagg = int(agg.max()) + 1
    counts = np.bincount(agg, minlength=nagg).astype(np.float64)
    vals = 1.0 / np.sqrt(counts[agg])
    return CsrHost.from_coo(np.arange(n), agg, vals, (n, nagg),
                            sum_duplicates=False)


def smooth_prolongator(a: CsrHost, p_t: CsrHost, damping: float) -> CsrHost:
    """P = (I − ω D⁻¹ A) P_t with ω = damping / λmax(D⁻¹A) (power est.)."""
    from ..ops.matrix_ops import diag_matrix, spadd, spgemm

    d = a.diagonal()
    dinv = 1.0 / np.where(d != 0, d, 1.0)
    # cheap λmax estimate of D⁻¹A by a few host power iterations
    rng = np.random.default_rng(0)
    v = rng.standard_normal(a.shape[0])
    rows_rep = np.repeat(np.arange(a.shape[0]), a.row_lengths())
    lam = 1.0
    for _ in range(10):
        w = np.zeros(a.shape[0])
        np.add.at(w, rows_rep, a.vals * v[a.cols])
        w *= dinv
        lam = np.linalg.norm(w)
        v = w / max(lam, 1e-30)
    omega = damping / max(lam, 1e-12)
    da = spgemm(diag_matrix(omega * dinv), a)
    dap = spgemm(da, p_t)
    return spadd(p_t, dap, 1.0, -1.0)


def build_hierarchy_host(a: CsrHost, max_levels: int, coarse_max: int,
                         min_agg: int, damping: float):
    """Host-side SA-AMG setup shared by the on-chip and distributed
    preconditioners: returns ([(A_l, P_l), ...], A_coarsest) — the
    Hierarchy::Setup phase (MueLu_Hierarchy_decl.hpp:103)."""
    levels = []
    for _ in range(max_levels - 1):
        if a.shape[0] <= coarse_max:
            break
        agg = aggregate(a, min_agg)
        if int(agg.max()) + 1 >= a.shape[0]:  # no coarsening progress
            break
        p_t = tentative_prolongator(agg)
        p_s = smooth_prolongator(a, p_t, damping)
        a_c = ptap(a, p_s)
        levels.append((a, p_s))
        a = a_c
    return levels, a


class SaAmg(Preconditioner):
    """Smoothed-aggregation AMG V-cycle (fixed, linear → Krylov-safe)."""

    def _do_initialize(self) -> None:
        self.params.validate(_SPECS)
        if not isinstance(self.a, CsrHost):
            raise TypeError("SaAmg expects a CsrHost matrix")

    def _do_compute(self) -> None:
        p = self.params
        dtype = p["dtype"] or self.a.vals.dtype
        self.levels = []
        host_levels, a = build_hierarchy_host(
            self.a, int(p["max levels"]), int(p["coarse: max size"]),
            int(p["aggregation: min agg size"]),
            float(p["sa: damping factor"]))
        # matrix-free fine level: the framework's fastest operator (and
        # the fused-polynomial Chebyshev smoother) carries the dominant
        # level-0 cost; coarser levels stay stored (they are built by
        # Galerkin products anyway). The stored fine matrix self.a is
        # still used for aggregation/PtAP setup.
        self.fine_op = p["fine: matrix-free operator"]
        if self.fine_op is not None \
                and self.fine_op.shape != self.a.shape:
            raise ValueError("fine operator shape != matrix shape")
        self._fine_cheb = None
        for k, (a_l, p_s) in enumerate(host_levels):
            d = a_l.diagonal()
            if k == 0 and self.fine_op is not None:
                npad = self.fine_op.n_rows_pad
                a_dev = self.fine_op
            else:
                npad = round_up(a_l.shape[0], ROW_ALIGN)
                a_dev = choose_format(a_l, dtype=dtype)
            dinv = np.ones(npad)
            dinv[: a_l.shape[0]] = 1.0 / np.where(d != 0, d, 1.0)
            np_c = round_up(p_s.shape[1], ROW_ALIGN)
            self.levels.append(dict(
                a=a_dev,
                dinv=jnp.asarray(dinv, dtype=dtype),
                # P: (n_f, n_c) rectangular — ELL without identity padding
                p=_pack_rect(p_s, dtype, npad, np_c),
                pt=_pack_rect(p_s.transpose(), dtype, np_c, npad),
                n_f=npad, n_c=np_c))
        # coarsest: dense inverse (identity-padded)
        nc = a.shape[0]
        npad = round_up(nc, ROW_ALIGN)
        dense = np.eye(npad)
        dense[:nc, :nc] = a.to_dense()
        # pseudo-inverse: semidefinite coarse operators (e.g. Hiptmair's
        # auxiliary Gt A G with constants in the null space) stay stable
        self.coarse_inv = jnp.asarray(np.linalg.pinv(dense, rcond=1e-12),
                                      dtype=dtype)
        self.sweeps = int(p["smoother: sweeps"])
        self.omega = float(p["smoother: damping factor"])
        self.gamma = 2 if p["cycle type"] == "W" else 1
        if p["smoother: type"] == "chebyshev":
            if self.fine_op is None:
                raise ValueError(
                    "smoother: type 'chebyshev' requires 'fine: "
                    "matrix-free operator' (the fused polynomial "
                    "smoother runs on the StencilOp); use the "
                    "CHEBYSHEV preconditioner for stored matrices")
            from .chebyshev import fused_stencil_chebyshev

            # degree = sweeps+1 Chebyshev apply at ~one SpMV's traffic
            # (ops/pallas/stencil_poly.py)
            self._fine_cheb = fused_stencil_chebyshev(
                self.fine_op, degree=self.sweeps + 1)

    def n_levels(self) -> int:
        return len(self.levels) + 1

    def _smooth(self, lvl, x, b):
        dinv = lvl["dinv"] if b.ndim == 1 else lvl["dinv"][:, None]
        for _ in range(self.sweeps):
            x = x + self.omega * dinv * (b - spmv(lvl["a"], x))
        return x

    def _presmooth(self, k, lvl, b):
        if k == 0 and self._fine_cheb is not None:
            return self._fine_cheb(b)          # zero guess: x = p(A) b
        return self._smooth(lvl, jnp.zeros_like(b), b)

    def _postsmooth(self, k, lvl, x, b):
        if k == 0 and self._fine_cheb is not None:
            return x + self._fine_cheb(b - spmv(lvl["a"], x))
        return self._smooth(lvl, x, b)

    def _vcycle(self, k: int, b: jax.Array) -> jax.Array:
        if k == len(self.levels):
            return self.coarse_inv @ b
        lvl = self.levels[k]
        x = self._presmooth(k, lvl, b)
        # gamma=1: V-cycle; gamma=2: W-cycle (MueLu Hierarchy::Iterate
        # cycle-type option, MueLu_Hierarchy_def.hpp:1081)
        for cyc in range(self.gamma):
            r = b - spmv(lvl["a"], x)
            r_c = spmv(lvl["pt"], r)
            e_c = self._vcycle(k + 1, r_c)
            x = x + spmv(lvl["p"], e_c)
        return self._postsmooth(k, lvl, x, b)

    def _apply(self, r: jax.Array) -> jax.Array:
        return self._vcycle(0, r)


def _pack_rect(m: CsrHost, dtype, n_rows_pad, n_cols_pad):
    from ..ops.formats import csr_to_ell

    return csr_to_ell(m, dtype=dtype, n_rows_pad=n_rows_pad,
                      identity_pad_rows=False)
