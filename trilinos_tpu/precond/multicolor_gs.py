"""Multicolor Gauss-Seidel relaxation.

TPU-native analogue of Ifpack2's multithreaded Gauss-Seidel (MTGS/MTSGS —
Ifpack2_Relaxation_decl.hpp:238, backed by colored KokkosSparse
gauss_seidel, kokkos-kernels/src/sparse/impl/
KokkosSparse_gauss_seidel_impl.hpp with KokkosGraph distance-1 coloring).

Point Gauss-Seidel is sequential; the parallel form orders updates by a
graph coloring: rows of one color have no mutual edges, so each color
updates as a masked Jacobi step using the freshest values of the other
colors. For stencil matrices the greedy coloring finds the natural 2
(red-black, 5/7-point) or 4 colors, so one GS sweep = ncolors masked
SpMV+update passes — fully parallel on the VPU.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.formats import CsrHost, choose_format, round_up, ROW_ALIGN
from ..ops.matvec import spmv
from ..utils.params import Param
from .base import Preconditioner


def greedy_color(a: CsrHost) -> np.ndarray:
    """Distance-1 greedy coloring (KokkosGraph_Distance1Color analogue)."""
    n = a.shape[0]
    color = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        cols, _ = a.row(i)
        used = set(int(color[c]) for c in cols if c != i and c < n
                   and color[c] >= 0)
        c = 0
        while c in used:
            c += 1
        color[i] = c
    return color


_SPECS = {
    "relaxation: sweeps": Param("relaxation: sweeps", 1),
    "relaxation: damping factor": Param("relaxation: damping factor", 1.0),
    "relaxation: symmetric": Param("relaxation: symmetric", False),
    "dtype": Param("dtype", None),
}


class MulticolorGaussSeidel(Preconditioner):
    """Colored (symmetric) Gauss-Seidel sweeps as a preconditioner."""

    def _do_initialize(self) -> None:
        self.params.validate(_SPECS)
        if not isinstance(self.a, CsrHost):
            raise TypeError("MulticolorGaussSeidel expects CsrHost")
        self.colors = greedy_color(self.a)
        self.n_colors = int(self.colors.max()) + 1

    def _do_compute(self) -> None:
        p = self.params
        dtype = p["dtype"] or self.a.vals.dtype
        n = self.a.shape[0]
        npad = round_up(n, ROW_ALIGN)
        d = self.a.diagonal()
        dinv = np.ones(npad)
        dinv[:n] = 1.0 / np.where(d != 0, d, 1.0)
        self.dinv = jnp.asarray(dinv, dtype=dtype)
        masks = np.zeros((self.n_colors, npad))
        for c in range(self.n_colors):
            masks[c, :n] = (self.colors == c).astype(float)
        self.masks = jnp.asarray(masks, dtype=dtype)
        self._dev = choose_format(self.a, dtype=dtype)
        self.sweeps = int(p["relaxation: sweeps"])
        self.omega = float(p["relaxation: damping factor"])
        self.symmetric = bool(p["relaxation: symmetric"])

    def _one_color(self, c: int, x, b):
        mask = self.masks[c] if b.ndim == 1 else self.masks[c][:, None]
        dinv = self.dinv if b.ndim == 1 else self.dinv[:, None]
        r = b - spmv(self._dev, x)
        return x + self.omega * mask * dinv * r

    def _apply(self, b: jax.Array) -> jax.Array:
        x = jnp.zeros_like(b)
        order = list(range(self.n_colors))
        for _ in range(self.sweeps):
            for c in order:
                x = self._one_color(c, x, b)
            if self.symmetric:
                for c in reversed(order):
                    x = self._one_color(c, x, b)
        return x
