"""Multivariate quadrature: tensor product and Smolyak sparse grids.

Reference: Stokhos_TensorProductQuadrature.hpp (full tensor Gauss rules),
Stokhos_SparseGridQuadrature.hpp / Stokhos_SmolyakSparseGridQuadrature.hpp
(isotropic/anisotropic Smolyak via the combination technique; the
reference delegates node generation to Dakota/webbur — here the
combination technique is implemented directly on the Gauss rules, which
covers the same use: quadrature whose point count grows polynomially, not
exponentially, in dimension).

Host-numpy setup; results are plain (Q, d) points + (Q,) weights arrays
that feed device GEMM projections.
"""

from __future__ import annotations

import dataclasses
import itertools
from math import comb

import numpy as np

from .bases import OneDBasis


@dataclasses.dataclass(frozen=True)
class Quadrature:
    points: np.ndarray   # (Q, d)
    weights: np.ndarray  # (Q,) — sum to 1 for probability weights


def tensor_quadrature(bases, n_points) -> Quadrature:
    """Full tensor Gauss rule; ``n_points`` an int or per-dim list."""
    bases = tuple(bases)
    d = len(bases)
    if np.isscalar(n_points):
        n_points = [int(n_points)] * d
    rules = [b.gauss(n) for b, n in zip(bases, n_points)]
    pts = np.array(list(itertools.product(*[r[0] for r in rules])))
    wts = np.array([np.prod(ws) for ws in
                    itertools.product(*[r[1] for r in rules])])
    return Quadrature(points=pts.reshape(-1, d), weights=wts)


def _growth_linear(level: int) -> int:
    return level + 1


def smolyak_quadrature(bases, level: int, growth=_growth_linear,
                       weights=None) -> Quadrature:
    """Smolyak sparse grid by the combination technique.

    Sums signed tensor rules over levels ``l`` with
    ``level - d + 1 <= |l| <= level`` (isotropic case), coefficient
    (-1)^(level-|l|) C(d-1, level-|l|); anisotropic ``weights`` select
    the index set {l : sum w_d l_d <= level} with inclusion–exclusion
    coefficients computed directly. Duplicate points across component
    rules are merged by coordinate key so the returned rule is minimal.
    """
    bases = tuple(bases)
    d = len(bases)
    agg: dict[tuple, float] = {}
    pt_of: dict[tuple, np.ndarray] = {}

    def add_rule(lvl_vec, coeff):
        rules = [b.gauss(growth(l)) for b, l in zip(bases, lvl_vec)]
        for xs in itertools.product(*[range(len(r[0])) for r in rules]):
            p = np.array([rules[k][0][xs[k]] for k in range(d)])
            w = coeff * np.prod([rules[k][1][xs[k]] for k in range(d)])
            key = tuple(np.round(p, 12))
            agg[key] = agg.get(key, 0.0) + w
            pt_of[key] = p

    if weights is None:
        for total in range(max(level - d + 1, 0), level + 1):
            coeff = (-1) ** (level - total) * comb(d - 1, level - total)
            for lvl_vec in _compositions(total, d):
                add_rule(lvl_vec, coeff)
    else:
        w = np.asarray(weights, float)
        in_set = {lv for total in range(level + 1)
                  for lv in _compositions(total, d)
                  if np.dot(w, lv) <= level + 1e-12}
        # combination coefficient: sum over unit-box corners inside set
        for lv in in_set:
            coeff = 0
            for e in itertools.product((0, 1), repeat=d):
                shifted = tuple(np.add(lv, e))
                if shifted in in_set:
                    coeff += (-1) ** sum(e)
            if coeff:
                add_rule(lv, coeff)

    keys = [k for k in agg if abs(agg[k]) > 1e-14]
    pts = np.array([pt_of[k] for k in keys]).reshape(len(keys), d)
    wts = np.array([agg[k] for k in keys])
    return Quadrature(points=pts, weights=wts)


def _compositions(total: int, d: int):
    if d == 1:
        yield (total,)
        return
    for head in range(total + 1):
        for tail in _compositions(total - head, d - 1):
            yield (head,) + tail
