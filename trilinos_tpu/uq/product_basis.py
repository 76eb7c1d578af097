"""Total-order multivariate product basis + triple-product tensor.

Reference: Stokhos_CompletePolynomialBasis.hpp (tensor products of 1-D
bases over the total-degree multi-index set; computeTripleProductTensor
building the sparse <psi_i psi_j psi_k> 3-tensor used by every SG
operator), Stokhos_Sparse3Tensor.hpp.

The multivariate entries factor over dimensions:
    <Psi_I Psi_J Psi_K> = prod_d <psi_{I_d} psi_{J_d} psi_{K_d}>_d
so we compute each 1-D dense triple-product table exactly by Gauss
quadrature (degree 3p needs ceil((3p+1)/2) points) and take products —
all host numpy at setup time. P = C(d+p, p) stays small (tens to a few
hundred), so the dense (P,P,P) tensor is cheap to form and is ALSO the
device-friendly layout: PCE multiply is one einsum against it.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .bases import OneDBasis


def total_order_terms(dim: int, order: int,
                      weights=None) -> np.ndarray:
    """Multi-index set {I : sum_d w_d I_d <= order}, graded-lex ordered
    (degree-major, first term constant) as in CompletePolynomialBasis."""
    w = np.ones(dim) if weights is None else np.asarray(weights, float)

    def compositions(total, d):
        """All d-tuples of nonnegative ints summing to total, lex order."""
        if d == 1:
            yield (total,)
            return
        for head in range(total + 1):
            for tail in compositions(total - head, d - 1):
                yield (head,) + tail

    terms = [idx
             for total in range(order + 1)
             for idx in compositions(total, dim)
             if np.dot(w, idx) <= order + 1e-12]
    return np.asarray(terms, dtype=np.int64).reshape(len(terms), dim)


@dataclasses.dataclass(frozen=True)
class TotalOrderBasis:
    """Orthonormal multivariate PC basis: P terms over d variables."""

    bases: tuple[OneDBasis, ...]
    order: int
    terms: np.ndarray  # (P, d) int

    @classmethod
    def make(cls, bases, order: int, weights=None) -> "TotalOrderBasis":
        bases = tuple(bases)
        for b in bases:
            if b.order < order:
                raise ValueError(
                    f"1-D basis order {b.order} < total order {order}")
        return cls(bases=bases, order=order,
                   terms=total_order_terms(len(bases), order, weights))

    @property
    def dim(self) -> int:
        return len(self.bases)

    @property
    def size(self) -> int:
        return self.terms.shape[0]

    def evaluate(self, points: np.ndarray) -> np.ndarray:
        """Basis table Psi[q, i] = Psi_i(points[q, :]); points (Q, d)."""
        pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
        tables = [b.evaluate(pts[:, d]) for d, b in enumerate(self.bases)]
        out = np.ones((pts.shape[0], self.size))
        for d in range(self.dim):
            out *= tables[d][:, self.terms[:, d]]
        return out

    def triple_product_tensor(self) -> np.ndarray:
        """Dense C[i,j,k] = <Psi_i Psi_j Psi_k> (orthonormal basis, so
        <Psi_i^2> = 1 and C[:, :, 0] = I)."""
        p = self.order
        d1 = []
        for b in self.bases:
            nq = (3 * p) // 2 + 1  # exact for degree 3p
            x, w = b.gauss(nq)
            tab = b.evaluate(x)[:, :p + 1]  # (Q, p+1)
            d1.append(np.einsum("q,qi,qj,qk->ijk", w, tab, tab, tab,
                                optimize=True))
        t = self.terms
        c = np.ones((self.size,) * 3)
        for d in range(self.dim):
            c *= d1[d][np.ix_(t[:, d], t[:, d], t[:, d])]
        c[np.abs(c) < 1e-12] = 0.0
        return c

    def sparse_cijk(self, tol: float = 1e-12):
        """COO view (i, j, k, vals) of the nonzero triple products
        (Stokhos_Sparse3Tensor.hpp)."""
        c = self.triple_product_tensor()
        i, j, k = np.nonzero(np.abs(c) > tol)
        return i, j, k, c[i, j, k]
