"""1-D orthogonal polynomial bases defined by three-term recurrences.

Reference: Stokhos_RecurrenceBasis.hpp (recurrence-coefficient protocol:
getRecurrenceCoefficients / evaluateBases / norm_squared / quadrature by
Golub–Welsch), Stokhos_HermiteBasis.hpp, Stokhos_LegendreBasis.hpp,
Stokhos_JacobiBasis.hpp, Stokhos_RysBasis.hpp.

Everything here is host numpy: the basis is a SETUP object; device work
consumes only the dense arrays it produces (Vandermonde-style evaluation
tables, quadrature nodes/weights, triple-product tensors).

Convention: the monic recurrence
    q_{k+1}(x) = (x - alpha_k) q_k(x) - beta_k q_{k-1}(x)
with q_0 = 1, beta_0 = integral of the weight (so norms fall out of the
betas: ||q_k||^2 = prod_{j<=k} beta_j). Weights are PROBABILITY measures
(they integrate to 1, beta_0 = 1): Hermite <-> standard normal N(0,1),
Legendre <-> uniform on [-1,1], Jacobi <-> Beta-type on [-1,1]. The
public basis is the ORTHONORMAL family psi_k = q_k / ||q_k||, which makes
<psi_i psi_j> = delta_ij and keeps every downstream tensor well scaled in
f32 (Stokhos keeps unnormalized polys + a norm_squared() side array;
normalizing at the source is the numerically safer equivalent).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class OneDBasis:
    """Orthonormal 1-D polynomial family of size order+1 under a
    probability weight, defined by its monic recurrence coefficients."""

    name: str
    order: int
    alpha: np.ndarray  # (order+1,) monic recurrence alpha_k
    beta: np.ndarray   # (order+1,) monic recurrence beta_k; beta_0 = 1
    params: tuple = ()  # extra constructor args (jacobi a/b, rys cut)

    @property
    def size(self) -> int:
        return self.order + 1

    def norms_monic(self) -> np.ndarray:
        """||q_k||^2 of the monic family (cumulative product of betas)."""
        return np.cumprod(self.beta)

    def evaluate(self, points: np.ndarray) -> np.ndarray:
        """Orthonormal basis table Psi[q, k] = psi_k(points[q])."""
        x = np.asarray(points, dtype=np.float64).ravel()
        n = self.size
        q = np.zeros((x.size, n + 1))
        q[:, 0] = 1.0
        if n > 1:
            q[:, 1] = x - self.alpha[0]
        for k in range(1, n - 1):
            q[:, k + 1] = (x - self.alpha[k]) * q[:, k] \
                - self.beta[k] * q[:, k - 1]
        return q[:, :n] / np.sqrt(self.norms_monic()[:n])

    def gauss(self, n_points: int):
        """Gauss nodes/weights by Golub–Welsch on the Jacobi matrix.

        Requires recurrence coefficients up to n_points; bases are built
        with enough slack (see the constructors) or extended on demand.
        """
        a, b = _extend(self, n_points)
        d = a[:n_points]
        e = np.sqrt(b[1:n_points])
        w, v = np.linalg.eigh(_tridiag(d, e))
        return w, v[0, :] ** 2  # beta_0 = 1 (probability weight)

    def quad_degree_of_exactness(self, n_points: int) -> int:
        return 2 * n_points - 1


def _tridiag(d: np.ndarray, e: np.ndarray) -> np.ndarray:
    t = np.diag(d)
    idx = np.arange(len(e))
    t[idx, idx + 1] = e
    t[idx + 1, idx] = e
    return t


def _extend(basis: OneDBasis, n: int):
    """Recurrence coefficients out to index n-1 (recompute analytically
    for the named families; Rys re-runs Stieltjes)."""
    if len(basis.alpha) >= n:
        return basis.alpha, basis.beta
    fresh = _MAKERS[basis.name](n - 1, *basis.params)
    return fresh.alpha, fresh.beta


def hermite_basis(order: int) -> OneDBasis:
    """Probabilists' Hermite: weight N(0,1). alpha_k = 0, beta_k = k.

    Stokhos_HermiteBasis.hpp:47 (there via the physicists' scaling; the
    probabilists' normalization matches its default rho = N(0,1) usage).
    """
    k = np.arange(order + 2, dtype=np.float64)
    beta = k.copy()
    beta[0] = 1.0
    return OneDBasis("hermite", order, np.zeros(order + 2), beta)


def legendre_basis(order: int) -> OneDBasis:
    """Legendre: uniform weight on [-1,1]. beta_k = k^2/(4k^2-1).

    Stokhos_LegendreBasis.hpp:47.
    """
    k = np.arange(order + 2, dtype=np.float64)
    beta = k * k / (4.0 * k * k - 1.0)
    beta[0] = 1.0
    return OneDBasis("legendre", order, np.zeros(order + 2), beta)


def jacobi_basis(order: int, a: float, b: float) -> OneDBasis:
    """Jacobi(a, b): weight ∝ (1-x)^a (1+x)^b on [-1,1].

    Stokhos_JacobiBasis.hpp:50. Monic recurrence from the standard
    Jacobi-polynomial coefficient formulas.
    """
    k = np.arange(order + 2, dtype=np.float64)
    ab = a + b
    den = (2 * k + ab) * (2 * k + ab + 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (b * b - a * a) / np.where(den == 0, 1.0, den)
    if ab == 0 or ab == -1:  # 0/0 limit at k=0
        alpha[0] = (b - a) / (ab + 2)
    bden = (2 * k + ab) ** 2 * (2 * k + ab + 1) * (2 * k + ab - 1)
    bnum = 4 * k * (k + a) * (k + b) * (k + ab)
    with np.errstate(divide="ignore", invalid="ignore"):
        beta = bnum / np.where(bden == 0, 1.0, bden)
    if ab == 1:  # k=1 denominator zero in some corners
        beta[1] = 4 * (1 + a) * (1 + b) / ((ab + 2) ** 2 * (ab + 3))
    beta[0] = 1.0
    return OneDBasis("jacobi", order, alpha, beta, params=(a, b))


def rys_basis(order: int, cut: float = 3.0, n_quad: int = 200) -> OneDBasis:
    """Rys: truncated-Gaussian weight exp(-x^2/2) on [-cut, cut],
    coefficients by the discretized Stieltjes procedure.

    Stokhos_RysBasis.hpp:44 (there via DiscretizedStieltjesBasis).
    """
    # dense Gauss-Legendre grid on [-cut, cut] carries the measure
    xs, ws = np.polynomial.legendre.leggauss(n_quad)
    xs = xs * cut
    ws = ws * cut * np.exp(-xs * xs / 2.0)
    ws = ws / ws.sum()  # probability normalization
    n = order + 2
    alpha = np.zeros(n)
    beta = np.zeros(n)
    beta[0] = 1.0
    q_km1 = np.zeros_like(xs)
    q_k = np.ones_like(xs)
    nrm_k = 1.0
    for k in range(n - 1):
        alpha[k] = np.sum(ws * xs * q_k * q_k) / nrm_k
        q_kp1 = (xs - alpha[k]) * q_k - (beta[k] if k else 0.0) * q_km1
        nrm_kp1 = np.sum(ws * q_kp1 * q_kp1)
        beta[k + 1] = nrm_kp1 / nrm_k
        q_km1, q_k, nrm_k = q_k, q_kp1, nrm_kp1
    return OneDBasis("rys", order, alpha, beta, params=(cut, n_quad))


_MAKERS = {"hermite": hermite_basis, "legendre": legendre_basis,
           "jacobi": jacobi_basis, "rys": rys_basis}
