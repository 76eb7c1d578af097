"""Karhunen-Loeve expansion of exponential-covariance random fields.

Reference: stokhos/src/Stokhos_KL_OneDExponentialCovarianceFunction.hpp
(analytic eigenpairs of C(x,y) = sigma^2 exp(-|x-y|/L) on an interval via
the classical transcendental equations) and
Stokhos_KL_ExponentialRandomField.hpp (multi-D fields as tensor products
of 1-D eigenpairs, truncated to the M largest product eigenvalues).

All eigen-setup is host numpy (bisection on the frequency equations);
``sample``/``modes`` produce dense arrays for device use: a field
realization is one (n_pts, M) @ (M,) GEMV, and an SG diffusion operator
takes the per-mode coefficient fields directly.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _bisect(f, lo: float, hi: float, iters: int = 200) -> float:
    flo = f(lo)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if f(mid) == 0.0:
            return mid
        if (f(mid) > 0) == (flo > 0):
            lo, flo = mid, f(mid)
        else:
            hi = mid
    return 0.5 * (lo + hi)


@dataclasses.dataclass(frozen=True)
class ExponentialKL1D:
    """Truncated KL of sigma^2 exp(-|x-y|/L) on [-a, a]: M eigenpairs.

    Even modes cos(w x), frequencies solving 1/L = w tan(w a); odd modes
    sin(w x), frequencies solving w = -(1/L) tan(w a); eigenvalues
    lambda = 2 (1/L) sigma^2 / (w^2 + 1/L^2), sorted descending.
    """

    a: float
    corr_len: float
    sigma: float
    omega: np.ndarray    # (M,)
    lam: np.ndarray      # (M,) descending
    is_even: np.ndarray  # (M,) bool

    @classmethod
    def make(cls, m_terms: int, a: float = 1.0, corr_len: float = 1.0,
             sigma: float = 1.0) -> "ExponentialKL1D":
        c = 1.0 / corr_len
        eps = 1e-9
        evens, odds = [], []
        k = 0
        # frequencies interleave: one even root per (k pi/a, (k+1/2) pi/a),
        # one odd root per ((k+1/2) pi/a, (k+1) pi/a)
        while len(evens) + len(odds) < m_terms + 1:
            lo, hi = k * np.pi / a, (k + 0.5) * np.pi / a
            evens.append(_bisect(
                lambda w: c - w * np.tan(w * a), lo + eps, hi - eps))
            lo, hi = (k + 0.5) * np.pi / a, (k + 1) * np.pi / a
            odds.append(_bisect(
                lambda w: w + c * np.tan(w * a), lo + eps, hi - eps))
            k += 1
        omega = np.array([w for pair in zip(evens, odds) for w in pair])
        is_even = np.array([True, False] * len(evens))
        lam = 2.0 * c * sigma ** 2 / (omega ** 2 + c ** 2)
        order = np.argsort(-lam)[:m_terms]
        return cls(a=a, corr_len=corr_len, sigma=sigma, omega=omega[order],
                   lam=lam[order], is_even=is_even[order])

    def modes(self, x: np.ndarray) -> np.ndarray:
        """sqrt(lambda_k) f_k(x) table, shape (len(x), M) — the per-mode
        coefficient fields of g = mu + sum_k modes[:, k] xi_k."""
        x = np.asarray(x, dtype=np.float64)[:, None]
        w = self.omega[None, :]
        a = self.a
        even_nrm = np.sqrt(a + np.sin(2 * w * a) / (2 * w))
        odd_nrm = np.sqrt(a - np.sin(2 * w * a) / (2 * w))
        f = np.where(self.is_even[None, :],
                     np.cos(w * x) / even_nrm,
                     np.sin(w * x) / odd_nrm)
        return np.sqrt(self.lam)[None, :] * f

    def covariance_error(self, x: np.ndarray) -> float:
        """Max abs error of the truncated covariance on the grid x."""
        m = self.modes(x)
        cov_m = m @ m.T
        d = np.abs(x[:, None] - x[None, :])
        cov = self.sigma ** 2 * np.exp(-d / self.corr_len)
        return float(np.abs(cov_m - cov).max())


def exponential_kl(m_terms: int, points: np.ndarray, *,
                   corr_len: float = 1.0, sigma: float = 1.0,
                   mean: float = 0.0):
    """Multi-D KL field on arbitrary points (n, dim) in [-1, 1]^dim:
    tensor products of 1-D eigenpairs truncated to the M largest product
    eigenvalues (Stokhos_KL_ExponentialRandomField.hpp:58).

    Returns (mean, modes) with modes (n, m_terms): a realization is
    ``mean + modes @ xi`` for standard-normal xi.
    """
    pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
    if pts.shape[1] == 1:
        kl = ExponentialKL1D.make(m_terms, a=1.0, corr_len=corr_len,
                                  sigma=sigma)
        return mean, kl.modes(pts[:, 0])
    dim = pts.shape[1]
    kl1 = ExponentialKL1D.make(m_terms, a=1.0, corr_len=corr_len,
                               sigma=sigma)
    # product eigenvalues over all dim-tuples of the 1-D indices
    idx = np.indices((m_terms,) * dim).reshape(dim, -1).T  # (m^dim, dim)
    lam_prod = np.prod(kl1.lam[idx], axis=1)
    top = np.argsort(-lam_prod)[:m_terms]
    tables = [kl1.modes(pts[:, d]) / np.sqrt(kl1.lam)[None, :]
              for d in range(dim)]  # unscaled eigenfunctions
    modes = np.ones((pts.shape[0], m_terms))
    for d in range(dim):
        modes *= tables[d][:, idx[top, d]]
    return mean, modes * np.sqrt(lam_prod[top])[None, :]
