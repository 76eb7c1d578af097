"""Unrolled small-dense factorizations (k ≤ 32) for the solver hot loops.

TPU motivation (reference role: the small-dense Teuchos::LAPACK calls
inside Belos/Anasazi managers,
packages/teuchos/numerics/src/Teuchos_LAPACK.hpp:96):

1. The triangular *inverse* turns the big (n, k) triangular solve of
   CholQR into one streaming MXU GEMM ``w @ R⁻¹`` — one fused pass over
   the panel instead of the column-recurrence ``triangular_solve``
   lowering, and it composes with the CGS2 GEMMs in the same fusion.
2. ``jnp.linalg.cholesky`` / ``triangular_solve`` lower tiny (8×8 …
   32×32) problems to While-loop programs of ~16-32 dependent scalar-ish
   kernels; the unrolled straight-line forms (one (k,)-row FMA per
   step) and the single-launch Pallas variant keep the factorization off
   the critical path between the Gram psum and the panel-scaling GEMM.
   (Honesty note: per-call latency of the tiny factorizations cannot be
   measured through the tunneled chip — the dispatch floor of a chained
   microbench is ~280 µs/rep regardless of payload — so the expected
   saving here is launch-count reasoning, not a measured number.)

For k > UNROLL_MAX the jnp/lax primitives are used unchanged (their
O(k³) work then amortizes the loop overhead).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

UNROLL_MAX = 32


def chol_small(g: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a small SPD matrix (unrolled k ≤ 32).

    Same contract as ``jnp.linalg.cholesky`` (no SPD floor added here —
    callers keep their own regularization). Column-wise
    Cholesky–Banachiewicz: step j is one (k,k)@(k,) FMA + rsqrt.
    """
    k = g.shape[0]
    if k > UNROLL_MAX:
        return jnp.linalg.cholesky(g)
    l = jnp.zeros_like(g)
    rows = jnp.arange(k)
    for j in range(k):
        # s[i] = g[i,j] - Σ_{p<j} l[i,p]·l[j,p]  (columns ≥ j still zero)
        s = g[:, j] - l @ l[j, :]
        col = s * lax.rsqrt(s[j])
        l = l.at[:, j].set(jnp.where(rows >= j, col, 0.0))
    return l


def tri_inv_small(r: jnp.ndarray, *, lower: bool = False) -> jnp.ndarray:
    """Inverse of a small triangular matrix (unrolled k ≤ 32).

    Row back-substitution on R·X = I: step i is one (k,)@(k,k) FMA.
    """
    k = r.shape[0]
    if k > UNROLL_MAX:
        return lax.linalg.triangular_solve(
            r, jnp.eye(k, dtype=r.dtype), left_side=True, lower=lower)
    eye = jnp.eye(k, dtype=r.dtype)
    x = jnp.zeros_like(r)
    order = range(k) if lower else reversed(range(k))
    for i in order:
        # R[i,i]·X[i,:] = e_i − Σ_{m≠i} R[i,m]·X[m,:]  (unset rows zero)
        x = x.at[i, :].set((eye[i] - r[i, :] @ x) / r[i, i])
    return x


def _chol_inv_kernel(g_ref, l_ref, linv_ref):
    """Pallas body: Cholesky factor AND its inverse in ONE kernel launch.

    Straight-line unroll on VMEM-resident (k,k) data; all contractions
    run on the VPU in f32 (no MXU — the default MXU path would truncate
    the factor's inputs to bf16). The point is launch count: the XLA
    lowering of the same math is ~16-32 dependent tiny kernels on the
    critical path between the Gram and the panel-scaling GEMM of every
    CholQR; here it is one launch."""
    g = g_ref[:]
    k = g.shape[0]
    row = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    col = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    l = jnp.zeros_like(g)
    for j in range(k):
        # s[i] = g[i,j] − Σ_{p<j} l[i,p]·l[j,p]   (VPU lane reduction)
        s = g[:, j:j + 1] - jnp.sum(l * l[j:j + 1, :], axis=1,
                                    keepdims=True)
        cj = jnp.where(row >= j, s * lax.rsqrt(s[j, 0]), 0.0)
        l = jnp.where(col == j, cj, l)  # set column j (static mask)
    l_ref[:] = l
    x = jnp.zeros_like(g)
    for i in range(k):
        # L[i,i]·X[i,:] = e_i − Σ_{m<i} L[i,m]·X[m,:]  (sublane reduction)
        e = jnp.where(col == i, 1.0, 0.0).astype(g.dtype)
        acc = jnp.sum(l[i:i + 1, :].T * x, axis=0, keepdims=True)
        x = jnp.where(row == i, (e - acc) / l[i, i], x)
    linv_ref[:] = x


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def chol_inv_small(g: jnp.ndarray, *, interpret: bool = False):
    """(L, L⁻¹) of a small SPD matrix — one fused Pallas launch on TPU.

    Fallback (CPU meshes, f64, k > UNROLL_MAX) is the unrolled jnp pair.
    Callers wanting R = Lᵀ factors use ``rinv = linv.T``.

    Mosaic lowering verified on a real v5e for every k in 1..32
    (including non-tile-aligned 3/5/12/17/24/31) — factor and inverse
    match numpy to ~1e-7.
    """
    from jax.experimental import pallas as pl

    k = g.shape[0]
    if (k <= UNROLL_MAX and g.dtype == jnp.float32
            and (interpret or _on_tpu())):
        return pl.pallas_call(
            _chol_inv_kernel,
            out_shape=(jax.ShapeDtypeStruct((k, k), g.dtype),
                       jax.ShapeDtypeStruct((k, k), g.dtype)),
            interpret=interpret,
        )(g)
    l = chol_small(g)
    return l, tri_inv_small(l, lower=True)


def chol_solve_small(g: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """g⁻¹ rhs for small SPD g via the fused factor (no floor added)."""
    _, linv = chol_inv_small(g)
    return linv.T @ (linv @ rhs)
