"""Distributed dense LU solve (the Pliris analogue).

Reference: packages/pliris/src — Pliris.h (factor/solve of a dense
double matrix distributed over MPI ranks in a torus-wrap layout,
partial pivoting; xlu_solve.c drives factor+solve).

TPU-first design decisions:
  * **Column-block sharding**, not the reference's torus-wrap: with
    whole columns on one device, partial-pivot row swaps are LOCAL
    memory moves on every device (a row permutation never crosses
    shards), which removes the reference's pivot-row exchange traffic
    entirely. The per-panel communication is one broadcast of the
    factored panel (realized as a masked psum over the mesh axis —
    XLA lowers it onto ICI) — total volume ≈ the matrix itself.
  * Right-looking blocked algorithm, all inside ONE shard_map/jit
    program with a statically unrolled panel loop: panel owner
    factors its (m x nb) panel with `lax.linalg.lu` (partial
    pivoting), everyone applies the row permutation locally, computes
    its U12 strip by a unit-lower triangular solve, and rank-nb
    updates its trailing columns on the MXU. Finished columns are
    protected by a traced column mask (updates are computed
    everywhere for static shapes, then masked).
  * The forward substitution folds into the factor loop (b is
    replicated; the broadcast panel is reused), so the solve costs
    one extra (nb,k) psum per panel in the backward pass only.

Single-device dense solves go through `dense_solve` (XLA's native LU
on the MXU); the distributed path exists for matrices that exceed one
chip's HBM or to co-locate a dense coarse solve with already-sharded
data.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dense_solve(a, b):
    """Single-device dense solve (Pliris on one rank): XLA LU."""
    return jnp.linalg.solve(a, b)


def _bcast(val, owner, axis):
    """Broadcast from `owner` (traced) over a mesh axis via masked
    psum."""
    me = lax.axis_index(axis)
    return lax.psum(jnp.where(me == owner, val, jnp.zeros_like(val)),
                    axis)


def dist_dense_solve(mesh: Mesh, a, b, nb: int = 128,
                     axis: str | None = None):
    """Solve the dense system a @ x = b with a column-block-sharded
    LU with partial pivoting. `a` is (n, n) (host or global device
    array), `b` is (n,) or (n, k); returns x with the same trailing
    shape, replicated.

    nb: panel width (clipped to the per-device column count; must
    divide it)."""
    axis = axis or mesh.axis_names[0]
    p = mesh.shape[axis]
    a = jnp.asarray(a)
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError("a must be square")
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh size {p}")
    c = n // p
    nb = min(nb, c)
    if c % nb:
        raise ValueError(f"panel width {nb} must divide columns/shard "
                         f"{c}")
    was_1d = jnp.ndim(b) == 1
    b2 = jnp.asarray(b)
    if was_1d:
        b2 = b2[:, None]
    k = b2.shape[1]
    n_panels = n // nb

    a_sh = jax.device_put(a, NamedSharding(mesh, P(None, axis)))
    b_rep = jax.device_put(b2, NamedSharding(mesh, P()))

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, axis), P()), out_specs=P())
    def solve(a_loc, b_loc):
        me = lax.axis_index(axis)
        cols = me * c + jnp.arange(c)             # my global columns
        y = b_loc                                  # forward-solve state

        u_diags = []
        for pan in range(n_panels):
            r0 = pan * nb                          # panel top row/col
            owner_i = r0 // c                      # static owner rank
            owner = jnp.int32(owner_i)
            m = n - r0
            # non-owners slice column 0 — garbage that the broadcast
            # mask discards
            pan_cols = lax.dynamic_slice(
                a_loc, (r0, jnp.where(me == owner, r0 - owner_i * c, 0)),
                (m, nb))
            lu, _, perm = lax.linalg.lu(pan_cols)
            lu = _bcast(jnp.where(me == owner, lu, 0.0), owner, axis)
            perm = _bcast(jnp.where(me == owner, perm, 0), owner, axis)

            # local row permutation of rows >= r0 (trailing rows only)
            tail = lax.dynamic_slice(a_loc, (r0, 0), (m, c))
            a_loc = lax.dynamic_update_slice(a_loc, tail[perm], (r0, 0))
            ytail = lax.dynamic_slice(y, (r0, 0), (m, k))
            y = lax.dynamic_update_slice(y, ytail[perm], (r0, 0))

            l11 = jnp.tril(lu[:nb], -1) + jnp.eye(nb, dtype=lu.dtype)
            l21 = lu[nb:]                          # (m-nb, nb)
            u_diags.append(jnp.triu(lu[:nb]))

            # owner writes its factored panel columns back (rows >= r0
            # only — rows above the panel hold earlier U12 strips)
            is_mine = (cols >= r0) & (cols < r0 + nb)
            lu_cols = lu[:, jnp.maximum(cols - r0, 0)
                         * (cols < r0 + nb)]          # (m, c) gather
            tail2 = lax.dynamic_slice(a_loc, (r0, 0), (m, c))
            tail2 = jnp.where(is_mine[None, :], lu_cols, tail2)
            a_loc = lax.dynamic_update_slice(a_loc, tail2, (r0, 0))

            # U12 strip + rank-nb trailing update on columns > panel
            strip = lax.dynamic_slice(a_loc, (r0, 0), (nb, c))
            u12 = jax.scipy.linalg.solve_triangular(
                l11, strip, lower=True, unit_diagonal=True)
            trailing = cols >= r0 + nb
            strip_new = jnp.where(trailing[None, :], u12, strip)
            a_loc = lax.dynamic_update_slice(a_loc, strip_new, (r0, 0))
            if m > nb:
                rest = lax.dynamic_slice(a_loc, (r0 + nb, 0),
                                         (m - nb, c))
                upd = rest - jnp.dot(l21, u12,
                                     precision=lax.Precision.HIGHEST)
                rest_new = jnp.where(trailing[None, :], upd, rest)
                a_loc = lax.dynamic_update_slice(a_loc, rest_new,
                                                 (r0 + nb, 0))

            # forward substitution on the replicated RHS (reuses the
            # broadcast panel): y2 = L11^-1 y1; y_rest -= L21 y2
            y1 = lax.dynamic_slice(y, (r0, 0), (nb, k))
            y2 = jax.scipy.linalg.solve_triangular(
                l11, y1, lower=True, unit_diagonal=True)
            y = lax.dynamic_update_slice(y, y2, (r0, 0))
            if m > nb:
                yrest = lax.dynamic_slice(y, (r0 + nb, 0), (m - nb, k))
                yrest = yrest - jnp.dot(
                    l21, y2, precision=lax.Precision.HIGHEST)
                y = lax.dynamic_update_slice(y, yrest, (r0 + nb, 0))

        # backward substitution: x_p = U11^-1 (y_p - sum_{q>p} U_pq x_q)
        x = jnp.zeros_like(y)
        for pan in reversed(range(n_panels)):
            r0 = pan * nb
            solved = cols >= r0 + nb               # columns with known x
            xmine = lax.dynamic_slice(
                x, (me * c, jnp.zeros_like(me)), (c, k))
            strip = lax.dynamic_slice(a_loc, (r0, 0), (nb, c))
            part = jnp.dot(strip,
                           jnp.where(solved[:, None], xmine, 0.0),
                           precision=lax.Precision.HIGHEST)
            part = lax.psum(part, axis)
            rhs = lax.dynamic_slice(y, (r0, 0), (nb, k)) - part
            xp = jax.scipy.linalg.solve_triangular(
                u_diags[pan], rhs, lower=False)
            x = lax.dynamic_update_slice(x, xp, (r0, 0))
        return x

    x = solve(a_sh, b_rep)
    return x[:, 0] if was_1d else x
