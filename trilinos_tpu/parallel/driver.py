"""Mesh drivers: shard_map wrappers turning per-shard kernels into global
jitted programs.

The TPU-native replacement for the reference's solve-side MPI plumbing:
where Trilinos runs one OS process per rank with an MpiComm, here ONE
program is jitted over a ``jax.sharding.Mesh`` axis ('rows'); per-shard
code (halo exchange, local SpMV, local dots) runs under ``jax.shard_map``
and reductions lower to psum over ICI (SURVEY.md §2.3 mapping).

Distributed preconditioning follows the Ifpack2 split (§3.5): the
preconditioner's *state* is row-sharded arrays (diagonals, factors); its
apply is a per-shard closure built inside shard_map via ``DistPrecond.make``.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.formats import CsrHost
from ..solvers.base import SolveResult
from .comm import AxisComm, Comm
from .distmatrix import DistMatrix, apply_local, unstack_local
from .map import Map

AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested {n} mesh devices but only {len(devs)} available "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            f"before importing jax for a virtual CPU mesh)")
    return Mesh(np.array(devs[:n]), (axis,))


# ---------------------------------------------------------------------------
# distributed preconditioners
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistPrecond:
    """Sharded preconditioner state + a static builder for the per-shard
    apply closure. ``arrays`` leaves carry a leading shard axis."""

    arrays: dict
    kind: str = dataclasses.field(metadata=dict(static=True))
    consts: tuple = dataclasses.field(metadata=dict(static=True), default=())

    def make(self, comm: Comm, op: Callable) -> Callable:
        local = unstack_local(self.arrays)
        if self.kind == "identity":
            return lambda x: x
        if self.kind == "jacobi":
            dinv = local["dinv"]
            return lambda x: (dinv if jnp.ndim(x) == 1 else dinv[:, None]) * x
        if self.kind == "ilu0":
            from ..ops.formats import EllMatrix
            from ..ops.matvec import spmv

            (sweeps,) = self.consts

            def mk(cols, vals):
                n = cols.shape[0]
                return EllMatrix(cols=cols, vals=vals, n_rows=n, n_cols=n,
                                 nnz=0)

            l_m = mk(local["l_cols"], local["l_vals"])
            u_m = mk(local["u_cols"], local["u_vals"])
            udinv_v = local["udinv"]

            def ilu_apply(r):
                udinv = udinv_v if r.ndim == 1 else udinv_v[:, None]
                y = r
                for _ in range(sweeps):
                    y = r - (spmv(l_m, y) - y)
                x = udinv * y
                for _ in range(sweeps):
                    x = x + udinv * (y - spmv(u_m, x))
                return x

            return ilu_apply
        if self.kind == "chebyshev":
            dinv = local["dinv"]
            lmax, lmin, degree = self.consts

            def cheb(b):
                di = dinv if b.ndim == 1 else dinv[:, None]
                theta = (lmax + lmin) / 2
                delta = (lmax - lmin) / 2
                sigma1 = theta / delta
                rho = 1.0 / sigma1
                z = di * b
                d_vec = z / theta
                x = d_vec
                r = b
                for _ in range(degree - 1):
                    r = r - op(d_vec)
                    z = di * r
                    rho_new = 1.0 / (2 * sigma1 - rho)
                    d_vec = (rho_new * rho) * d_vec + (2 * rho_new / delta) * z
                    x = x + d_vec
                    rho = rho_new
                return x

            return cheb
        raise ValueError(f"unknown DistPrecond kind {self.kind!r}")


def dist_jacobi(a: CsrHost, rmap: Map, dtype=None) -> DistPrecond:
    """Row-sharded inverse-diagonal (the distributed Ifpack2 RELAXATION)."""
    dtype = dtype or a.vals.dtype
    d = a.diagonal().astype(np.float64)
    dinv_g = 1.0 / np.where(d != 0, d, 1.0)
    stacked = rmap.to_padded(dinv_g)
    # identity on padding rows
    for s in range(rmap.n_shards):
        lo = s * rmap.n_local_pad + rmap.n_owned(s)
        stacked[lo:(s + 1) * rmap.n_local_pad] = 1.0
    arr = jnp.asarray(stacked.reshape(rmap.n_shards, rmap.n_local_pad),
                      dtype=dtype)
    return DistPrecond(arrays={"dinv": arr}, kind="jacobi")


def dist_chebyshev(a: CsrHost, rmap: Map, lmax: float, lmin: float | None = None,
                   degree: int = 4, ratio: float = 30.0,
                   dtype=None) -> DistPrecond:
    base = dist_jacobi(a, rmap, dtype)
    lmin = lmin if lmin is not None else lmax / ratio
    return DistPrecond(arrays=base.arrays, kind="chebyshev",
                       consts=(float(lmax), float(lmin), int(degree)))


def dist_ilu0(a: CsrHost, rmap: Map, sweeps: int = 6,
              dtype=None) -> DistPrecond:
    """Per-shard local ILU(0) (block-Jacobi ILU): each shard factors its
    LocalFilter (off-shard couplings dropped) — exactly the reference's
    parallel ILU composition (Ifpack2 LocalFilter + RILUK, SURVEY §3.5);
    the apply is the fixed-sweep Jacobi triangular solve."""
    import jax.numpy as jnp
    import numpy as np

    from ..ops.formats import csr_to_ell
    from ..precond.ilu import ilu0_factor

    dtype = dtype or a.vals.dtype
    npl = rmap.n_local_pad
    rows_all = np.repeat(np.arange(a.shape[0], dtype=np.int64),
                         a.row_lengths())
    shards = []
    for s in range(rmap.n_shards):
        lo, hi = rmap.shard_lo(s), rmap.shard_hi(s)
        sl = slice(a.row_ptr[lo], a.row_ptr[hi])
        rs, cs, vs = rows_all[sl], a.cols[sl].astype(np.int64), a.vals[sl]
        keep = (cs >= lo) & (cs < hi)
        local = CsrHost.from_coo(rs[keep] - lo, cs[keep] - lo, vs[keep],
                                 (hi - lo, hi - lo))
        l_m, u_m = ilu0_factor(local)
        shards.append((l_m, u_m))
    kl = max(max(l.max_row_length() for l, _ in shards), 1)
    ku = max(max(u.max_row_length() for _, u in shards), 1)
    l_cols, l_vals, u_cols, u_vals, udinvs = [], [], [], [], []
    for s, (l_m, u_m) in enumerate(shards):
        le = csr_to_ell(l_m, dtype=dtype, k=kl, n_rows_pad=npl)
        ue = csr_to_ell(u_m, dtype=dtype, k=ku, n_rows_pad=npl)
        l_cols.append(le.cols)
        l_vals.append(le.vals)
        u_cols.append(ue.cols)
        u_vals.append(ue.vals)
        du = u_m.diagonal().astype(np.float64)
        dv = np.ones(npl)
        dv[: len(du)] = 1.0 / np.where(du != 0, du, 1.0)
        udinvs.append(jnp.asarray(dv, dtype=dtype))
    arrays = {
        "l_cols": jnp.stack(l_cols), "l_vals": jnp.stack(l_vals),
        "u_cols": jnp.stack(u_cols), "u_vals": jnp.stack(u_vals),
        "udinv": jnp.stack(udinvs),
    }
    return DistPrecond(arrays=arrays, kind="ilu0", consts=(int(sweeps),))


def identity_precond() -> DistPrecond:
    return DistPrecond(arrays={}, kind="identity")


# ---------------------------------------------------------------------------
# global entry points
# ---------------------------------------------------------------------------


def dist_spmv(a: DistMatrix, x: jax.Array, mesh: Mesh) -> jax.Array:
    """Global distributed SpMV on a padded sharded vector."""
    n_shards = a.row_map.n_shards
    vec_spec = P(AXIS) if x.ndim == 1 else P(AXIS, None)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS), vec_spec), out_specs=vec_spec)
    def run(a_sh, x_loc):
        al = unstack_local(a_sh)
        return apply_local(al.interior, al.boundary, al.plan, x_loc, AXIS,
                           n_shards)

    return run(a, x)


def dist_solve(solver: Callable, a: DistMatrix, b: jax.Array,
               x0: jax.Array | None = None, *, mesh: Mesh,
               prec: DistPrecond | None = None, **solver_kw) -> SolveResult:
    """Run any Krylov driver from ``trilinos_tpu.solvers`` over the mesh.

    ``b`` (and optional ``x0``) are padded sharded vectors
    (row_map.n_global_pad long). The whole solve — operator applies, halo
    exchanges, reductions — is ONE jitted program over the mesh.
    """
    n_shards = a.row_map.n_shards
    prec = prec or identity_precond()
    vec_spec = P(AXIS) if b.ndim == 1 else P(AXIS, None)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    scal_spec = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), vec_spec, vec_spec, P(AXIS)),
        out_specs=SolveResult(x=vec_spec, iters=scal_spec,
                              resnorm=scal_spec, converged=scal_spec))
    def run(a_sh, b_loc, x0_loc, prec_sh):
        al = unstack_local(a_sh)
        comm = AxisComm(AXIS, n_shards)
        op = lambda v: apply_local(al.interior, al.boundary, al.plan, v,
                                   AXIS, n_shards)
        prec_local = DistPrecond(arrays=prec_sh, kind=prec.kind,
                                 consts=prec.consts)
        m = prec_local.make(comm, op)
        return solver(op, b_loc, x0=x0_loc, prec=m, comm=comm, **solver_kw)

    return run(a, b, x0, prec.arrays)
