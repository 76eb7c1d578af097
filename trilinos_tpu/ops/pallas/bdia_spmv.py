"""Pallas TPU kernel: block-diagonal (block-stencil) SpMV/SpMM.

The BDIA apply on residue planes,

    yp[i, q] += data[d, i, j, q] * xp[j, q + offsets[d]],

is structurally the DIA apply with an extra (b × b) plane nest, so this
kernel reuses the windowed double-buffered-DMA design of
``dia_spmv.py``: x planes are packed (host-visible, in-graph) into a
single leading planes axis P = b·k of shape (P, R, 128); an overlapping
window [block − halo, block + halo] is DMA'd into a double-buffered VMEM
scratch; each block offset o = ro·128 + lo becomes a static sublane
slice + lane rotate + select shared by all b² plane pairs of that offset,
and the (i, j) nest addresses planes with STATIC slices of the P axis
(in plane p = i·k + m, m indexes the k right-hand sides). Block data
streams through the pipelined BlockSpec path.

The kernel state is deliberately identical in rank to the proven DIA
multivector kernel (window (2, P, wrows, 128), copies with ONE leading
full axis): an earlier variant keeping (b, k) as two separate leading
window axes passed interpret mode but produced wrong values when
COMPILED on the chip at k>1 (silent miscompile of the multi-leading-axis
windowed DMA) — do not reintroduce it.

Traffic per apply ≈ data (nd·b²·NBR = stored nnz) + x (n + 2·halo) + y
(n) — exact stored-value traffic, the roofline a stored block format can
reach. The reference's BSR spmv (kokkos-kernels/src/sparse/impl/
KokkosSparse_spmv_bsrmatrix_impl.hpp) gathers blocks per row instead;
gathers are the one thing the TPU memory system punishes, hence this
format. Compute is nd·b² VPU FMAs per 128-lane row — for Q1 elasticity
(b=2, nd=9) 36 FMAs per 18 loaded values, under the VPU roofline at f32.

Constraints (``bdia_pallas_applicable``): f32/bf16; NBR % 128 == 0;
nd·b² ≤ 256 (unroll budget); b·k ≤ 32; a block size br | R fitting VMEM.
Anything else falls back to the XLA plane path (ops.matvec.bdia_spmm).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BdiaMatrix

LANES = 128
MAX_BR = 2048


def _plan(offsets, b, nbr_pad, nd, k) -> tuple[int, int] | None:
    if nbr_pad % LANES != 0 or k < 1 or b * k > 32 or nd * b * b > 256:
        return None
    r = nbr_pad // LANES
    min_br = max((abs(o) // LANES + 2 for o in offsets), default=1)
    h = ((min_br + 7) // 8) * 8
    row_bytes = LANES * 4
    vmem_budget = 13 * 2 ** 20
    top = (min(r // 2, MAX_BR) // 8) * 8
    for cand in range(top, 7, -8):
        # cand >= h: clipped mid-block window starts shift every read
        # (see dia_spmv._plan)
        if r % cand != 0 or cand + 2 * h > r or cand < h:
            continue
        need = 2 * row_bytes * (nd * b * b * cand
                                + b * k * (cand + 2 * h) + b * k * cand)
        if need <= vmem_budget:
            return cand, h
    return None


def bdia_pallas_applicable(a: BdiaMatrix, k: int = 1) -> bool:
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _plan(a.offsets, a.block_size, a.nbr_pad,
                 len(a.offsets), k) is not None


def _kernel(offsets, b, br, h, r, k, data_ref, x_hbm, y_ref, win, sem):
    blk = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h
    p = b * k

    def issue(step, slot, wait):
        is_first = step == 0
        is_last = step == nb - 1

        def run(d):
            d.wait() if wait else d.start()

        @pl.when(is_first)
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, br + h), :],
                win.at[slot, :, pl.ds(h, br + h)], sem.at[slot]))

        @pl.when(jnp.logical_and(jnp.logical_not(is_first),
                                 jnp.logical_not(is_last)))
        def _():
            start = jnp.clip(step * br - h, 0, r - wrows)
            run(pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(start, wrows), :],
                win.at[slot], sem.at[slot]))

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(r - (br + h), br + h), :],
                win.at[slot, :, pl.ds(0, br + h)], sem.at[slot]))

    # One-time halo zeroing with STATIC slot indices before any DMA (same
    # rationale as dia_spmv._kernel: uninitialized VMEM may hold NaN/Inf;
    # after this, stale halo rows are finite values annihilated by the
    # zero coefficients, and no dynamic scratch writes serialize the
    # double-buffer pipeline).
    @pl.when(blk == 0)
    def _():
        zero = jnp.zeros((p, h, LANES), dtype=win.dtype)
        win[0, :, pl.ds(0, h)] = zero
        win[0, :, pl.ds(br + h, h)] = zero
        win[1, :, pl.ds(0, h)] = zero
        win[1, :, pl.ds(br + h, h)] = zero
        issue(0, 0, wait=False)

    slot = lax.rem(blk, jnp.int32(2))

    @pl.when(blk + 1 < nb)
    def _():
        issue(blk + 1, lax.rem(blk + 1, jnp.int32(2)), wait=False)

    issue(blk, slot, wait=True)

    window = win.at[slot]
    lane = lax.broadcasted_iota(jnp.int32, (p, br, LANES), 2)
    accs = [jnp.zeros((k, br, LANES), dtype=jnp.float32) for _ in range(b)]
    for d, o in enumerate(offsets):
        ro, lo = divmod(o, LANES)
        a_blk = window[:, pl.ds(h + ro, br)]
        if lo == 0:
            shifted = a_blk
        else:
            b_blk = window[:, pl.ds(h + ro + 1, br)]
            ra = pltpu.roll(a_blk, LANES - lo, 2)
            rb = pltpu.roll(b_blk, LANES - lo, 2)
            shifted = jnp.where(lane < LANES - lo, ra, rb)
        shifted = shifted.astype(jnp.float32)  # (p, br, 128)
        for i in range(b):
            for j in range(b):
                accs[i] = accs[i] + (
                    data_ref[(d * b + i) * b + j].astype(jnp.float32)[None]
                    * shifted[j * k:(j + 1) * k])
    y_ref[:] = jnp.concatenate(accs, axis=0).astype(y_ref.dtype)


def bdia_spmm_packed(a: BdiaMatrix, xk: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """SpMM on a PACKED plane multivector xk of shape (b·k, R, 128),
    plane p = i·k + m (residue i, right-hand side m)."""
    b = a.block_size
    nbr = a.nbr_pad
    r = nbr // LANES
    p = xk.shape[0]
    assert p % b == 0
    k = p // b
    nd = len(a.offsets)
    plan = _plan(a.offsets, b, nbr, nd, k)
    if plan is None:
        raise ValueError("bdia_spmm_packed: not applicable (use XLA path)")
    br, h = plan
    nb = r // br
    data3 = (a.data if a.data.ndim == 3
             else a.data.reshape(nd * b * b, r, LANES))
    out = pl.pallas_call(
        functools.partial(_kernel, a.offsets, b, br, h, r, k),
        out_shape=jax.ShapeDtypeStruct((p, r, LANES), xk.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd * b * b, br, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((p, br, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, p, br + 2 * h, LANES), xk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * b * b * nbr * k,
            bytes_accessed=(nd * b * b + 2 * b * k) * nbr
            * xk.dtype.itemsize,
            transcendentals=0,
        ),
    )(data3, xk)
    return out


def _pack_planes(a: BdiaMatrix, x2: jax.Array) -> jax.Array:
    """(n_pad, k) -> (b·k, R, 128) packed planes, plane p = i·k + m."""
    b = a.block_size
    r = a.nbr_pad // LANES
    k = x2.shape[1]
    return x2.reshape(a.nbr_pad, b, k).transpose(1, 2, 0).reshape(
        b * k, r, LANES)


def _unpack_planes(a: BdiaMatrix, yk: jax.Array) -> jax.Array:
    b = a.block_size
    k = yk.shape[0] // b
    return yk.reshape(b, k, a.nbr_pad).transpose(2, 0, 1).reshape(
        a.n_rows_pad, k)


def bdia_spmm_pallas(a: BdiaMatrix, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """SpMM for x of shape (n_pad, k): packs to planes, runs the kernel,
    unpacks. The de-interleave transposes cost 2·2·k·n extra bytes but the
    block-data stream (the dominant traffic) is read once, gather-free."""
    yk = bdia_spmm_packed(a, _pack_planes(a, x), interpret=interpret)
    return _unpack_planes(a, yk)


def bdia_spmv_pallas(a: BdiaMatrix, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    return bdia_spmm_pallas(a, x[:, None], interpret=interpret)[:, 0]


def bdia_plane_solver_op(a: BdiaMatrix, k: int = 1):
    """Solve in PLANE layout: returns ``(op, pack, unpack)``.

    The interleaved→plane de-interleave is a minor-dim-b transpose that
    costs ~0.8 ms/pass on TPU at 1M rows (minor-dim-2 transposes lower
    pathologically) — 8× the kernel itself. Krylov dots/axpys are
    permutation-invariant, so the TPU-correct structure is to run the
    WHOLE solve on the packed-plane vector (flattened to 1-D; the
    (P,R,128) ↔ (n,) reshape is layout-free) and pay pack/unpack once
    per solve, not once per iteration:

        op, pack, unpack = bdia_plane_solver_op(a)
        res = cg(op, pack(b), ...)
        x = unpack(res.x)

    Per-iteration apply is then the pure kernel (~450 GB/s measured vs
    ~47 GB/s through per-apply repacking)."""
    b = a.block_size
    r = a.nbr_pad // LANES
    p = b * k
    from . import _on_tpu

    use_kernel = _on_tpu() and bdia_pallas_applicable(a, k)

    def _op_xla(v: jax.Array) -> jax.Array:
        """Plane-space XLA apply (shape-preserving fallback)."""
        xp = v.reshape(b, k, a.nbr_pad)
        data = a.data_flat
        accs = [jnp.zeros((k, a.nbr_pad), dtype=xp.dtype) for _ in range(b)]
        for d, off in enumerate(a.offsets):
            shifted = jnp.roll(xp, -off, axis=2) if off else xp
            for i in range(b):
                for j in range(b):
                    accs[i] = accs[i] + data[d, i, j][None] * shifted[j]
        return jnp.stack(accs).reshape(-1)

    def op(v: jax.Array) -> jax.Array:
        if use_kernel:
            return bdia_spmm_packed(a, v.reshape(p, r, LANES)).reshape(-1)
        return _op_xla(v)

    def pack(x: jax.Array) -> jax.Array:
        x2 = x[:, None] if x.ndim == 1 else x
        assert x2.shape[1] == k
        return x2.reshape(a.nbr_pad, b, k).transpose(1, 2, 0).reshape(-1)

    def unpack(v: jax.Array) -> jax.Array:
        y = v.reshape(b, k, a.nbr_pad).transpose(2, 0, 1).reshape(
            a.n_rows_pad, k)
        return y[:, 0] if k == 1 else y

    return op, pack, unpack


def _bdia_xla_lastaxis(a: BdiaMatrix, xp: jax.Array) -> jax.Array:
    """Plane apply with arbitrary leading batch dims on xp of shape
    (..., b·NBR) — generic fallback for batched applies."""
    b = a.block_size
    lead = xp.shape[:-1]
    planes = xp.reshape(*lead, a.nbr_pad, b)
    data = a.data_flat  # (nd, b, b, NBR)
    # unrolled elementwise FMAs — an einsum would hit bf16 MXU precision
    # on TPU (see ops.matvec.bdia_spmm)
    accs = [jnp.zeros(planes.shape[:-1], dtype=planes.dtype)
            for _ in range(b)]
    for d, off in enumerate(a.offsets):
        shifted = jnp.roll(planes, -off, axis=-2) if off else planes
        for i in range(b):
            for j in range(b):
                accs[i] = accs[i] + data[d, i, j] * shifted[..., j]
    return jnp.stack(accs, axis=-1).reshape(*lead, a.n_rows_pad)


@jax.custom_batching.custom_vmap
def bdia_spmv_vmappable(a: BdiaMatrix, x: jax.Array) -> jax.Array:
    """Single-RHS Pallas BDIA SpMV whose vmap rule lands on the packed
    SpMM kernel (same contract as dia_spmv.dia_spmv_vmappable)."""
    return bdia_spmv_pallas(a, x)


@bdia_spmv_vmappable.def_vmap
def _bdia_spmv_vmap_rule(axis_size, in_batched, a, x):
    a_batched = any(jax.tree_util.tree_leaves(in_batched[0]))
    if a_batched or x.ndim != 2:
        return _bdia_xla_lastaxis(a, x), True
    k = x.shape[0]
    if bdia_pallas_applicable(a, k):
        yk = bdia_spmm_packed(a, _pack_planes(a, x.T))
        return _unpack_planes(a, yk).T, True
    return _bdia_xla_lastaxis(a, x), True
