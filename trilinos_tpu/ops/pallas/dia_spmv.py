"""Pallas TPU kernel: stored-DIA (stencil) SpMV at memory-bandwidth speed.

Why a kernel: the XLA formulations (jnp.roll / pad+slice) materialize one
shifted copy of x per diagonal in HBM — 7 diagonals ≈ 14 extra passes over
x. Here x is read essentially once: the kernel views x as (R, 128) lane
rows and manually DMAs an overlapping window [block − halo, block + halo]
into a double-buffered VMEM scratch (Pallas-guide double-buffering
pattern); each diagonal offset o = ro·128 + lo becomes a static sublane
slice (ro) plus a lane rotate (lo, pltpu.roll) + select. Diagonal data
blocks stream through the standard pipelined BlockSpec path.

Traffic per apply ≈ data (ndiags·n) + x (n + 2·halo·nb) + y (n) — the same
roofline the reference's CSR SpMV targets
(kokkos-kernels/src/sparse/impl/KokkosSparse_spmv_impl.hpp), with zero
gathers, which is what the MXU-less TPU memory system wants.

Constraints (``dia_pallas_applicable``): single RHS; f32/bf16;
n_rows_pad % 128 == 0; a block size br | R with br + 2·halo ≤ R and ≥ 2
blocks. Anything else falls back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import DiaMatrix

LANES = 128
MAX_BR = 2048


def _plan(offsets, n_rows_pad, n_diags) -> tuple[int, int] | None:
    if n_rows_pad % LANES != 0:
        return None
    r = n_rows_pad // LANES
    min_br = max((abs(o) // LANES + 2 for o in offsets), default=1)
    h = ((min_br + 7) // 8) * 8
    row_bytes = LANES * 4
    vmem_budget = 12 * 2 ** 20
    top = (min(r // 2, MAX_BR) // 8) * 8
    for cand in range(top, 7, -8):
        # cand >= h: the mid-block window invariant window[h] == row
        # blk*br requires blk*br - h >= 0 for blk >= 1 (and its mirror at
        # the tail) — a clipped start silently shifts every read (this
        # exact bug shipped in round 2's k=4 SpMM plan: br=512 < h=520
        # corrupted blocks 1 and nb-2 at 256^3)
        if r % cand != 0 or cand + 2 * h > r or cand < h:
            continue
        # double-buffered: data + y via the pipeline, window via scratch
        need = 2 * row_bytes * (n_diags * cand + (cand + 2 * h) + cand)
        if need <= vmem_budget:
            return cand, h
    return None


def dia_pallas_applicable(a: DiaMatrix, x_ndim: int = 1) -> bool:
    if x_ndim != 1:
        return False
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return (_plan_ring(a.offsets, a.n_rows_pad, a.data.shape[0], 1)
            is not None
            or _plan(a.offsets, a.n_rows_pad, a.data.shape[0]) is not None)


def _kernel(offsets, br, h, r, data_ref, x_hbm, y_ref, win, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h

    def issue(blk, slot, wait):
        is_first = blk == 0
        is_last = blk == nb - 1

        def run(d):
            d.wait() if wait else d.start()

        @pl.when(is_first)
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, br + h), :],
                win.at[slot, pl.ds(h, br + h)], sem.at[slot]))

        @pl.when(jnp.logical_and(jnp.logical_not(is_first),
                                 jnp.logical_not(is_last)))
        def _():
            start = jnp.clip(blk * br - h, 0, r - wrows)
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, wrows), :],
                win.at[slot], sem.at[slot]))

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(r - (br + h), br + h), :],
                win.at[slot, pl.ds(0, br + h)], sem.at[slot]))

    # One-time halo zeroing with STATIC slot indices, before any DMA.
    # Uninitialized VMEM may hold NaN/Inf (0·NaN would poison the
    # zero-coefficient boundary terms); after this, any stale rows left in
    # a halo strip are FINITE x values from an earlier block, which the
    # zero coefficients annihilate. Dynamically-indexed per-step writes to
    # the window scratch would serialize Mosaic's double-buffer pipeline —
    # measured 1.8× slower — so they must not appear in the steady state.
    @pl.when(b == 0)
    def _():
        zero = jnp.zeros((h, LANES), dtype=win.dtype)
        win[0, pl.ds(0, h)] = zero
        win[0, pl.ds(br + h, h)] = zero
        win[1, pl.ds(0, h)] = zero
        win[1, pl.ds(br + h, h)] = zero
        issue(0, 0, wait=False)

    slot = lax.rem(b, jnp.int32(2))

    @pl.when(b + 1 < nb)
    def _():
        issue(b + 1, lax.rem(b + 1, jnp.int32(2)), wait=False)

    issue(b, slot, wait=True)

    window = win.at[slot]
    lane = lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    acc = jnp.zeros((br, LANES), dtype=jnp.float32)
    for d, o in enumerate(offsets):
        ro, lo = divmod(o, LANES)
        a_blk = window[pl.ds(h + ro, br)]
        if lo == 0:
            shifted = a_blk
        else:
            b_blk = window[pl.ds(h + ro + 1, br)]
            ra = pltpu.roll(a_blk, LANES - lo, 1)
            rb = pltpu.roll(b_blk, LANES - lo, 1)
            shifted = jnp.where(lane < LANES - lo, ra, rb)
        acc = acc + data_ref[d].astype(jnp.float32) * shifted.astype(jnp.float32)
    y_ref[:] = acc.astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# Ring-buffer kernel: x read ONCE (no halo re-read)
# ---------------------------------------------------------------------------
#
# The windowed kernels above DMA [block - halo, block + halo] per block; for
# 3-D stencils the z-offset makes halo ~ block, so x is streamed ~3x. TPU
# grid steps run SEQUENTIALLY and scratch persists across them — so a ring
# of S strip-slots can keep the halo strips resident and DMA only the ONE
# new strip per block (classic sliding-window reuse). Strip t lives in slot
# t % S; a diagonal's br-row read at relative row offset ro splits into at
# most two STATIC-size pieces (strip b + ro//br at sublane ro%br, then
# strip +1), each a dynamic-slot / static-window VMEM read. Slots for
# strips beyond either end are zeroed once (b=0) and then hold stale-but-
# finite x values that the zero boundary coefficients annihilate (same
# invariant as the windowed kernels). Ring capacity S = 2U + 2 (U strips
# of history, U of future, the current strip, one DMA in flight).


def _plan_ring(offsets, n_rows_pad, n_diags, k) -> tuple[int, int, int] | None:
    if n_rows_pad % LANES != 0 or k < 1 or k > 16:
        return None
    r = n_rows_pad // LANES
    # max relative row reach (+1 sublane for the lane-carry read)
    reach = max((abs(o) // LANES + (1 if o % LANES else 0) + 1
                 for o in offsets), default=1)
    row_bytes = LANES * 4
    # leave ~7 MB headroom below the 16 MB scoped-vmem limit: the per-
    # diagonal two-piece reads materialize (k, br, 128) stack temporaries
    # that the plan formula below does not count (measured OOM at 13 MB)
    vmem_budget = 9 * 2 ** 20
    top = (min(r // 2, MAX_BR) // 8) * 8
    for cand in range(top, 7, -8):
        if r % cand != 0:
            continue
        u = -(-reach // cand)
        s = 2 * u + 2
        if r // cand < s:
            continue
        # ring single-buffered + pipelined data/y double-buffered
        need = row_bytes * (s * cand * k + 2 * n_diags * cand
                            + 2 * k * cand)
        if need <= vmem_budget:
            return cand, u, s
    return None


def _kernel_ring(offsets, br, u, s, r, k,
                 data_ref, x_hbm, y_ref, win, sems):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def strip_copy(t, slot):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(t * br, br), :], win.at[slot], sems.at[slot])

    @pl.when(b == 0)
    def _():
        zero = jnp.zeros((k, br, LANES), dtype=win.dtype)
        for c in range(-u, 0):          # past-edge strips: zero slots
            win[(c % s)] = zero
        for t in range(u + 1):          # strips 0..u: fetch, 0..u-1 waited
            if t < nb:
                cp = strip_copy(t, t % s)
                cp.start()
                if t < u:
                    cp.wait()

    # issue the in-flight strip (b+u+1), wait for the current edge (b+u)
    nxt = b + u + 1

    @pl.when(nxt < nb)
    def _():
        strip_copy(nxt, lax.rem(nxt, jnp.int32(s))).start()

    edge = b + u

    @pl.when(edge < nb)
    def _():
        strip_copy(edge, lax.rem(edge, jnp.int32(s))).wait()

    def read(ro):
        """(k, br, LANES) rows [b*br + ro, b*br + ro + br)."""
        shift, off = divmod(ro, br)
        # +s keeps the operand nonnegative (lax.rem is a C-style remainder
        # and would return a negative slot for b + shift < 0); shift is
        # within [-u, u+1] and s = 2u + 2, so one +s suffices
        slot = lax.rem(b + jnp.int32(shift + s), jnp.int32(s))
        if off == 0:
            return win[slot]
        slot2 = lax.rem(b + jnp.int32(shift + 1 + s), jnp.int32(s))
        p1 = win[slot, :, pl.ds(off, br - off)]
        p2 = win[slot2, :, pl.ds(0, off)]
        return jnp.concatenate([p1, p2], axis=1)

    lane = lax.broadcasted_iota(jnp.int32, (k, br, LANES), 2)
    acc = jnp.zeros((k, br, LANES), dtype=jnp.float32)
    for d, o in enumerate(offsets):
        ro, lo = divmod(o, LANES)
        if lo == 0:
            shifted = read(ro)
        else:
            ra = pltpu.roll(read(ro), LANES - lo, 2)
            rb = pltpu.roll(read(ro + 1), LANES - lo, 2)
            shifted = jnp.where(lane < LANES - lo, ra, rb)
        acc = acc + (data_ref[d].astype(jnp.float32)[None]
                     * shifted.astype(jnp.float32))
    y_ref[:] = acc.astype(y_ref.dtype)


def dia_ring_applicable(a: DiaMatrix, k: int = 1) -> bool:
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _plan_ring(a.offsets, a.n_rows_pad, a.data.shape[0], k) is not None


def dia_spmm_ring(a: DiaMatrix, xk: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Ring-buffer SpMM on a packed (k, R, 128) multivector (k=1 serves
    the single-RHS path: the (R,128)<->(1,R,128) reshape is layout-free)."""
    n = a.n_rows_pad
    r = n // LANES
    k = xk.shape[0]
    plan = _plan_ring(a.offsets, n, a.data.shape[0], k)
    if plan is None:
        raise ValueError("dia_spmm_ring: not applicable (use window path)")
    br, u, s = plan
    nb = r // br
    nd = a.data.shape[0]
    data3 = a.data if a.data.ndim == 3 else a.data.reshape(nd, r, LANES)
    return pl.pallas_call(
        functools.partial(_kernel_ring, a.offsets, br, u, s, r, k),
        out_shape=jax.ShapeDtypeStruct((k, r, LANES), xk.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd, br, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, br, LANES), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, k, br, LANES), xk.dtype),
            pltpu.SemaphoreType.DMA((s,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n * k,
            bytes_accessed=(nd + 2 * k) * n * xk.dtype.itemsize,
            transcendentals=0,
        ),
    )(data3, xk)


# ---------------------------------------------------------------------------
# Multivector (SpMM) variant: packed (k, R, 128) layout
# ---------------------------------------------------------------------------
#
# The whole point of SpMM on TPU is DATA REUSE: the diagonal stream (the
# dominant traffic) is read once per block and multiplies all k right-hand
# sides. Lane layout stays on the row dimension; the k axis is a leading
# batch axis of both the window scratch and the output (reference:
# multivector spmv, kokkos-kernels/src/sparse/KokkosSparse_spmv.hpp:156).
# Callers keep multivectors in (n, k); the wrapper transposes to/from the
# packed (k, R, 128) form in-graph (two extra k*n passes — still a large
# win over re-reading the matrix k times).


def _plan_mv(offsets, n_rows_pad, n_diags, k) -> tuple[int, int] | None:
    if n_rows_pad % LANES != 0 or k < 1 or k > 16:
        return None
    r = n_rows_pad // LANES
    min_br = max((abs(o) // LANES + 2 for o in offsets), default=1)
    h = ((min_br + 7) // 8) * 8
    row_bytes = LANES * 4
    vmem_budget = 13 * 2 ** 20
    top = (min(r // 2, MAX_BR) // 8) * 8
    for cand in range(top, 7, -8):
        # cand >= h: see _plan — clipped mid-block starts corrupt reads
        if r % cand != 0 or cand + 2 * h > r or cand < h:
            continue
        need = 2 * row_bytes * (n_diags * cand + k * (cand + 2 * h)
                                + k * cand)
        if need <= vmem_budget:
            return cand, h
    return None


def dia_spmm_applicable(a: DiaMatrix, k: int) -> bool:
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return (_plan_ring(a.offsets, a.n_rows_pad, a.data.shape[0], k)
            is not None
            or _plan_mv(a.offsets, a.n_rows_pad, a.data.shape[0], k)
            is not None)


def dia_spmm_packed_best(a: DiaMatrix, xk: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Best packed-(k, R, 128) SpMM path: ring-buffer kernel (x read once)
    when it plans, else the double-buffered window kernel."""
    k = xk.shape[0]
    if _plan_ring(a.offsets, a.n_rows_pad, a.data.shape[0], k) is not None:
        return dia_spmm_ring(a, xk, interpret=interpret)
    return dia_spmm_packed(a, xk, interpret=interpret)


def _kernel_mv(offsets, br, h, r, k, data_ref, x_hbm, y_ref, win, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h

    def issue(blk, slot, wait):
        is_first = blk == 0
        is_last = blk == nb - 1

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
            start = jnp.clip(blk * br - h, 0, r - wrows)
            run(pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(start, wrows), :],
                win.at[slot], sem.at[slot]))

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(r - (br + h), br + h), :],
                win.at[slot, :, pl.ds(0, br + h)], sem.at[slot]))

    @pl.when(b == 0)
    def _():
        zero = jnp.zeros((k, h, LANES), dtype=win.dtype)
        win[0, :, pl.ds(0, h)] = zero
        win[0, :, pl.ds(br + h, h)] = zero
        win[1, :, pl.ds(0, h)] = zero
        win[1, :, pl.ds(br + h, h)] = zero
        issue(0, 0, wait=False)

    slot = lax.rem(b, jnp.int32(2))

    @pl.when(b + 1 < nb)
    def _():
        issue(b + 1, lax.rem(b + 1, jnp.int32(2)), wait=False)

    issue(b, slot, wait=True)

    window = win.at[slot]
    lane = lax.broadcasted_iota(jnp.int32, (k, br, LANES), 2)
    acc = jnp.zeros((k, br, LANES), dtype=jnp.float32)
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
        acc = acc + (data_ref[d].astype(jnp.float32)[None]
                     * shifted.astype(jnp.float32))
    y_ref[:] = acc.astype(y_ref.dtype)


def dia_spmm_packed(a: DiaMatrix, xk: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """SpMM on a PACKED multivector xk of shape (k, R, 128)."""
    n = a.n_rows_pad
    r = n // LANES
    k = xk.shape[0]
    plan = _plan_mv(a.offsets, n, a.data.shape[0], k)
    if plan is None:
        raise ValueError("dia_spmm_packed: not applicable (use XLA path)")
    br, h = plan
    nb = r // br
    nd = a.data.shape[0]
    data3 = a.data if a.data.ndim == 3 else a.data.reshape(nd, r, LANES)
    out = pl.pallas_call(
        functools.partial(_kernel_mv, a.offsets, br, h, r, k),
        out_shape=jax.ShapeDtypeStruct((k, r, LANES), xk.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd, br, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, br, LANES), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, k, br + 2 * h, LANES), xk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n * k,
            bytes_accessed=(nd + 2 * k) * n * xk.dtype.itemsize,
            transcendentals=0,
        ),
    )(data3, xk)
    return out


def dia_spmm_pallas(a: DiaMatrix, x: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """SpMM for x of shape (n_pad, k): packs to (k, R, 128), runs the
    packed kernel, unpacks. The transposes cost 2*2kn extra bytes but the
    diagonal stream is read ONCE instead of k times."""
    n = a.n_rows_pad
    r = n // LANES
    k = x.shape[1]
    xk = x.T.reshape(k, r, LANES)
    out = dia_spmm_packed_best(a, xk, interpret=interpret)
    return out.reshape(k, n).T


def _dia_xla_lastaxis(a: DiaMatrix, x: jax.Array) -> jax.Array:
    """Roll-based DIA apply on the LAST axis (any leading batch dims) —
    the generic fallback for batched applies the kernels can't take."""
    y = jnp.zeros_like(x)
    data = a.data_flat
    for d, off in enumerate(a.offsets):
        shifted = jnp.roll(x, -off, axis=-1) if off else x
        y = y + data[d] * shifted
    return y


@jax.custom_batching.custom_vmap
def dia_spmv_vmappable(a: DiaMatrix, x: jax.Array) -> jax.Array:
    """Single-RHS Pallas SpMV whose vmap rule is the PACKED SpMM kernel.

    Plain vmap of a pallas_call with an ANY-memory-space windowed input
    fails Mosaic lowering (and would be the wrong program anyway); this
    wrapper makes `jax.vmap(spmv)` — the pseudo-block GMRES pattern —
    land on dia_spmm_packed, reading the diagonal data once for all
    batched right-hand sides."""
    return dia_spmv_pallas(a, x)


@dia_spmv_vmappable.def_vmap
def _dia_spmv_vmap_rule(axis_size, in_batched, a, x):
    a_batched = any(jax.tree_util.tree_leaves(in_batched[0]))
    if a_batched or x.ndim != 2:
        return _dia_xla_lastaxis(a, x), True
    k = x.shape[0]
    if dia_spmm_applicable(a, k):
        r = a.n_rows_pad // LANES
        out = dia_spmm_packed_best(a, x.reshape(k, r, LANES))
        return out.reshape(k, a.n_rows_pad), True
    return _dia_xla_lastaxis(a, x), True


def dia_spmv_pallas(a: DiaMatrix, x: jax.Array,
                    interpret: bool = False) -> jax.Array:
    n = a.n_rows_pad
    r = n // LANES
    # ring kernel first: reads x once (no halo re-read) — measured 606 vs
    # 557 GB/s on the 256^3 7-point headline (and it is the only Pallas
    # plan when the window planner's br >= h constraint can't be met)
    if _plan_ring(a.offsets, n, a.data.shape[0], 1) is not None:
        return dia_spmm_ring(a, x.reshape(1, r, LANES),
                             interpret=interpret).reshape(n)
    plan = _plan(a.offsets, n, a.data.shape[0])
    if plan is None:
        raise ValueError("dia_spmv_pallas: not applicable (use XLA path)")
    br, h = plan
    nb = r // br
    x2 = x.reshape(r, LANES)
    nd = a.data.shape[0]
    # canonical 3-D layout comes straight from the pytree (no in-jit
    # relayout of a large 2-D parameter — that costs 1.8x)
    data3 = a.data if a.data.ndim == 3 else a.data.reshape(nd, r, LANES)
    out = pl.pallas_call(
        functools.partial(_kernel, a.offsets, br, h, r),
        out_shape=jax.ShapeDtypeStruct((r, LANES), x2.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd, br, LANES), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((br, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2 * h, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n,
            bytes_accessed=(nd + 2) * n * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(data3, x2)
    return out.reshape(n)
