"""Fully-fused CG iteration kernel for matrix-free stencil operators.

One Pallas launch per CG iteration: the single-reduce (Chronopoulos-Gear)
recurrence — direction updates, x/r updates, the stencil apply and both
dot products — in a single pass over the vectors. This is the logical end
point of the reference's fused-kernel ladder
(Tpetra_Details_residual.hpp fused residual; CGSingleRedIter's fused
MvTransMv, belos/src/BelosCGSingleRedIter.hpp:477-483; the per-kernel CG
timer trio of cg_solve_file.hpp:138-140): per iteration the fused kernel
moves ~10 vector passes (3 halo windows + 2 streamed inputs + 5 outputs)
and launches once.

MEASURED (v5e, 128^3, round 2): 0.233 ms/iter — statistically TIED with
the unfused cg_single_reduce driver (0.206 ms/iter): XLA's own fusion of
the stencil + axpby/dot chain is already near the bandwidth bound on this
chip, and the three manual halo windows offset the launch savings. Kept
as a correctness-tested alternative (and the template for future
multi-iteration s-step fusion); the unfused driver remains the default.

State (identity preconditioner; z = r): (x, r, w = A r, p, q = A p) plus
scalars [rz = <r,r>, delta = <r,w>, rz_prev, alpha_prev]. Per call:
    beta  = rz / rz_prev              (0 on the first iteration)
    alpha = rz / (delta - beta * rz / alpha_prev)
    p' = r + beta p                   (beta uses the CURRENT dots — the
    q' = w + beta q                    phase shift that makes one fused
    x' = x + alpha p'                  pass possible)
    r' = r - alpha q'                 (computed over the halo window)
    w' = A r'                         (plane-masked stencil, in-kernel)
    dots: rz' = <r',r'>, delta' = <r',w'>  (accumulated across blocks)

The driver (solvers.cg.cg_fused) wraps this in a while_loop +
certified_solve. Requirements: plane-plan applicable StencilOp with
n_rows_pad == n_rows (whole z-planes, no pad rows) and f32.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_op import (LANES, StencilOp, _build_planes, _plane_halo,
                         _plane_geometry, _shifted_chunk)


def _fused_plan(op: StencilOp):
    """(br, q, h, P) with the fused kernel's VMEM accounted:
    3 manual windows (r, w, q) + 2 pipelined inputs (x, p) + 5 outputs +
    the r' scratch."""
    p_rows = _plane_geometry(op)
    if p_rows is None or op.n_rows_pad != op.n_rows:
        return None
    if op.dtype != "float32":
        return None
    r = op.n_rows_pad // LANES
    h = max(_plane_halo(op), 8)
    n_planes = sum(1 for (dx, dy, dz) in op.offsets if dx or dy)
    row_b = LANES * 4
    budget = 13 * 2 ** 20 - n_planes * p_rows * LANES * 4
    for q in [p_rows] + [q for q in range(p_rows - 8, 7, -8)
                         if p_rows % q == 0]:
        for m in range(r // q // 2, 0, -1):
            br = m * q
            # br >= h: clipped mid-block window starts shift every read
            if r % br != 0 or br + 2 * h > r or br < h:
                continue
            need = row_b * (3 * 2 * (br + 2 * h)  # r,w,q windows
                            + 2 * 2 * br          # x,p pipelined
                            + 5 * 2 * br          # 5 outputs
                            + (br + 2 * h))       # r' scratch
            if need <= budget:
                return br, q, h, p_rows
    return None


def cg_fused_applicable(op) -> bool:
    return isinstance(op, StencilOp) and _fused_plan(op) is not None


def _kernel(op: StencilOp, br, cq, h, p_rows, r, plane_idx,
            scal_ref, planes_ref, x_ref, p_ref, r_hbm, w_hbm, q_hbm,
            xo_ref, ro_ref, wo_ref, po_ref, qo_ref, dots_ref,
            rwin, wwin, qwin, rpwin, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h
    m = br // cq
    nx, ny, nz = op.dims

    def issue(blk, slot, wait):
        is_first = blk == 0
        is_last = blk == nb - 1

        def run(d):
            d.wait() if wait else d.start()

        for src, dst, sidx in ((r_hbm, rwin, 0), (w_hbm, wwin, 1),
                               (q_hbm, qwin, 2)):
            @pl.when(is_first)
            def _(src=src, dst=dst, sidx=sidx):
                run(pltpu.make_async_copy(
                    src.at[pl.ds(0, br + h), :],
                    dst.at[slot, pl.ds(h, br + h)], sem.at[slot, sidx]))

            @pl.when(jnp.logical_and(jnp.logical_not(is_first),
                                     jnp.logical_not(is_last)))
            def _(src=src, dst=dst, sidx=sidx):
                start = jnp.clip(blk * br - h, 0, r - wrows)
                run(pltpu.make_async_copy(
                    src.at[pl.ds(start, wrows), :],
                    dst.at[slot], sem.at[slot, sidx]))

            @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
            def _(src=src, dst=dst, sidx=sidx):
                run(pltpu.make_async_copy(
                    src.at[pl.ds(r - (br + h), br + h), :],
                    dst.at[slot, pl.ds(0, br + h)], sem.at[slot, sidx]))

    @pl.when(b == 0)
    def _():
        zero = jnp.zeros((h, LANES), dtype=rwin.dtype)
        for w_ in (rwin, wwin, qwin):
            w_[0, pl.ds(0, h)] = zero
            w_[0, pl.ds(br + h, h)] = zero
            w_[1, pl.ds(0, h)] = zero
            w_[1, pl.ds(br + h, h)] = zero
        issue(0, 0, wait=False)

    slot = lax.rem(b, jnp.int32(2))

    @pl.when(b + 1 < nb)
    def _():
        issue(b + 1, lax.rem(b + 1, jnp.int32(2)), wait=False)

    issue(b, slot, wait=True)

    # scalars: beta/alpha from the CURRENT dots (computed last pass)
    rz = scal_ref[0, 0]
    delta = scal_ref[0, 1]
    rz_prev = scal_ref[0, 2]
    alpha_prev = scal_ref[0, 3]
    beta = jnp.where(rz_prev > 0, rz / jnp.where(rz_prev > 0, rz_prev, 1),
                     0.0)
    denom = delta - beta * rz / jnp.where(alpha_prev != 0, alpha_prev, 1)
    alpha = jnp.where(denom != 0, rz / jnp.where(denom != 0, denom, 1),
                      0.0)

    @pl.when(b == 0)
    def _():
        dots_ref[0, 0] = 0.0
        dots_ref[0, 1] = 0.0
        dots_ref[0, 2] = rz  # becomes rz_prev next iteration
        dots_ref[0, 3] = alpha

    # r' over the whole window: r - alpha*(w + beta*q) — elementwise, so
    # recomputing halo rows stays consistent with neighboring blocks
    rpwin[:] = rwin[slot] - alpha * (wwin[slot] + beta * qwin[slot])

    planes = planes_ref
    lane = lax.broadcasted_iota(jnp.int32, (cq, LANES), 1)
    rz_acc = jnp.zeros((), jnp.float32)
    dl_acc = jnp.zeros((), jnp.float32)
    for rep in range(m):
        base = h + rep * cq
        start = b * br + rep * cq
        if cq == p_rows:
            iz = b * m + rep
            poff = 0
        else:
            iz = lax.div(start, jnp.int32(p_rows))
            poff = start - iz * p_rows
        # stencil w' = A r' on this chunk
        acc = jnp.zeros((cq, LANES), dtype=jnp.float32)
        for t, (off3, c) in enumerate(zip(op.offsets, op.coeffs)):
            o = op.lin_offset(off3)
            shifted = _shifted_chunk(rpwin, base, cq, o, lane)
            dz = off3[2]
            if plane_idx[t] is not None:
                pslab = planes[plane_idx[t], pl.ds(poff, cq)]
                term = pslab * shifted
                if dz:
                    zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                    term = jnp.where(zvalid, term, 0.0)
            elif dz:
                zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                cz = jnp.where(zvalid, jnp.float32(c), jnp.float32(0.0))
                term = cz * shifted
            else:
                term = jnp.float32(c) * shifted
            acc = acc + term
        sl = pl.ds(rep * cq, cq)
        r_blk = rwin[slot, pl.ds(base, cq)]
        w_blk = wwin[slot, pl.ds(base, cq)]
        q_blk = qwin[slot, pl.ds(base, cq)]
        rp_blk = rpwin[pl.ds(base, cq)]
        p_new = r_blk + beta * p_ref[sl]
        q_new = w_blk + beta * q_blk
        xo_ref[sl] = x_ref[sl] + alpha * p_new
        ro_ref[sl] = rp_blk
        wo_ref[sl] = acc
        po_ref[sl] = p_new
        qo_ref[sl] = q_new
        rz_acc = rz_acc + jnp.sum(rp_blk * rp_blk)
        dl_acc = dl_acc + jnp.sum(rp_blk * acc)
    dots_ref[0, 0] += rz_acc
    dots_ref[0, 1] += dl_acc


def cg_fused_iteration(op: StencilOp, x, r_vec, w_vec, p_vec, q_vec, scal,
                       interpret: bool = False):
    """One fused CG iteration. scal: (1, 4) f32 [rz, delta, rz_prev,
    alpha_prev]. Returns (x', r', w', p', q', scal') with scal' =
    [rz', delta', rz, alpha_used]."""
    plan = _fused_plan(op)
    if plan is None:
        raise ValueError("cg_fused: not applicable")
    br, cq, h, p_rows = plan
    n = op.n_rows_pad
    r = n // LANES
    nb = r // br
    planes_np, plane_idx = _build_planes(op)
    planes = jnp.asarray(planes_np)
    shape2 = (r, LANES)
    as2 = lambda v: v.reshape(shape2)
    out_shapes = [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 5 + [
        jax.ShapeDtypeStruct((1, 4), jnp.float32)]
    blockspec = pl.BlockSpec((br, LANES), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, op, br, cq, h, p_rows, r, plane_idx),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blockspec,  # x
            blockspec,  # p
            pl.BlockSpec(memory_space=pl.ANY),  # r (windowed)
            pl.BlockSpec(memory_space=pl.ANY),  # w (windowed)
            pl.BlockSpec(memory_space=pl.ANY),  # q (windowed)
        ],
        out_specs=[blockspec, blockspec, blockspec, blockspec, blockspec,
                   pl.BlockSpec((1, 4), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, br + 2 * h, LANES), jnp.float32),  # r window
            pltpu.VMEM((2, br + 2 * h, LANES), jnp.float32),  # w window
            pltpu.VMEM((2, br + 2 * h, LANES), jnp.float32),  # q window
            pltpu.VMEM((br + 2 * h, LANES), jnp.float32),  # r' scratch
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(scal, planes, as2(x), as2(p_vec), as2(r_vec), as2(w_vec),
      as2(q_vec))
    xo, ro, wo, po, qo, scal_out = outs
    flat = lambda v: v.reshape(n)
    return flat(xo), flat(ro), flat(wo), flat(po), flat(qo), scal_out
