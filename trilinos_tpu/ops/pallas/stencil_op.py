"""Matrix-free constant-coefficient stencil operator (speed-of-light SpMV).

TPU-first specialization with no counterpart in the reference: a Galeri
stencil operator with CONSTANT coefficients (Laplace1D/2D/3D, Brick3D,
Star2D…) needs no stored matrix at all — the "values" are a handful of
scalars and the sparsity truncation at grid boundaries is a closed-form
validity mask computed in-kernel from the row index. SpMV traffic drops to
read-x + write-y (~2 passes), versus (ndiags + 2) passes for stored DIA —
the roofline the reference's stored-matrix SpMV can never reach.

The reference's equivalent operator (Galeri_Cross2D.h etc.) materializes
the CSR; our ``galeri.stencils`` can emit either the stored form or this
matrix-free form.

Kernel structure mirrors dia_spmv: x viewed as (R, 128) lane rows, 3-slab
VMEM window, offsets decomposed into sublane slice + lane rotate; the
validity mask per offset is integer arithmetic on a row-index iota.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import round_up

LANES = 128
MAX_BR = 2048


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilOp:
    """Matrix-free stencil operator on a lexicographic grid.

    dims: (nx, ny, nz) — gid = ix + nx*(iy + ny*iz) (Galeri convention)
    offsets: per-term grid offsets (dx, dy, dz)
    coeffs: per-term constant coefficients
    """

    dims: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    offsets: tuple[tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True))
    coeffs: tuple[float, ...] = dataclasses.field(metadata=dict(static=True))
    n_rows_pad: int = dataclasses.field(metadata=dict(static=True))
    dtype: str = dataclasses.field(metadata=dict(static=True), default="float32")

    @classmethod
    def create(cls, dims, stencil, n_rows_pad=None, dtype="float32",
               pad_align=1024):
        dims3 = tuple(dims) + (1,) * (3 - len(dims))
        offs, coeffs = [], []
        for off, c in stencil:
            off3 = tuple(off) + (0,) * (3 - len(off))
            offs.append(off3)
            coeffs.append(float(c))
        n = int(np.prod(dims3))
        if n_rows_pad is None:
            n_rows_pad = round_up(n, pad_align)
        return cls(dims=dims3, offsets=tuple(offs), coeffs=tuple(coeffs),
                   n_rows_pad=n_rows_pad, dtype=dtype)

    @property
    def n_rows(self) -> int:
        return int(np.prod(self.dims))

    n_cols = n_rows

    @property
    def shape(self):
        n = self.n_rows
        return (n, n)

    @property
    def nnz(self) -> int:
        n_val = 0
        nx, ny, nz = self.dims
        for (dx, dy, dz) in self.offsets:
            n_val += ((nx - abs(dx)) * (ny - abs(dy)) * (nz - abs(dz)))
        return n_val

    def lin_offset(self, off3) -> int:
        nx, ny, _ = self.dims
        dx, dy, dz = off3
        return dx + nx * (dy + ny * dz)


def _pick_br(r: int, min_br: int) -> int | None:
    for cand in range(max(min_br, 8), min(r, MAX_BR) + 1):
        if r % cand == 0 and cand % 8 == 0:
            return cand
    return None


def _plan(op: StencilOp) -> tuple[int, int] | None:
    """Pick (br, h): halo rows h and a block size br dividing R with
    br + 2h ≤ R and ≥2 blocks. None → use the XLA fallback."""
    n = op.n_rows_pad
    if n % LANES != 0:
        return None
    r = n // LANES
    min_br = max((abs(op.lin_offset(o)) // LANES + 2 for o in op.offsets),
                 default=1)
    h = ((min_br + 7) // 8) * 8
    budget = 12 * 2 ** 20 // (2 * LANES * 4)  # window rows per buffer
    top = (min(r // 2, MAX_BR) // 8) * 8
    for cand in range(top, 7, -8):
        if r % cand == 0 and cand + 2 * h <= min(r, budget):
            return cand, h
    return None


def stencil_pallas_applicable(op: StencilOp, x_ndim: int = 1) -> bool:
    if x_ndim != 1:
        return False
    if op.dtype not in ("float32", "bfloat16"):
        return False
    return _plan(op) is not None


def _compute_block(op: StencilOp, br, window, base0, b, y_ref):
    """Apply the stencil to one (br, LANES) row block.

    window: VMEM ref of shape (br + 2H, LANES); the block's row j at
    window[base0 + j] (base0 is traced — accounts for edge clamping)."""
    lane = lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    row = lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
    gid = (b * br + row) * LANES + lane
    nx, ny, nz = op.dims

    def _pow2(v):
        return v & (v - 1) == 0

    # grid-coordinate recovery; pow2 dims use shifts/masks (VPU-cheap)
    if _pow2(nx) and _pow2(ny):
        lx = nx.bit_length() - 1
        ly = ny.bit_length() - 1
        ix = jnp.bitwise_and(gid, nx - 1)
        iy = jnp.bitwise_and(jnp.right_shift(gid, lx), ny - 1)
        iz = jnp.right_shift(gid, lx + ly)
    else:
        ix = gid % nx
        iy = (gid // nx) % ny
        iz = gid // (nx * ny)
    n = op.n_rows
    acc = jnp.zeros((br, LANES), dtype=jnp.float32)
    for off3, c in zip(op.offsets, op.coeffs):
        o = op.lin_offset(off3)
        ro, lo = divmod(o, LANES)
        a_blk = window[pl.ds(base0 + ro, br)]
        if lo == 0:
            shifted = a_blk
        else:
            b_blk = window[pl.ds(base0 + ro + 1, br)]
            ra = pltpu.roll(a_blk, LANES - lo, 1)
            rb = pltpu.roll(b_blk, LANES - lo, 1)
            shifted = jnp.where(lane < LANES - lo, ra, rb)
        dx, dy, dz = off3
        valid = gid < n
        if dx:
            nbr = ix + dx
            valid = jnp.logical_and(valid,
                                    jnp.logical_and(nbr >= 0, nbr < nx))
        if dy:
            nbr = iy + dy
            valid = jnp.logical_and(valid,
                                    jnp.logical_and(nbr >= 0, nbr < ny))
        if dz:
            nbr = iz + dz
            valid = jnp.logical_and(valid,
                                    jnp.logical_and(nbr >= 0, nbr < nz))
        acc = acc + jnp.where(valid, c * shifted.astype(jnp.float32), 0.0)
    # identity padding rows: y = x (zero in, zero out by convention)
    pad = gid >= n
    acc = jnp.where(pad, window[pl.ds(base0, br)].astype(jnp.float32), acc)
    y_ref[:] = acc.astype(y_ref.dtype)


def _dma_kernel(op: StencilOp, br, h, r, x_hbm, y_ref, win, sem):
    """Manual double-buffered window DMA: x is read from HBM exactly once
    (plus 2h halo rows per block) — the double-buffering pattern from the
    Pallas guide, applied to an overlapping-window stencil.

    The window invariant: block row j always sits at window[h + j].
    Edge blocks use shorter statically-shaped copies (the out-of-range
    window rows stay garbage and are killed by the validity masks)."""
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
            # clamp keeps trace-time starts nonneg; branch only runs mid
            start = jnp.clip(blk * br - h, 0, r - wrows)
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, wrows), :],
                win.at[slot], sem.at[slot]))

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
        def _():
            run(pltpu.make_async_copy(
                x_hbm.at[pl.ds(r - (br + h), br + h), :],
                win.at[slot, pl.ds(0, br + h)], sem.at[slot]))

    @pl.when(b == 0)
    def _():
        issue(0, 0, wait=False)

    slot = lax.rem(b, jnp.int32(2))

    @pl.when(b + 1 < nb)
    def _():
        issue(b + 1, lax.rem(b + 1, jnp.int32(2)), wait=False)

    issue(b, slot, wait=True)
    _compute_block(op, br, win.at[slot], h, b, y_ref)


def stencil_spmv_pallas(op: StencilOp, x: jax.Array,
                        interpret: bool = False) -> jax.Array:
    n = op.n_rows_pad
    r = n // LANES
    plan = _plan(op)
    if plan is None:
        raise ValueError("stencil_spmv_pallas: not applicable (use XLA path)")
    br, h = plan
    nb = r // br
    x2 = x.reshape(r, LANES)
    out = pl.pallas_call(
        functools.partial(_dma_kernel, op, br, h, r),
        out_shape=jax.ShapeDtypeStruct((r, LANES), x2.dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((br, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2 * h, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * len(op.offsets) * n,
            bytes_accessed=2 * n * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2)
    return out.reshape(n)


def stencil_spmv_xla(op: StencilOp, x: jax.Array) -> jax.Array:
    """Reference/fallback implementation (CPU, f64, multivector)."""
    was_1d = x.ndim == 1
    x2 = x[:, None] if was_1d else x
    n = op.n_rows
    npad = op.n_rows_pad
    nx, ny, nz = op.dims
    gid = jnp.arange(npad)
    ix = gid % nx
    iy = (gid // nx) % ny
    iz = gid // (nx * ny)
    y = jnp.zeros_like(x2)
    for off3, c in zip(op.offsets, op.coeffs):
        o = op.lin_offset(off3)
        dx, dy, dz = off3
        valid = gid < n
        valid &= (ix + dx >= 0) & (ix + dx < nx)
        valid &= (iy + dy >= 0) & (iy + dy < ny)
        valid &= (iz + dz >= 0) & (iz + dz < nz)
        shifted = jnp.roll(x2, -o, axis=0) if o else x2
        y = y + jnp.where(valid[:, None], c * shifted, 0)
    pad_mask = (gid >= n)[:, None]
    y = jnp.where(pad_mask, x2, y)
    return y[:, 0] if was_1d else y
