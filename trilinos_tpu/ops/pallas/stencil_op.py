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

    def __call__(self, x):
        """Operator-protocol apply (solvers take callables; passing the
        StencilOp itself also lets structure-aware drivers — e.g. the
        s-step fused matrix-powers basis — recover the stencil)."""
        from ..matvec import spmv

        return spmv(self, x)

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
        # cand >= h keeps the mid-block window start blk*br - h in range
        # (a clipped start silently shifts every read — see dia_spmv._plan)
        if r % cand == 0 and cand + 2 * h <= min(r, budget) and cand >= h:
            return cand, h
    return None


def stencil_pallas_applicable(op: StencilOp, x_ndim: int = 1) -> bool:
    if x_ndim != 1:
        return False
    if op.dtype not in ("float32", "bfloat16"):
        return False
    return _plane_plan(op) is not None or _plan(op) is not None


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


# ---------------------------------------------------------------------------
# Plane-masked chunked kernel (the fast path)
# ---------------------------------------------------------------------------
#
# Boundary-validity masks are PERIODIC in the row index with period
# nx*ny (one z-plane): for an offset (dx, dy, dz), the x/y validity depends
# only on gid mod nx*ny, and the z validity is UNIFORM over a whole z-plane.
# So instead of recomputing per-offset integer masks in-kernel (VPU-bound —
# measured 4x off roofline in round 1), we precompute one (P, 128) f32
# "plane" per offset with dx|dy != 0, already multiplied by the coefficient
# (P = nx*ny/128 lane-rows), keep the planes VMEM-resident (constant
# BlockSpec index map -> fetched once), and process each block as m chunks
# of exactly one z-plane each:
#   per offset:  acc += plane ⊙ shifted        (one FMA)
#   dz != 0:     scalar select on the chunk's iz (uniform per chunk)
#   pure-z/center offsets: scalar-coefficient FMA, no plane at all.
# Padding is required to be whole z-planes so pad chunks reduce to a scalar
# select (y = x identity rows).


def _plane_geometry(op: StencilOp):
    nx, ny, nz = op.dims
    if (nx * ny) % LANES != 0:
        return None
    p_rows = (nx * ny) // LANES
    if p_rows % 8 != 0:
        return None
    if op.n_rows_pad % (nx * ny) != 0:
        return None
    return p_rows


def _plane_halo(op: StencilOp) -> int:
    lo_reach, hi_reach = 0, 0
    for off3 in op.offsets:
        o = op.lin_offset(off3)
        ro, lo = divmod(o, LANES)
        lo_reach = min(lo_reach, ro)
        hi_reach = max(hi_reach, ro + (1 if lo else 0))
    return ((max(-lo_reach, hi_reach) + 7) // 8) * 8


def _plane_plan(op: StencilOp, nrhs: int = 1):
    """(br, q, h, P) for the plane path, or None -> legacy/masked path.

    br = block rows, q = chunk rows (q | P so a chunk never straddles a
    z-plane; q == P is the static-plane-offset fast path, q < P covers 2-D
    grids where R == P and large-P 3-D grids)."""
    p_rows = _plane_geometry(op)
    if p_rows is None:
        return None
    r = op.n_rows_pad // LANES
    h = max(_plane_halo(op), 8)
    n_planes = sum(1 for (dx, dy, dz) in op.offsets if dx or dy)
    row_b = LANES * 4 * nrhs
    budget = 13 * 2 ** 20 - n_planes * p_rows * LANES * 4
    for q in [p_rows] + [q for q in range(p_rows - 8, 7, -8)
                         if p_rows % q == 0]:
        max_m = r // q // 2  # nb >= 2
        for m in range(max_m, 0, -1):
            br = m * q
            # br >= h: clipped mid-block window starts shift every read
            if r % br != 0 or br + 2 * h > r or br < h:
                continue
            if 2 * row_b * ((br + 2 * h) + br) <= budget:
                return br, q, h, p_rows
    return None


@functools.lru_cache(maxsize=64)
def _build_planes(op: StencilOp):
    """Host-side per-offset coefficient*mask planes.

    Returns (planes, plane_idx): planes is an (n_planes, P, 128) f32
    NUMPY array (cached; converted to a device constant per trace by the
    caller — caching a jnp array created under an active trace would leak
    tracers); plane_idx[t] is the plane row for offset t or None for
    scalar-coefficient offsets."""
    p_rows = _plane_geometry(op)
    assert p_rows is not None
    nx, ny, _ = op.dims
    gid = np.arange(p_rows * LANES, dtype=np.int64)
    ix = gid % nx
    iy = gid // nx  # < ny inside one z-plane by construction
    planes, plane_idx = [], []
    for off3, c in zip(op.offsets, op.coeffs):
        dx, dy, _dz = off3
        if dx == 0 and dy == 0:
            plane_idx.append(None)
            continue
        valid = np.ones(p_rows * LANES, dtype=bool)
        if dx:
            valid &= (ix + dx >= 0) & (ix + dx < nx)
        if dy:
            valid &= (iy + dy >= 0) & (iy + dy < ny)
        planes.append((c * valid).astype(np.float32).reshape(p_rows, LANES))
        plane_idx.append(len(planes) - 1)
    arr = np.stack(planes) if planes else np.zeros((1, p_rows, LANES),
                                                  np.float32)
    return arr, tuple(plane_idx)


def _shifted_chunk(window, base, p_rows, o, lane):
    """Chunk of the window shifted by linear offset o (rows via slice,
    lanes via roll+select)."""
    ro, lo = divmod(o, LANES)
    a_blk = window[pl.ds(base + ro, p_rows)]
    if lo == 0:
        return a_blk
    b_blk = window[pl.ds(base + ro + 1, p_rows)]
    ra = pltpu.roll(a_blk, LANES - lo, 1)
    rb = pltpu.roll(b_blk, LANES - lo, 1)
    return jnp.where(lane < LANES - lo, ra, rb)


def _plane_compute(op: StencilOp, m, q, p_rows, h, plane_idx, b, window,
                   planes_ref, y_ref):
    nx, ny, nz = op.dims
    nz_total = op.n_rows // (nx * ny)  # valid z-planes
    has_pad = op.n_rows_pad > op.n_rows
    lane = lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    br = m * q
    for rep in range(m):
        base = h + rep * q
        start = b * br + rep * q  # global chunk row (traced scalar)
        if q == p_rows:
            iz = b * m + rep
            poff = 0  # static plane offset (fast path)
        else:
            iz = lax.div(start, jnp.int32(p_rows))
            poff = start - iz * p_rows
        acc = jnp.zeros((q, LANES), dtype=jnp.float32)
        for t, (off3, c) in enumerate(zip(op.offsets, op.coeffs)):
            o = op.lin_offset(off3)
            shifted = _shifted_chunk(window, base, q, o, lane)
            sf = shifted.astype(jnp.float32)
            dz = off3[2]
            if plane_idx[t] is not None:
                pslab = planes_ref[plane_idx[t], pl.ds(poff, q)]
                term = pslab * sf
                if dz:
                    zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                    term = jnp.where(zvalid, term, 0.0)
            elif dz:
                zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                cz = jnp.where(zvalid, jnp.float32(c), jnp.float32(0.0))
                term = cz * sf
            else:
                term = jnp.float32(c) * sf
            acc = acc + term
        if has_pad:
            x_chunk = window[pl.ds(base, q)].astype(jnp.float32)
            acc = jnp.where(iz < nz_total, acc, x_chunk)
        y_ref[pl.ds(rep * q, q)] = acc.astype(y_ref.dtype)


def _plane_kernel(op: StencilOp, br, q, h, p_rows, r, plane_idx,
                  planes_ref, x_hbm, y_ref, win, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h
    m = br // q

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

    # Halo strips are consumed by plane MULTIPLIES (0*NaN = NaN), so they
    # must hold finite values before the first compute; after this, stale
    # strips are finite x rows from two blocks back (see dia_spmv note).
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
    _plane_compute(op, m, q, p_rows, h, plane_idx, b, win.at[slot],
                   planes_ref, y_ref)


def stencil_spmv_planes(op: StencilOp, x: jax.Array,
                        interpret: bool = False) -> jax.Array:
    n = op.n_rows_pad
    r = n // LANES
    plan = _plane_plan(op)
    if plan is None:
        raise ValueError("stencil_spmv_planes: not applicable")
    br, q, h, p_rows = plan
    nb = r // br
    planes_np, plane_idx = _build_planes(op)
    planes = jnp.asarray(planes_np)
    x2 = x.reshape(r, LANES)
    out = pl.pallas_call(
        functools.partial(_plane_kernel, op, br, q, h, p_rows, r, plane_idx),
        out_shape=jax.ShapeDtypeStruct((r, LANES), x2.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0),
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
            flops=2 * len(op.offsets) * n,
            bytes_accessed=2 * n * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(planes, x2)
    return out.reshape(n)


def stencil_spmv_pallas(op: StencilOp, x: jax.Array,
                        interpret: bool = False) -> jax.Array:
    if _plane_plan(op) is not None:
        return stencil_spmv_planes(op, x, interpret=interpret)
    return stencil_spmv_masked(op, x, interpret=interpret)


@jax.custom_batching.custom_vmap
def stencil_spmv_vmappable(op: StencilOp, x: jax.Array) -> jax.Array:
    """Single-RHS stencil apply whose vmap rule is the packed SpMM plane
    kernel (see dia_spmv.dia_spmv_vmappable for the rationale)."""
    return stencil_spmv_pallas(op, x)


@stencil_spmv_vmappable.def_vmap
def _stencil_vmap_rule(axis_size, in_batched, op, x):
    if x.ndim == 2 and stencil_spmm_applicable(op, x.shape[0]):
        k = x.shape[0]
        r = op.n_rows_pad // LANES
        out = stencil_spmm_packed(op, x.reshape(k, r, LANES))
        return out.reshape(k, op.n_rows_pad), True
    # generic fallback: masked-roll XLA on (n, k) layout
    xm = jnp.moveaxis(x, 0, -1)
    y = stencil_spmv_xla(op, xm.reshape(op.n_rows_pad, -1))
    return jnp.moveaxis(y.reshape(xm.shape), -1, 0), True


# ---------------------------------------------------------------------------
# Multivector (SpMM) plane kernel: packed (k, R, 128) layout
# ---------------------------------------------------------------------------


def stencil_spmm_applicable(op: StencilOp, k: int) -> bool:
    if op.dtype not in ("float32", "bfloat16") or not 1 <= k <= 16:
        return False
    return _plane_plan(op, nrhs=k) is not None


def _plane_compute_mv(op: StencilOp, m, q, p_rows, h, k, plane_idx, b,
                      window, planes_ref, y_ref):
    nx, ny, nz = op.dims
    nz_total = op.n_rows // (nx * ny)
    has_pad = op.n_rows_pad > op.n_rows
    lane = lax.broadcasted_iota(jnp.int32, (k, q, LANES), 2)
    br = m * q
    for rep in range(m):
        base = h + rep * q
        start = b * br + rep * q
        if q == p_rows:
            iz = b * m + rep
            poff = 0
        else:
            iz = lax.div(start, jnp.int32(p_rows))
            poff = start - iz * p_rows
        acc = jnp.zeros((k, q, LANES), dtype=jnp.float32)
        for t, (off3, c) in enumerate(zip(op.offsets, op.coeffs)):
            o = op.lin_offset(off3)
            ro, lo = divmod(o, LANES)
            a_blk = window[:, pl.ds(base + ro, q)]
            if lo == 0:
                shifted = a_blk
            else:
                b_blk = window[:, pl.ds(base + ro + 1, q)]
                ra = pltpu.roll(a_blk, LANES - lo, 2)
                rb = pltpu.roll(b_blk, LANES - lo, 2)
                shifted = jnp.where(lane < LANES - lo, ra, rb)
            sf = shifted.astype(jnp.float32)
            dz = off3[2]
            if plane_idx[t] is not None:
                pslab = planes_ref[plane_idx[t], pl.ds(poff, q)]
                term = pslab[None] * sf
                if dz:
                    zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                    term = jnp.where(zvalid, term, 0.0)
            elif dz:
                zvalid = jnp.logical_and(iz + dz >= 0, iz + dz < nz)
                cz = jnp.where(zvalid, jnp.float32(c), jnp.float32(0.0))
                term = cz * sf
            else:
                term = jnp.float32(c) * sf
            acc = acc + term
        if has_pad:
            x_chunk = window[:, pl.ds(base, q)].astype(jnp.float32)
            acc = jnp.where(iz < nz_total, acc, x_chunk)
        y_ref[:, pl.ds(rep * q, q)] = acc.astype(y_ref.dtype)


def _plane_kernel_mv(op: StencilOp, br, q, h, p_rows, r, k, plane_idx,
                     planes_ref, x_hbm, y_ref, win, sem):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    wrows = br + 2 * h
    m = br // q

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
    _plane_compute_mv(op, m, q, p_rows, h, k, plane_idx, b, win.at[slot],
                      planes_ref, y_ref)


def stencil_spmm_packed(op: StencilOp, xk: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Multivector stencil apply on a PACKED (k, R, 128) multivector."""
    n = op.n_rows_pad
    r = n // LANES
    k = xk.shape[0]
    plan = _plane_plan(op, nrhs=k)
    if plan is None:
        raise ValueError("stencil_spmm_packed: not applicable")
    br, q, h, p_rows = plan
    nb = r // br
    planes_np, plane_idx = _build_planes(op)
    planes = jnp.asarray(planes_np)
    out = pl.pallas_call(
        functools.partial(_plane_kernel_mv, op, br, q, h, p_rows, r, k,
                          plane_idx),
        out_shape=jax.ShapeDtypeStruct((k, r, LANES), xk.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0),
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
            flops=2 * len(op.offsets) * n * k,
            bytes_accessed=2 * n * k * xk.dtype.itemsize,
            transcendentals=0,
        ),
    )(planes, xk)
    return out


def stencil_spmm_pallas(op: StencilOp, x: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Multivector apply for x (n_pad, k): pack, kernel, unpack."""
    n = op.n_rows_pad
    r = n // LANES
    k = x.shape[1]
    xk = x.T.reshape(k, r, LANES)
    out = stencil_spmm_packed(op, xk, interpret=interpret)
    return out.reshape(k, n).T


def stencil_spmv_masked(op: StencilOp, x: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Legacy path: in-kernel integer validity masks (any geometry)."""
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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
