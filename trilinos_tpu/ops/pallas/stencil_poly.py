"""Fused stencil polynomial apply: p(A)x in ONE pass over HBM.

The communication-avoiding "matrix powers" kernel specialized to
matrix-free constant-coefficient stencils: evaluates a three-term
recurrence chain

    u_0 = x
    u_j = alpha_j * (A u_{j-1}) + beta_j * u_{j-1}
          + gamma_j * u_{j-2} + zeta_j * x          (j = 1..s)

and returns u_s — which expresses Chebyshev smoothing sweeps (Saad
Alg. 12.1 / Ifpack2_Details_ChebyshevKernel_decl.hpp), damped-Jacobi /
Richardson sweeps, and plain powers A^s x. A degree-s apply streams x
from HBM ONCE and writes u_s once — 2 vector passes total versus 2s for
s separate SpMV sweeps; the intermediates never leave VMEM.

Reference anchor: the reference's fused smoother kernel
(Ifpack2_Details_ScaledDampedResidual_decl.hpp:77) fuses ONE sweep;
the s-step basis generation in Belos_Tpetra_GmresSstep.hpp:305 applies
A repeatedly through HBM. Fusing the whole polynomial is only possible
because the stencil is matrix-free (no matrix stream to re-read) —
a TPU-first capability with no reference counterpart.

Kernel structure (wavefront ring pipeline): grid steps run sequentially
over row strips and scratch persists across steps, so stage j lags
stage j-1 by the stencil reach: at step b, stage j computes strip
b - j*u into its VMEM ring (u = reach in strips); the final stage
writes the y block (b - s*u, clamped index map with a warmup tail of
s*u extra grid steps whose writes land harmlessly on block 0 until the
first real strip arrives). x strips are DMA'd once into an (s*u + 2)-
slot ring (stages also read x pointwise for the zeta term); stage
rings hold 2u + 2 strips. Boundary masks reuse the precomputed
coefficient*mask planes of the plane-stencil kernel (VMEM-resident,
shared across stages). Out-of-range strips hold zeros/stale-finite
values that the boundary masks annihilate — the same invariant as the
windowed kernels (see stencil_op.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil_op import (LANES, StencilOp, _build_planes,
                         _plane_geometry, stencil_spmv_xla)


def _reach_rows(op: StencilOp) -> int:
    return max((abs(op.lin_offset(o)) // LANES + 2 for o in op.offsets),
               default=1)


def _pick_q(br: int, p_rows: int) -> int | None:
    g = math.gcd(br, p_rows)
    for q in range(min(g, 512), 7, -8):
        if g % q == 0:
            return q
    return None


def _poly_plan(op: StencilOp, n_stages: int, n_out: int = 1):
    """(br, q, u) or None. br | r; q | gcd(br, p_rows) keeps chunks
    z-plane-aligned; u = stencil reach in strips. ``n_out`` is the
    number of HBM output vectors (1 for p(A)x, n_stages for the
    matrix-powers basis) — each costs a double-buffered output window
    in the VMEM budget."""
    p_rows = _plane_geometry(op)
    if p_rows is None or op.dtype != "float32":
        return None
    r = op.n_rows_pad // LANES
    reach = _reach_rows(op)
    planes_np, _ = _build_planes(op)
    plane_bytes = planes_np.nbytes
    budget = 11 * 2 ** 20 - plane_bytes
    row_b = LANES * 4
    best = None
    for br in range(min(r // 2, 4096), 7, -8):
        if r % br:
            continue
        q = _pick_q(br, p_rows)
        if q is None:
            continue
        u = -(-reach // br)
        # stage 1 reads x back to strip b - 2u; zeta terms back to b - su
        s0 = max(n_stages, 2) * u + 2         # x ring slots
        sj = 2 * u + 2                        # stage ring slots
        need = row_b * br * (s0 + (n_stages - 1) * sj + 2 * n_out)
        if need <= budget and r // br >= 2:
            best = (br, q, u)
            break
    return best


def stencil_poly_applicable(op: StencilOp, n_stages: int) -> bool:
    if not 1 <= n_stages <= 8:
        return False
    return _poly_plan(op, n_stages) is not None


def stencil_powers_applicable(op: StencilOp, n_stages: int) -> bool:
    if not 1 <= n_stages <= 8:
        return False
    return _poly_plan(op, n_stages, n_out=n_stages) is not None


def _make_reader(ring, slots: int, center, br: int):
    """read(pos, q) -> (q, LANES) rows [center*br + pos, +q) from a
    (slots, br, LANES) strip ring. pos/q static; center traced."""
    def read(pos: int, q: int):
        shift, off = divmod(pos, br)
        slot = lax.rem(center + jnp.int32(shift + 2 * slots),
                       jnp.int32(slots))
        if off + q <= br:
            return ring[slot, pl.ds(off, q)]
        slot2 = lax.rem(center + jnp.int32(shift + 1 + 2 * slots),
                        jnp.int32(slots))
        return jnp.concatenate(
            [ring[slot, pl.ds(off, br - off)],
             ring[slot2, pl.ds(0, off + q - br)]], axis=0)
    return read


def _stage_strip(op: StencilOp, q, p_rows, plane_idx, planes_ref, br, t,
                 coeffs_j, read_prev, read_prev2, read_x, write_chunk,
                 z_lo, z_hi):
    """Compute one br-row strip of stage j (strip index t, traced):
    alpha*(A u_prev) + beta*u_prev + gamma*u_prev2 + zeta*x, with the
    plane-mask boundary treatment and identity passthrough on padding
    planes (pad rows propagate u_prev unchanged).

    z_lo/z_hi: traced valid-plane bounds for the z masks. For a global
    operator they are (0, nz); a distributed z-slab shard narrows them
    so beyond-global-boundary ghost planes stay masked at EVERY stage
    while interior shard cuts read real halo data."""
    alpha, beta, gamma, zeta = coeffs_j
    nx, ny, nz = op.dims
    nz_total = op.n_rows // (nx * ny)
    has_pad = op.n_rows_pad > op.n_rows
    lane = lax.broadcasted_iota(jnp.int32, (q, LANES), 1)
    m = br // q
    for rep in range(m):
        pos = rep * q
        start = t * br + pos                 # global chunk row (traced)
        iz = lax.div(start, jnp.int32(p_rows))
        poff = start - iz * p_rows
        prev_chunk = read_prev(pos, q).astype(jnp.float32)
        acc = jnp.zeros((q, LANES), dtype=jnp.float32)
        if alpha != 0.0:
            for tt, (off3, c) in enumerate(zip(op.offsets, op.coeffs)):
                o = op.lin_offset(off3)
                ro, lo = divmod(o, LANES)
                a_blk = read_prev(pos + ro, q)
                if lo == 0:
                    shifted = a_blk
                else:
                    b_blk = read_prev(pos + ro + 1, q)
                    ra = pltpu.roll(a_blk, LANES - lo, 1)
                    rb = pltpu.roll(b_blk, LANES - lo, 1)
                    shifted = jnp.where(lane < LANES - lo, ra, rb)
                sf = shifted.astype(jnp.float32)
                dz = off3[2]
                if plane_idx[tt] is not None:
                    pslab = planes_ref[plane_idx[tt], pl.ds(poff, q)]
                    term = pslab * sf
                    if dz:
                        zok = jnp.logical_and(iz + dz >= z_lo,
                                              iz + dz < z_hi)
                        term = jnp.where(zok, term, 0.0)
                elif dz:
                    zok = jnp.logical_and(iz + dz >= z_lo,
                                          iz + dz < z_hi)
                    cz = jnp.where(zok, jnp.float32(c), jnp.float32(0.0))
                    term = cz * sf
                else:
                    term = jnp.float32(c) * sf
                acc = acc + term
            acc = jnp.float32(alpha) * acc
        if beta != 0.0:
            acc = acc + jnp.float32(beta) * prev_chunk
        if gamma != 0.0:
            acc = acc + (jnp.float32(gamma)
                         * read_prev2(pos, q).astype(jnp.float32))
        if zeta != 0.0:
            acc = acc + (jnp.float32(zeta)
                         * read_x(pos, q).astype(jnp.float32))
        if has_pad:
            acc = jnp.where(iz < nz_total, acc, prev_chunk)
        write_chunk(rep, acc)


def _poly_kernel(op: StencilOp, br, q, u, r, stages, p_rows, plane_idx,
                 static_zb, n_out, zb_ref, planes_ref, x_hbm, *rest):
    s = len(stages)
    y_refs = rest[:n_out]         # 1 (u_s only) or s (matrix powers)
    scratch = rest[n_out:]
    if static_zb is not None:     # compile-time bounds (global apply)
        z_lo, z_hi = static_zb
    else:                         # per-shard traced bounds (slab path)
        z_lo, z_hi = zb_ref[0], zb_ref[1]
    x_ring, sems = scratch[0], scratch[-1]
    stage_rings = scratch[1:-1]              # s-1 rings (stage s -> y)
    s0 = max(s, 2) * u + 2
    sj = 2 * u + 2
    b = jnp.asarray(pl.program_id(0), jnp.int32)
    nb = r // br

    def x_copy(t):
        t = jnp.asarray(t, jnp.int32)
        slot = lax.rem(t, jnp.int32(s0))
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * br, br), :],
            x_ring.at[slot], sems.at[slot])

    @pl.when(b == 0)
    def _():
        # zero every ring slot once: out-of-range strips must stay
        # finite (masks multiply them; 0 * garbage-NaN would poison)
        zero = jnp.zeros((br, LANES), dtype=x_ring.dtype)
        for c in range(s0):
            x_ring[c] = zero
        for ring in stage_rings:
            for c in range(sj):
                ring[c] = zero
        x_copy(0).start()
        x_copy(0).wait()

    @pl.when(jnp.logical_and(b + 1 < nb, b > 0))
    def _():
        x_copy(b).wait()

    @pl.when(b + 1 < nb)
    def _():
        x_copy(b + 1).start()

    @pl.when(b == nb - 1)
    def _():
        x_copy(b).wait()

    # wavefront: stage j computes strip b - j*u (when in range)
    for j in range(1, s + 1):
        t = b - jnp.int32(j * u)
        prev_ring = x_ring if j == 1 else stage_rings[j - 2]
        prev_slots = s0 if j == 1 else sj
        prev2_ring = x_ring if j <= 2 else stage_rings[j - 3]
        prev2_slots = s0 if j <= 2 else sj
        read_prev = _make_reader(prev_ring, prev_slots, t, br)
        read_prev2 = _make_reader(prev2_ring, prev2_slots, t, br)
        read_x = _make_reader(x_ring, s0, t, br)

        y_ref = None
        if n_out == s:
            y_ref = y_refs[j - 1]
        elif j == s:
            y_ref = y_refs[0]
        if j < s:
            ring = stage_rings[j - 1]
            slot = lax.rem(t + jnp.int32(2 * sj), jnp.int32(sj))

            def write_chunk(rep, acc, ring=ring, slot=slot, y_ref=y_ref):
                blk = acc.astype(ring.dtype)
                ring[slot, pl.ds(rep * q, q)] = blk
                if y_ref is not None:
                    y_ref[pl.ds(rep * q, q)] = blk.astype(y_ref.dtype)
        else:
            def write_chunk(rep, acc, y_ref=y_ref):
                y_ref[pl.ds(rep * q, q)] = acc.astype(y_ref.dtype)

        @pl.when(jnp.logical_and(t >= 0, t < nb))
        def _(j=j, t=t, read_prev=read_prev, read_prev2=read_prev2,
              read_x=read_x, write_chunk=write_chunk):
            _stage_strip(op, q, p_rows, plane_idx, planes_ref, br, t,
                         stages[j - 1], read_prev, read_prev2, read_x,
                         write_chunk, z_lo, z_hi)


def _poly_call(op: StencilOp, stages, x: jax.Array, interpret: bool,
               z_bounds, all_outputs: bool):
    stages = tuple((float(a), float(bt), float(g), float(z))
                   for a, bt, g, z in stages)
    if stages and stages[0][2] != 0.0:
        raise ValueError("gamma_1 must be 0 (u_{-1} does not exist)")
    s = len(stages)
    n_out = s if all_outputs else 1
    plan = _poly_plan(op, s, n_out=n_out)
    if plan is None:
        raise ValueError("stencil polynomial kernel: not applicable")
    br, q, u = plan
    n = op.n_rows_pad
    r = n // LANES
    nb = r // br
    p_rows = _plane_geometry(op)
    planes_np, plane_idx = _build_planes(op)
    planes = jnp.asarray(planes_np)
    x2 = x.reshape(r, LANES)
    s0 = max(s, 2) * u + 2
    sj = 2 * u + 2
    warm = s * u

    static_zb = (0, op.dims[2]) if z_bounds is None else None
    z_bounds = jnp.asarray([0, op.dims[2]] if z_bounds is None
                           else z_bounds, jnp.int32)

    scratch = [pltpu.VMEM((s0, br, LANES), jnp.float32)]
    scratch += [pltpu.VMEM((sj, br, LANES), jnp.float32)
                for _ in range(s - 1)]
    scratch += [pltpu.SemaphoreType.DMA((s0,))]

    if all_outputs:
        # stage j's output lags the grid by j*u strips; clamp both ends
        # so warmup writes land on block 0 and the tail stays pinned on
        # the last block after the stage finishes (no spurious copies)
        out_shape = [jax.ShapeDtypeStruct((r, LANES), x2.dtype)
                     for _ in range(s)]
        out_specs = [
            pl.BlockSpec((br, LANES),
                         functools.partial(
                             lambda jj, b: (jnp.clip(b - jj * u, 0,
                                                     nb - 1), 0), j),
                         memory_space=pltpu.VMEM)
            for j in range(1, s + 1)]
    else:
        out_shape = jax.ShapeDtypeStruct((r, LANES), x2.dtype)
        out_specs = pl.BlockSpec(
            (br, LANES),
            lambda b: (jnp.maximum(b - warm, 0), 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_poly_kernel, op, br, q, u, r, stages, p_rows,
                          plane_idx, static_zb, n_out),
        out_shape=out_shape,
        grid=(nb + warm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * len(op.offsets) * n * s,
            bytes_accessed=(1 + n_out) * n * 4,
            transcendentals=0,
        ),
    )(z_bounds, planes, x2)
    if all_outputs:
        return jnp.stack([o.reshape(n) for o in out])
    return out.reshape(n)


def stencil_poly_apply(op: StencilOp, stages, x: jax.Array,
                       interpret: bool = False,
                       z_bounds=None) -> jax.Array:
    """Evaluate the recurrence chain on the stencil operator.

    stages: sequence of (alpha, beta, gamma, zeta) per stage j=1..s
    (floats, baked into the kernel). Returns u_s with u_0 = x.
    gamma_1 must be 0 (there is no u_{-1}).

    z_bounds: optional traced (2,) int32 valid-z-plane range
    [z_lo, z_hi) for the boundary masks (default (0, nz)); used by the
    distributed z-slab path, where a shard's extended slab includes
    ghost planes that are real interior data (no masking at the cut)
    or beyond the global boundary (masked at every stage)."""
    return _poly_call(op, stages, x, interpret, z_bounds,
                      all_outputs=False)


def stencil_powers_apply(op: StencilOp, stages, x: jax.Array,
                         interpret: bool = False,
                         z_bounds=None) -> jax.Array:
    """Matrix-powers basis: ALL stage outputs [u_1; ...; u_s] as an
    (s, n) array, in one read of x and one write per basis vector —
    s+1 HBM vector passes versus 2s for s separate SpMV sweeps. This is
    the communication-avoiding basis generator the reference's s-step
    GMRES applies A repeatedly for (Belos_Tpetra_GmresSstep.hpp:305);
    here the intermediates additionally never re-enter HBM between
    applies. Use monomial_stages (or solvers.sstep_gmres.
    newton_basis_stages + a 0.0 zeta) for Krylov bases."""
    return _poly_call(op, stages, x, interpret, z_bounds,
                      all_outputs=True)


def chebyshev_stages(lmax: float, lmin: float, degree: int,
                     dinv: float):
    """Stage coefficients reproducing the framework's Chebyshev
    semi-iteration (precond/chebyshev.py, Saad Alg. 12.1) on the
    Jacobi-scaled system with CONSTANT diagonal 1/dinv and zero initial
    guess: u_degree == Chebyshev(degree).apply(b)."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    stages = [(0.0, 0.0, 0.0, dinv / theta)]   # x_1 = D^-1 b / theta
    for j in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        rr = rho_new * rho
        w = 2.0 * rho_new / delta * dinv
        # x_{j+1} = -w A x_j + (1+rr) x_j - rr x_{j-1} + w b
        gamma = 0.0 if j == 0 else -rr         # x_0 = 0 kills the term
        stages.append((-w, 1.0 + rr, gamma, w))
        rho = rho_new
    return tuple(stages)


def stencil_chebyshev_setup(op: StencilOp, degree: int,
                            lmax: float | None = None,
                            lmin: float | None = None,
                            ratio: float = 30.0, boost: float = 1.1,
                            eig_iters: int = 10):
    """Shared setup for the fused Chebyshev paths (single-chip
    preconditioner and the distributed CA smoother): validates the
    constant diagonal, estimates lmax of D^-1 A by a power method
    (the Chebyshev class's default + boost), applies the lmin ratio,
    and returns the stage coefficients."""
    from ...ops.matvec import spmv

    center = [c for o3, c in zip(op.offsets, op.coeffs)
              if o3 == (0, 0, 0)]
    if not center or center[0] == 0.0:
        raise ValueError("stencil has no (constant) diagonal term")
    dinv = 1.0 / center[0]
    if lmax is None:
        v = jnp.asarray(np.random.default_rng(0).standard_normal(
            op.n_rows_pad), dtype=jnp.float32)
        v = v / jnp.linalg.norm(v)
        lam = 1.0
        for _ in range(eig_iters):
            w = dinv * spmv(op, v)
            lam = float(jnp.linalg.norm(w))
            v = w / max(lam, 1e-30)
        lmax = lam * boost
    if lmin is None:
        lmin = lmax / ratio
    return chebyshev_stages(float(lmax), float(lmin), degree, dinv)


def power_stages(s: int):
    """u_s = A^s x."""
    return tuple((1.0, 0.0, 0.0, 0.0) for _ in range(s))


def monomial_stages(s: int, sigma: float = 1.0):
    """σ-scaled monomial Krylov basis: u_j = (A u_{j-1})/σ, the basis
    the s-step GMRES block loop builds (one norm-scale per step keeps
    the powers from over/underflowing)."""
    inv = 1.0 / float(sigma)
    return tuple((inv, 0.0, 0.0, 0.0) for _ in range(s))


# Newton-basis stages (with conjugate-pair fusion) live with their
# consumer: solvers.sstep_gmres.newton_basis_stages — append a 0.0 zeta
# to feed them to this kernel.


def richardson_stages(omega: float, s: int, dinv: float):
    """Damped-Jacobi sweeps on Ax=b with x_0=0:
    x_{j+1} = x_j + omega D^-1 (b - A x_j)."""
    w = omega * dinv
    stages = [(0.0, 0.0, 0.0, w)]
    for _ in range(s - 1):
        stages.append((-w, 1.0, 0.0, w))
    return tuple(stages)


def _spmv_xla_zb(op: StencilOp, x, z_lo, z_hi):
    """stencil_spmv_xla with traced valid-z-plane bounds."""
    n, npad = op.n_rows, op.n_rows_pad
    nx, ny, nz = op.dims
    gid = jnp.arange(npad)
    ix = gid % nx
    iy = (gid // nx) % ny
    iz = gid // (nx * ny)
    y = jnp.zeros_like(x)
    for off3, c in zip(op.offsets, op.coeffs):
        o = op.lin_offset(off3)
        dx, dy, dz = off3
        valid = gid < n
        valid &= (ix + dx >= 0) & (ix + dx < nx)
        valid &= (iy + dy >= 0) & (iy + dy < ny)
        valid &= (iz + dz >= z_lo) & (iz + dz < z_hi)
        shifted = jnp.roll(x, -o, axis=0) if o else x
        y = y + jnp.where(valid, c * shifted, 0)
    return y


def stencil_poly_xla(op: StencilOp, stages, x: jax.Array,
                     z_bounds=None) -> jax.Array:
    """Reference implementation (any backend, any dtype). Padding rows
    propagate u_{j-1} unchanged, matching the kernel's identity
    convention."""
    return _poly_xla(op, stages, x, z_bounds)[-1]


def stencil_powers_xla(op: StencilOp, stages, x: jax.Array,
                       z_bounds=None) -> jax.Array:
    """All-output reference: (s, n) stack of u_1..u_s."""
    return jnp.stack(_poly_xla(op, stages, x, z_bounds))


def _poly_xla(op: StencilOp, stages, x: jax.Array, z_bounds):
    if z_bounds is None:
        z_lo, z_hi = 0, op.dims[2]
    else:
        z_lo, z_hi = z_bounds[0], z_bounds[1]
    pad = jnp.arange(op.n_rows_pad) >= op.n_rows
    u_prev2 = jnp.zeros_like(x)
    u_prev = x
    outs = []
    for (a, bt, g, z) in stages:
        u = jnp.zeros_like(x)
        if a:
            u = a * _spmv_xla_zb(op, u_prev, z_lo, z_hi)
        if bt:
            u = u + bt * u_prev
        if g:
            u = u + g * u_prev2
        if z:
            u = u + z * x
        u = jnp.where(pad, u_prev, u)
        u_prev2, u_prev = u_prev, u
        outs.append(u)
    return outs
