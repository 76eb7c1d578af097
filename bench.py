"""Performance harness — runs on the real TPU chip.

Prints ONE JSON line: the headline stored-matrix SpMV effective-bandwidth
metric (the analogue of the reference's SpMV roofline table,
packages/kokkos-kernels/perf_test/sparse/KokkosSparse_spmv.cpp:278, and of
the CG per-kernel timer harness,
packages/tpetra/core/test/PerformanceCGSolve/cg_solve_file.hpp:135-140).

Measurement methodology (round 2, validated by repeatability): the
tunneled chip has a ~25-30 ms fixed cost per Python→device call, and pure
XLA elementwise chains can be folded across loop iterations — so
  * every kernel is timed inside ONE in-graph fori_loop with reps large
    enough that the fixed cost is <10% (reps 150-500), min of 3 calls,
    reporting total/reps (slightly conservative);
  * the STREAM triad ceiling is a center-only plane-stencil "copy"
    through the manual-DMA path (XLA cannot fold Pallas calls — the jnp
    version "measured" 1.5 TB/s; the BlockSpec-pipeline copy is ~7x
    slower than the manual-DMA path on this chip);
  * solver timing uses FRESH right-hand sides per call (defeats repeat-
    call result caching in the tunnel), GENERATED ON DEVICE from a
    PRNG-key jit argument — round-2's host-built RHS charged the
    8-67 MB tunnel upload to the solver (measured: 128³ CG 4660
    "iters/s" with upload vs 15850 without);
Matrices are passed as jit ARGUMENTS (closures serialize into the
remote-compile request → HTTP 413); so is the AMG hierarchy
(SaAmg.state()).

vs_baseline = achieved_GB/s / (0.70 × pallas-triad), i.e. ≥1.0 meets the
driver target (BASELINE.md: SpMV ≥70% of STREAM roofline). Every metric
is recorded in the value±tolerance perf archive (utils/perf_archive.py,
the Teuchos_XMLPerfTestArchive analogue). Round-1 numbers were measured
with reps=30 and are NOT comparable (they carried +0.83 ms/rep of
dispatch cost).
"""
import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

STREAM_OVERRIDE = os.environ.get("TT_STREAM_PEAK_GBPS")
ARCHIVE = os.environ.get("TT_PERF_ARCHIVE", "PERF_ARCHIVE.json")
LANES = 128


def timed(fn, args, x, reps, repeats=3):
    """min-of-repeats of an in-graph reps-chain; returns seconds/rep."""
    @partial(jax.jit, static_argnums=0)
    def chain(reps_, *a):
        def body(i, v):
            return lax.optimization_barrier(fn(*a[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps_, body, a[-1])

    r = chain(reps, *args, x)
    float(r.reshape(-1)[0])  # hard sync (block_until_ready returns early
    # on the tunnel; the first timed call otherwise absorbs warmup work)
    best = 1e9
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        r = chain(reps, *args, x)
        float(r.reshape(-1)[0])
        if i > 0:  # discard the first timed call (residual warmup)
            best = min(best, time.perf_counter() - t0)
    return best / reps


def measure_triad(reps=300):
    """Read+write roofline via a center-only plane-stencil "copy" — the
    framework's proven manual-DMA streaming path (un-foldable by XLA; the
    BlockSpec-pipeline copy measures ~7x slower on this chip and a jnp
    copy chain gets folded entirely)."""
    from trilinos_tpu.ops.pallas.stencil_op import (StencilOp,
                                                    stencil_spmv_planes)

    op = StencilOp.create((256, 256, 256), [((0, 0, 0), 1.0)])
    n = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    dt = timed(lambda v: stencil_spmv_planes(op, v), (), x, reps)
    return 2 * n * 4 / dt / 1e9


def bench_spmv(nx=256, ny=256, nz=256, dtype=np.float32, reps=150):
    """Stored-DIA SpMV via the Pallas kernel (general-format headline)."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv

    a = laplace3d(nx, ny, nz, dtype=dtype, fmt="dia")
    n = a.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=dtype)
    dt = timed(lambda m, v: mv.spmv(m, v), (a,), x, reps)
    itemsize = np.dtype(dtype).itemsize
    useful = (a.data.shape[0] + 2) * n * itemsize
    return useful / dt / 1e9, a.nnz / dt, dt


def bench_spmv_bf16(nx=256, ny=256, nz=256, reps=300):
    """bf16 diagonal storage (f32 accumulate): ~halves the data stream."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv

    a = laplace3d(nx, ny, nz, dtype=jnp.bfloat16, fmt="dia")
    n = a.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    dt = timed(lambda m, v: mv.spmv(m, v), (a,), x, reps)
    return a.nnz / dt, dt


def bench_stencil_op(nx=256, ny=256, nz=256, reps=300):
    """Matrix-free plane-masked stencil kernel: nnz/s."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    dt = timed(lambda v: mv.spmv(op, v), (), x, reps)
    return op.nnz / dt, dt


def bench_spmm(nx=256, ny=256, nz=256, k=4, reps=100):
    """Packed multivector DIA SpMM (KokkosSparse_spmv.hpp:156 analogue)."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops.pallas.dia_spmv import dia_spmm_packed_best

    a = laplace3d(nx, ny, nz, dtype=np.float32, fmt="dia")
    r = a.n_rows_pad // LANES
    xk = jnp.asarray(
        np.random.default_rng(2).standard_normal((k, r, LANES)),
        dtype=jnp.float32)
    dt = timed(lambda m, v: dia_spmm_packed_best(m, v), (a,), xk, reps)
    agg = (a.data.shape[0] + 2 * k) * a.n_rows_pad * 4
    return agg / dt / 1e9, a.nnz * k / dt, dt


def bench_bdia(nx=1024, ny=512, reps=300):
    """Block-stencil (BDIA) apply on Q1 elasticity (b=2, 9 block
    offsets) in PLANE layout — the solve path (``bdia_plane_solver_op``:
    pack/unpack once per solve, per-iteration apply is the pure kernel;
    design + measured-layout rationale in ops/pallas/bdia_spmv.py;
    KokkosSparse_spmv_bsrmatrix_impl.hpp is the reference analogue)."""
    from trilinos_tpu.galeri import elasticity2d
    from trilinos_tpu.ops import csr_to_bdia

    a = csr_to_bdia(elasticity2d(nx, ny, e_mod=1.0, dtype=np.float32), 2,
                    dtype=np.float32)
    # the plane-op apply == packed kernel modulo a free reshape; pass the
    # matrix as a jit ARGUMENT (closures over device arrays → HTTP 413
    # on the remote-compile tunnel)
    from trilinos_tpu.ops.pallas.bdia_spmv import bdia_spmm_packed

    r = a.nbr_pad // LANES
    xk = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, r, LANES)),
        dtype=jnp.float32)
    dt = timed(lambda m, v: bdia_spmm_packed(m, v), (a,), xk, reps)
    nd, b = len(a.offsets), a.block_size
    stored = (nd * b * b + 2 * b) * a.nbr_pad * 4
    return stored / dt / 1e9, a.nnz / dt, dt


def bench_cheb_fused(nx=256, ny=256, nz=256, degree=4, reps=150):
    """Fused degree-d Chebyshev sweep (ops/pallas/stencil_poly.py):
    one HBM pass for the whole polynomial. Reports the effective
    per-sweep nnz rate (degree * nnz / t) — the unfused sweep costs
    ~degree SpMV passes (Ifpack2_Details_ChebyshevKernel fuses ONE)."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops.pallas.stencil_poly import (chebyshev_stages,
                                                      stencil_poly_apply)

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    stages = chebyshev_stages(1.9, 0.06, degree, 1 / 6.0)
    n = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(6).standard_normal(n),
                    dtype=jnp.float32)
    dt = timed(lambda v: stencil_poly_apply(op, stages, v), (), x, reps)
    return degree * op.nnz / dt, dt


def bench_powers(nx=256, ny=256, nz=256, s=4, reps=150):
    """Matrix-powers basis kernel: ALL of u_1..u_s in one read of x
    (s+1 HBM vector passes vs 2s unfused) — the CA-GMRES basis
    generator (Belos_Tpetra_GmresSstep.hpp:305 applies A through HBM
    s times). Reports effective nnz rate s*nnz/t."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops.pallas.stencil_poly import (monomial_stages,
                                                      stencil_powers_apply)

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(7).standard_normal(n),
                    dtype=jnp.float32)
    # sigma ~ ||A|| keeps the rep-chain feedback from overflowing
    stages = monomial_stages(s, sigma=12.0)
    dt = timed(lambda v: stencil_powers_apply(op, stages, v)[-1], (), x,
               reps)
    return s * op.nnz / dt, dt


def _device_rhs(npad, n):
    """Fresh on-device RHS from a PRNG key (fresh per timed call, zero
    host→device traffic — see the methodology note above)."""
    def mk(key):
        return jnp.where(jnp.arange(npad) < n,
                         jax.random.normal(key, (npad,), jnp.float32),
                         0.0)
    return mk


def _timed_solve(run, n_timed=4):
    """min-of-(n_timed-1) of run(key) with fresh keys; returns
    (last_result, best_seconds)."""
    r = run(jax.random.PRNGKey(0))
    float(jnp.max(r.resnorm))  # hard sync + warmup
    best = 1e9
    for i in range(n_timed):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        r = run(k)
        float(jnp.max(r.resnorm))
        if i > 0:
            best = min(best, time.perf_counter() - t0)
    return r, best


def _timed_solve_chain(run_raw, extra_args=(), n_chain=8, n_timed=3):
    """Chain ``n_chain`` independent solves (fresh keys each → no
    result-caching/folding) inside ONE jitted lax.scan and report
    total/n_chain — the same big-reps rule the kernel benches follow.
    Whole-solve benches short enough to finish in ≲10 ms (AMG-PCG) are
    otherwise ~all tunnel dispatch: one solve per call measured 25 ms
    where the chained device time is ~8 ms. Returns
    ((iters, max_resnorm) of the last chained solve, seconds/solve)."""
    @jax.jit
    def chain(keys, *extra):
        def body(carry, key):
            r = run_raw(key, *extra)
            return carry, (jnp.max(r.resnorm), r.iters)
        _, (rn, its) = lax.scan(body, 0, keys)
        return rn[-1], its[-1]

    keys = jax.random.split(jax.random.PRNGKey(0), n_chain)
    rn, its = chain(keys, *extra_args)
    float(rn)  # hard sync + warmup compile
    best = 1e9
    for i in range(n_timed + 1):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), n_chain)
        t0 = time.perf_counter()
        rn, its = chain(keys, *extra_args)
        float(rn)
        if i > 0:  # discard first timed call (residual warmup)
            best = min(best, time.perf_counter() - t0)
    return (int(its), float(rn)), best / n_chain


def bench_bdia_solve(nx=64, ny=64, nz=48, iters=400):
    """BDIA solve path on 3-D Q1 elasticity (27 block offsets, b=3):
    CG over bdia_plane_solver_op (pack once per solve, plane-layout
    kernel per iteration) — the block-matrix solve benchmark (Tpetra
    BlockCrs + Belos CG; Galeri_Elasticity3DProblem is the reference
    generator). Fresh RHS per timed call; reports iterations/s."""
    from trilinos_tpu.galeri import elasticity3d
    from trilinos_tpu.ops import csr_to_bdia
    from trilinos_tpu.ops.pallas.bdia_spmv import bdia_plane_solver_op
    from trilinos_tpu.solvers import cg

    a = csr_to_bdia(elasticity3d(nx, ny, nz, e_mod=1.0,
                                 dtype=np.float32), 3, dtype=np.float32)
    op, pack, unpack = bdia_plane_solver_op(a)
    npad = 3 * a.nbr_pad
    mk = _device_rhs(npad, npad)
    run = jax.jit(lambda key: cg(op, pack(mk(key)), rtol=0.0,
                                 maxiter=iters))
    r, best = _timed_solve(run)
    per_it = best / max(int(r.iters), 1)
    return 1.0 / per_it, per_it


def bench_amg_pcg(nx=64, ny=64, nz=64, rtol=1e-5):
    """End-to-end AMG-preconditioned CG time-to-solution on Laplace3D:
    structured-aggregation hierarchy — matrix-free stencil fine level,
    reshape transfers, exact boundary-classified Galerkin DIA coarse
    levels (the KokkosSparse_pcg.cpp / MueLu-preconditioned-solve
    analogue). Round 2's uncoupled hierarchy measured 581 ms here; the
    structured one ~50 ms. Returns (iters, solve_seconds) — fresh RHS
    per timed call."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv
    from trilinos_tpu.precond import SaAmg
    from trilinos_tpu.solvers import cg

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    m = SaAmg(op, {"dtype": np.float32}).compute()
    n, npad = op.n_rows, op.n_rows_pad
    mk = _device_rhs(npad, n)
    st = m.state()  # hierarchy as jit ARGUMENT (not baked constants)
    (iters, _), per_solve = _timed_solve_chain(
        lambda key, ss: cg(lambda v: mv.spmv(op, v), mk(key),
                           prec=lambda v: m.apply_state(ss, v), rtol=rtol,
                           maxiter=200),
        extra_args=(st,))
    return iters, per_solve


def bench_elasticity_amg(nx=32, ny=32, nz=24, rtol=1e-5):
    """Block-structured null-space AMG on 3-D Q1 elasticity (73k dofs):
    rigid-body-mode SA with gather-free BDIA levels
    (precond/block_amg.py; MueLu-on-elasticity analogue). Returns
    (iters, solve_seconds); plain CG on the same matrix measures 75
    iterations / ~88 ms."""
    from trilinos_tpu.galeri.fem import elasticity3d, rigid_body_modes
    from trilinos_tpu.ops import matvec as mv
    from trilinos_tpu.precond.block_amg import BlockStructuredAmg
    from trilinos_tpu.solvers import cg

    a = elasticity3d(nx, ny, nz, e_mod=1.0, dtype=np.float32)
    ns = rigid_body_modes(nx, ny, nz)
    m = BlockStructuredAmg(a, node_dims=(nx, ny, nz), nullspace=ns,
                           n_equations=3,
                           params={"dtype": np.float32,
                                   "coarse: max size": 3000}).compute()
    dev = m.levels[0]["a"]
    n, npad = a.shape[0], m.levels[0]["n_f"]
    mk = _device_rhs(npad, n)
    (iters, _), per_solve = _timed_solve_chain(
        lambda key: cg(lambda v: mv.spmv(dev, v), mk(key), prec=m,
                       rtol=rtol, maxiter=100))
    return iters, per_solve


def bench_ortho(n=2 * 1024 * 1024, k=8, reps=100):
    """Block orthogonalization throughput: CGS2 projection + CholQR2
    (belos_orthomanager_tpetra_benchmark.cpp analogue)."""
    from trilinos_tpu.parallel.comm import SerialComm
    from trilinos_tpu.solvers.ortho import cgs2_project, cholqr2

    comm = SerialComm()
    rng = np.random.default_rng(3)
    v = jnp.asarray(np.linalg.qr(rng.standard_normal((n, k)))[0],
                    dtype=jnp.float32)

    def step(basis, w):
        w2, _ = cgs2_project(comm, basis, w)
        q, _, _ = cholqr2(comm, w2)
        return q

    w0 = jnp.asarray(rng.standard_normal((n, k)), dtype=jnp.float32)
    dt = timed(lambda basis, w: step(basis, w), (v,), w0, reps)
    # CGS2: 4 GEMM passes (2 proj x (VtW + update)) + CholQR2 ~ 2 passes
    gb = (4 + 2) * n * k * 4 / 1e9
    return gb / dt, dt


def bench_cg(nx=128, ny=128, nz=128, iters=1000):
    """CG time per iteration over `iters` fixed iterations with FRESH
    right-hand sides per timed call."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv
    from trilinos_tpu.solvers import cg_single_reduce

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n, npad = op.n_rows, op.n_rows_pad
    mk = _device_rhs(npad, n)
    run = jax.jit(lambda key: cg_single_reduce(
        lambda v: mv.spmv(op, v), mk(key), rtol=0.0, maxiter=iters))
    r, best = _timed_solve(run)
    per_it = best / max(int(r.iters), 1)
    return 1.0 / per_it, per_it


def bench_cg_fused(nx=128, ny=128, nz=128, iters=1000):
    """Fused-iteration CG (one Pallas launch/iter) — same protocol as
    bench_cg.

    RETIRED from the main bench (round 4): after the round-3
    state-as-argument CG fixes, XLA's own fusion of the plain cg loop
    beats the hand-fused Pallas iteration on chip (16.45k vs 13.05k
    iters/s at 128³) — the kernel kept losing its round-2 advantage.
    Kept as an opt-in measurement; flagship paths use plain cg."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.solvers import cg_fused

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n, npad = op.n_rows, op.n_rows_pad
    mk = _device_rhs(npad, n)
    run = jax.jit(lambda key: cg_fused(op, mk(key), rtol=0.0,
                                       maxiter=iters))
    r, best = _timed_solve(run)
    per_it = best / max(int(r.iters), 1)
    return 1.0 / per_it, per_it


def bench_gmres(nx=128, ny=128, nz=128, restart=30, iters=120,
                basis_dtype=None):
    """GMRES(30) time per iteration (CGS2 ortho) on the Laplace3D
    stencil — the Belos BlockGmres hot loop (BelosBlockGmresIter.hpp:659:
    op apply + projectAndNormalize + Givens per step). Fixed iteration
    count (rtol=0) with fresh RHS per timed call, like bench_cg.
    ``basis_dtype=jnp.bfloat16`` measures the inexact-Krylov narrow
    basis storage (halved basis HBM traffic; 1.6x on chip)."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.ops import matvec as mv
    from trilinos_tpu.solvers import gmres

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n, npad = op.n_rows, op.n_rows_pad
    mk = _device_rhs(npad, n)
    run = jax.jit(lambda key: gmres(
        lambda v: mv.spmv(op, v), mk(key), rtol=0.0, restart=restart,
        maxiter=iters, basis_dtype=basis_dtype))
    r, best = _timed_solve(run)
    per_it = best / max(int(r.iters), 1)
    return 1.0 / per_it, per_it


def bench_sstep_gmres(nx=128, ny=128, nz=128, s=4, t_blocks=8,
                      restarts=4, basis_dtype=None):
    """CA (s-step) GMRES per-basis-vector rate: the fused matrix-powers
    kernel generates s basis vectors in ONE HBM pass and the block
    orthogonalization costs 4 reductions per s vectors — measured ~2.4x
    standard GMRES(30)'s per-iteration rate (the Belos_Tpetra_GmresSstep
    design goal, Belos_Tpetra_GmresSstep.hpp:305, realized with the TPU
    kernel). Fixed work (rtol=0), fresh device RHS; sigma is the
    Laplace3D operator-norm scale (estimate_opnorm cannot run with a
    traced RHS)."""
    from trilinos_tpu.galeri import laplace3d
    from trilinos_tpu.solvers import sstep_gmres

    op = laplace3d(nx, ny, nz, dtype=np.float32, fmt="stencil")
    n, npad = op.n_rows, op.n_rows_pad
    mk = _device_rhs(npad, n)
    run = jax.jit(lambda key: sstep_gmres(
        op, mk(key), s=s, t_blocks=t_blocks, max_restarts=restarts,
        rtol=0.0, sigma=12.0, basis_dtype=basis_dtype))
    r, best = _timed_solve(run)
    per_it = best / max(int(r.iters), 1)
    return 1.0 / per_it, per_it


def _safe(fn, fallback):
    try:
        return fn()
    except Exception:
        return fallback


def main():
    # startup watchdog: if the tunneled chip never answers (relay down),
    # emit an honest JSON line and exit instead of hanging the driver —
    # jax.devices() blocks indefinitely when the axon relay is gone
    # (observed round 5: ~2h outage with no in-container recovery path)
    import os as _os
    import threading

    ready = threading.Event()

    def _startup_watchdog():
        if not ready.wait(300):
            print(json.dumps({
                "metric": "spmv_effective_bandwidth", "value": 0.0,
                "unit": "GB/s", "vs_baseline": 0.0,
                "extra": {"error": "TPU device init did not complete "
                                   "within 300s (axon tunnel down?)"}}),
                  flush=True)
            _os._exit(17)

    threading.Thread(target=_startup_watchdog, daemon=True).start()
    n_dev = len(jax.devices())
    ready.set()
    assert n_dev >= 1

    from trilinos_tpu.utils.perf_archive import PerfArchive

    triad = float(STREAM_OVERRIDE) if STREAM_OVERRIDE else _safe(
        measure_triad, 550.0)
    gbps, nnz_s, t_apply = _safe(bench_spmv, (0.0, 0.0, float("inf")))
    st_nnz_s, st_t = _safe(bench_stencil_op, (0.0, float("inf")))
    bf_nnz_s, bf_t = _safe(bench_spmv_bf16, (0.0, float("inf")))
    mm_gbps, mm_nnz_s, mm_t = _safe(bench_spmm, (0.0, 0.0, float("inf")))
    bd_gbps, bd_nnz_s, bd_t = _safe(bench_bdia, (0.0, 0.0, float("inf")))
    cf_nnz_s, cf_t = _safe(bench_cheb_fused, (0.0, float("inf")))
    pw_nnz_s, pw_t = _safe(bench_powers, (0.0, float("inf")))
    bds_iters_s, bds_it_t = _safe(bench_bdia_solve, (0.0, float("inf")))
    ortho_gbps, ortho_t = _safe(bench_ortho, (0.0, float("inf")))
    cg_iters_s, cg_it_t = _safe(bench_cg, (0.0, float("inf")))
    gm_iters_s, gm_it_t = _safe(bench_gmres, (0.0, float("inf")))
    gmb_iters_s, gmb_it_t = _safe(
        lambda: bench_gmres(basis_dtype=jnp.bfloat16), (0.0, float("inf")))
    ca_iters_s, ca_it_t = _safe(bench_sstep_gmres, (0.0, float("inf")))
    cab_iters_s, cab_it_t = _safe(
        lambda: bench_sstep_gmres(basis_dtype=jnp.bfloat16),
        (0.0, float("inf")))
    amg_iters, amg_t = _safe(bench_amg_pcg, (0, float("inf")))
    el_iters, el_t = _safe(bench_elasticity_amg, (0, float("inf")))
    target = 0.70 * triad

    arch = PerfArchive(ARCHIVE, machine=os.environ.get("TT_MACHINE",
                                                       "axon-v5e"))
    statuses = {}
    for name, val in [("spmv_gbps", gbps),
                      ("stencil_gnnz", st_nnz_s / 1e9),
                      ("spmm_gbps", mm_gbps),
                      ("bdia_gbps", bd_gbps),
                      ("cheb4_fused_gnnz", cf_nnz_s / 1e9),
                      ("powers4_gnnz", pw_nnz_s / 1e9),
                      ("bdia_cg_iters_per_s", bds_iters_s),
                      ("ortho_gbps", ortho_gbps),
                      ("cg_iters_per_s", cg_iters_s),
                      ("gmres_iters_per_s", gm_iters_s),
                      ("gmres_bf16_iters_per_s", gmb_iters_s),
                      ("sstep_gmres_iters_per_s", ca_iters_s),
                      ("sstep_gmres_bf16_iters_per_s", cab_iters_s),
                      ("amg_pcg_solves_per_s",
                       0.0 if amg_t in (0, float("inf")) else 1.0 / amg_t),
                      ("elasticity_amg_solves_per_s",
                       0.0 if el_t in (0, float("inf")) else 1.0 / el_t),
                      ("triad_gbps", triad)]:
        r = arch.check(name, val, tol=1.20, higher_is_better=True)
        statuses[name] = r.status

    print(json.dumps({
        "metric": "spmv_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 3),
        "extra": {
            "stream_triad_gbps": round(triad, 1),
            "spmv_nnz_per_s_G": round(nnz_s / 1e9, 2),
            "spmv_apply_ms": round(t_apply * 1e3, 3),
            "stencil_op_nnz_per_s_G": round(st_nnz_s / 1e9, 2),
            "stencil_op_apply_ms": round(st_t * 1e3, 3),
            "spmv_bf16_nnz_per_s_G": round(bf_nnz_s / 1e9, 2),
            "spmv_bf16_apply_ms": round(bf_t * 1e3, 3),
            "spmm_k4_gbps": round(mm_gbps, 1),
            "spmm_k4_nnz_per_s_G": round(mm_nnz_s / 1e9, 2),
            "bdia_elasticity_gbps": round(bd_gbps, 1),
            "bdia_nnz_per_s_G": round(bd_nnz_s / 1e9, 2),
            "bdia_apply_ms": round(bd_t * 1e3, 3),
            "cheb4_fused_nnz_per_s_G": round(cf_nnz_s / 1e9, 2),
            "cheb4_fused_sweep_ms": round(cf_t * 1e3, 3),
            "powers4_nnz_per_s_G": round(pw_nnz_s / 1e9, 2),
            "powers4_block_ms": round(pw_t * 1e3, 3),
            "bdia_cg_iters_per_s": round(bds_iters_s, 1),
            "bdia_cg_iter_ms": round(bds_it_t * 1e3, 3),
            "ortho_gbps": round(ortho_gbps, 1),
            "cg_iters_per_s": round(cg_iters_s, 1),
            "cg_iter_ms": round(cg_it_t * 1e3, 3),
            "gmres_iters_per_s": round(gm_iters_s, 1),
            "gmres_iter_ms": round(gm_it_t * 1e3, 3),
            "gmres_bf16_iters_per_s": round(gmb_iters_s, 1),
            "gmres_bf16_iter_ms": round(gmb_it_t * 1e3, 3),
            "sstep_gmres_iters_per_s": round(ca_iters_s, 1),
            "sstep_gmres_iter_ms": round(ca_it_t * 1e3, 3),
            "sstep_gmres_bf16_iters_per_s": round(cab_iters_s, 1),
            "sstep_gmres_bf16_iter_ms": round(cab_it_t * 1e3, 3),
            "amg_pcg_iters_64^3": amg_iters,
            "amg_pcg_solve_ms": round(amg_t * 1e3, 2),
            "elasticity_amg_iters_73k": el_iters,
            "elasticity_amg_solve_ms": round(el_t * 1e3, 2),
            "perf_archive": statuses,
            "timing": "big-reps min-of-3 (reps 100-300), pallas triad, "
                      "fresh-RHS CG; round-1 numbers carried +0.83ms/rep "
                      "dispatch cost and are not comparable",
            "problem": "Laplace3D 256^3 (SpMV/SpMM k=4), 128^3 (CG), f32",
        },
    }))


if __name__ == "__main__":
    main()
