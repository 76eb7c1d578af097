"""Real-chip probe: plane-masked stencil kernel correctness + timing.

Run on the tunneled TPU (no env overrides). Prints timing for the new
plane path vs the legacy masked path at 256^3, plus a correctness check
at 128x64x32 and the flagship CG drive from the verify recipe.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from trilinos_tpu.galeri import laplace3d, laplace2d
from trilinos_tpu.ops import choose_format, spmv
from trilinos_tpu.ops.pallas import stencil_op as S
from trilinos_tpu.solvers import cg


def timed(fn, *args, reps=30):
    @jax.jit
    def chain(*a):
        def body(i, v):
            return lax.optimization_barrier(fn(*a[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps, body, a[-1])

    r = chain(*args)
    r.block_until_ready()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = chain(*args)
        float(r[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    print("devices:", jax.devices())

    # -- correctness on chip: plane kernel vs XLA at 128x64x32 ------------
    op = laplace3d(128, 64, 32, dtype=np.float32, fmt="stencil")
    assert S._plane_plan(op) is not None
    n = op.n_rows_pad
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    y_p = jax.jit(lambda v: S.stencil_spmv_planes(op, v))(x)
    y_x = jax.jit(lambda v: S.stencil_spmv_xla(op, v))(x)
    err = float(jnp.max(jnp.abs(y_p - y_x)))
    print(f"plane-kernel max abs err vs XLA (128x64x32): {err:.3e}")
    assert err < 1e-4, "plane kernel wrong on chip"

    # -- timing at 256^3 ---------------------------------------------------
    big = laplace3d(256, 256, 256, dtype=np.float32, fmt="stencil")
    plan = S._plane_plan(big)
    print("plane plan (br, q, h, P):", plan)
    nb = big.n_rows_pad
    xb = jnp.asarray(np.random.default_rng(1).standard_normal(nb),
                     dtype=jnp.float32)
    t_new = timed(lambda v: S.stencil_spmv_planes(big, v), xb)
    print(f"planes 256^3: {t_new*1e3:.3f} ms, {big.nnz/t_new/1e9:.1f} Gnnz/s")
    t_old = timed(lambda v: S.stencil_spmv_masked(big, v), xb)
    print(f"legacy 256^3: {t_old*1e3:.3f} ms, {big.nnz/t_old/1e9:.1f} Gnnz/s")

    # -- flagship CG drive (verify recipe) --------------------------------
    a = laplace2d(100, 100, dtype=np.float32)
    dev = choose_format(a)
    n, npad = a.shape[0], dev.n_rows_pad
    b = np.zeros(npad, np.float32)
    b[:n] = np.random.default_rng(0).standard_normal(n)
    res = cg(lambda v: spmv(dev, v), jnp.asarray(b), rtol=1e-5, maxiter=2000)
    xs = np.asarray(res.x)[:n]
    true_rel = (np.linalg.norm(b[:n] - a.to_dense() @ xs)
                / np.linalg.norm(b[:n]))
    print(f"flagship CG: converged={bool(res.converged)} "
          f"iters={int(res.iters)} true_rel={true_rel:.2e}")
    assert bool(res.converged) and true_rel < 5e-5


if __name__ == "__main__":
    main()
