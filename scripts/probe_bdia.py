"""On-chip verification of the BDIA (block-stencil) Pallas kernel:
parity vs the XLA plane path + big-reps bandwidth measurement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bdia.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

from trilinos_tpu.galeri import elasticity2d
from trilinos_tpu.ops import csr_to_bdia
from trilinos_tpu.ops import matvec as mv
from trilinos_tpu.ops.pallas.bdia_spmv import (bdia_pallas_applicable,
                                               bdia_spmm_pallas,
                                               bdia_spmv_pallas)

print("backend:", jax.default_backend(), flush=True)

# --- correctness at moderate size -------------------------------------
a = csr_to_bdia(elasticity2d(96, 64, e_mod=1.0, dtype=np.float32), 2,
                dtype=np.float32)
assert bdia_pallas_applicable(a, 1), "kernel not applicable at 96x64?"
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(a.n_rows_pad), dtype=jnp.float32)
y_k = np.asarray(jax.jit(bdia_spmv_pallas)(a, x))
y_x = np.asarray(jax.jit(partial(mv.spmv, impl="xla"))(a, x))
err = np.max(np.abs(y_k - y_x)) / max(np.max(np.abs(y_x)), 1e-30)
print(f"spmv parity rel-max-err: {err:.2e}", flush=True)
assert err < 1e-5, "BDIA spmv parity FAILED on chip"

k = 4
xk = jnp.asarray(rng.standard_normal((a.n_rows_pad, k)), dtype=jnp.float32)
ymk = np.asarray(jax.jit(bdia_spmm_pallas)(a, xk))
ymx = np.asarray(jax.jit(partial(mv.spmv, impl="xla"))(a, xk))
errm = np.max(np.abs(ymk - ymx)) / max(np.max(np.abs(ymx)), 1e-30)
print(f"spmm k=4 parity rel-max-err: {errm:.2e}", flush=True)
assert errm < 1e-5, "BDIA spmm parity FAILED on chip"

# --- bandwidth at bench size ------------------------------------------


def timed(fn, args, x0, reps, repeats=3):
    @partial(jax.jit, static_argnums=0)
    def chain(reps_, *aa):
        def body(i, v):
            return lax.optimization_barrier(fn(*aa[:-1], v) * (1.0 / 7.0))
        return lax.fori_loop(0, reps_, body, aa[-1])

    r = chain(reps, *args, x0)
    float(r.reshape(-1)[0])
    best = 1e9
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        r = chain(reps, *args, x0)
        float(r.reshape(-1)[0])
        if i > 0:
            best = min(best, time.perf_counter() - t0)
    return best / reps


big = csr_to_bdia(elasticity2d(1024, 512, e_mod=1.0, dtype=np.float32), 2,
                  dtype=np.float32)
xb = jnp.asarray(rng.standard_normal(big.n_rows_pad), dtype=jnp.float32)
for label, fn in [("pallas", lambda m, v: mv.spmv(m, v)),
                  ("xla", lambda m, v: mv.spmv(m, v, impl="xla"))]:
    dt = timed(fn, (big,), xb, 300)
    nd, b = len(big.offsets), big.block_size
    stored = (nd * b * b + 2 * b) * big.nbr_pad * 4
    print(f"{label}: {dt*1e3:.3f} ms  {stored/dt/1e9:.1f} GB/s  "
          f"{big.nnz/dt/1e9:.1f} Gnnz/s", flush=True)
print("BDIA chip verify OK")
