"""Distributed solve on a device mesh.

Without real multi-chip hardware, run on a virtual CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_cg.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from trilinos_tpu.galeri import laplace3d
from trilinos_tpu.parallel import distmatrix as D, driver as drv
from trilinos_tpu.solvers import cg, cg_pipeline

n_shards = min(len(jax.devices()), 8)
a = laplace3d(24, 24, 24)
dm = D.distribute(a, n_shards)                 # fillComplete + halo plan
print(f"shards={n_shards} halo mode={dm.plan.mode} "
      f"ghosts/shard={dm.plan.n_ghost_pad}")
mesh = drv.make_mesh(n_shards)
prec = drv.dist_jacobi(a, dm.row_map)

b = np.random.default_rng(0).standard_normal(a.shape[0])
bg = jnp.asarray(dm.row_map.to_padded(b))
# without x64, arrays are f32: use an f32-appropriate tolerance (plain CG;
# the pipelined variant trades a little stability for overlap)
solver = cg
res = drv.dist_solve(solver, dm, bg, mesh=mesh, prec=prec, rtol=1e-5)
x = dm.row_map.from_padded(np.asarray(res.x))
rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
print(f"iters={int(res.iters)} true rel residual={rel:.2e}")
