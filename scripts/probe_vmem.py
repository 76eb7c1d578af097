"""Probe usable VMEM: try pallas kernels with increasing scratch sizes."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_scratch(mb):
    rows = mb * 1024 * 1024 // (128 * 4)

    def kern(x_ref, y_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        y_ref[:] = x_ref[:] + scratch[0, 0]

    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        )(x)
        out.block_until_ready()
        float(out[0, 0])
        return True
    except Exception as e:
        return f"{type(e).__name__}: {str(e)[:100]}"


def main():
    for mb in (13, 14, 15, 16):
        r = try_scratch(mb)
        print(f"scratch {mb:4d} MB: {r}", flush=True)
        if r is not True:
            break


if __name__ == "__main__":
    main()
