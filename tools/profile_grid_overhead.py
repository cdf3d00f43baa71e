"""Measure the fixed per-grid-step cost of a Pallas TPU kernel at the
bench tile count (2040 tiles at 1080p/32x32), to see how much of the
rasterizer fwd/bwd time is pure grid overhead."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 1024
INST_DIM = 16
F32 = jnp.float32


def null_kernel(tile_starts, inst_hbm, acc_ref, buf, sem):
    acc_ref[0] = jnp.zeros((INST_DIM, P), F32)


def one_dma_kernel(tile_starts, inst_hbm, acc_ref, buf, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(inst_hbm.at[:, pl.ds(0, 128)], buf, sem)
    cp.start()
    cp.wait()
    acc_ref[0] = jnp.zeros((INST_DIM, P), F32) + buf[0, 0]


def run(n_tiles, kern, name):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, INST_DIM, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((INST_DIM, 128), F32),
                        pltpu.SemaphoreType.DMA],
    )
    fn = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, INST_DIM, P), F32))
    ts = jnp.zeros((n_tiles + 1,), jnp.int32)
    data = jnp.zeros((INST_DIM, 4096), F32)
    jfn = jax.jit(lambda: fn(ts, data))
    out = jax.block_until_ready(jfn())
    t0 = time.perf_counter()
    for _ in range(50):
        out = jfn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    print(f"{name:10s} n_tiles={n_tiles:5d}  {dt*1e3:7.3f} ms "
          f"({dt/n_tiles*1e6:6.2f} us/step)")


def main():
    print("devices:", jax.devices())
    for n in (255, 1020, 2040):
        run(n, null_kernel, "null")
    for n in (2040,):
        run(n, one_dma_kernel, "one_dma")


if __name__ == "__main__":
    main()
