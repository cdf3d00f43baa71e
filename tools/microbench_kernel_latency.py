"""Isolate the raster kernels' per-chunk iteration cost vs segment
length: synthetic instance buffers with L chunks in EVERY tile's
segment, timed over the full grid. If us/chunk falls sharply as L grows,
the kernels are per-tile-fixed-cost / iteration-latency bound (the
ROOFLINE.json hypothesis at the real workload's L~2.3), and processing
two independent tiles per grid step is the right fix; if it is flat,
the serial in-loop chain binds and wider chunks are the lever.

Usage: python tools/microbench_kernel_latency.py [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_tiles_x", type=int, default=60)
    ap.add_argument("--n_tiles_y", type=int, default=34)
    args = ap.parse_args()

    from horizongs_tpu.ops.binning import grad_capacity
    from horizongs_tpu.ops.pallas.raster3d import (
        G, INST_DIM, rasterize_bwd, rasterize_fwd)

    ntx, nty = args.n_tiles_x, args.n_tiles_y
    n_tiles = ntx * nty
    rng = np.random.default_rng(0)

    for L in (1, 2, 4, 8, 16):
        cap = n_tiles * L * G
        # instance fields: means spread inside each tile so alphas are
        # real but tiles don't saturate (opacity 0.3)
        data = np.zeros((INST_DIM, cap + 2 * G), np.float32)
        mx = rng.uniform(0, ntx * 32, cap)
        my = rng.uniform(0, nty * 32, cap)
        data[0, :cap] = mx
        data[1, :cap] = my
        data[2, :cap] = 0.02   # conic a
        data[4, :cap] = 0.02   # conic c
        data[5, :cap] = 0.005  # just above the 1/255 alpha cutoff: most
        # pixel-splat pairs mask to zero, so tiles never saturate and
        # every chunk is walked — us/chunk stays well-defined at high L
        data[6:9, :cap] = rng.uniform(0, 1, (3, cap))
        data[9, :cap] = rng.uniform(1, 10, cap)
        data[10, :cap] = 1.0
        tile_starts = (np.arange(n_tiles + 1) * L * G).astype(np.int32)
        d = jnp.asarray(data)
        ts = jnp.asarray(tile_starts)

        fwd = jax.jit(lambda d, ts: rasterize_fwd(d, ts, ntx, nty))
        acc, logT2 = jax.block_until_ready(fwd(d, ts))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc, logT2 = fwd(d, ts)
        jax.block_until_ready(acc)
        t_fwd = (time.perf_counter() - t0) / args.iters

        out_starts = ts  # segments already G-aligned: grad cols == starts
        ifin = logT2[:, 1, 0].astype(jnp.int32)
        dacc = jnp.ones_like(acc)
        dlogT = jnp.zeros((n_tiles, 1, acc.shape[2]))
        logTf = logT2[:, 0:1, :]
        bwd = jax.jit(lambda d, dacc, ifin, logTf: rasterize_bwd(
            d, ts, out_starts, ifin, dacc, dlogT, logTf, ntx, nty))
        g = jax.block_until_ready(bwd(d, dacc, ifin, logTf))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = bwd(d, dacc, ifin, logTf)
        jax.block_until_ready(g)
        t_bwd = (time.perf_counter() - t0) / args.iters

        chunks = n_tiles * L
        print(f"L={L:2d}: fwd {t_fwd*1e3:7.2f} ms "
              f"({t_fwd/chunks*1e6:5.2f} us/chunk)   "
              f"bwd {t_bwd*1e3:7.2f} ms "
              f"({t_bwd/chunks*1e6:5.2f} us/chunk)")


if __name__ == "__main__":
    main()
