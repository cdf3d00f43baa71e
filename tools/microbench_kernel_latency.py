"""Isolate the raster kernels' per-chunk iteration cost vs segment
length: synthetic instance buffers with L chunks in EVERY tile's
segment, timed over the full grid. If us/chunk falls sharply as L grows,
the kernels are per-tile-fixed-cost / iteration-latency bound (the
ROOFLINE.json hypothesis at the real workload's L~2.3), and processing
two independent tiles per grid step is the right fix; if it is flat,
the serial in-loop chain binds and wider chunks are the lever.

`--kernel 2d` runs the same sweep on the 2DGS (surfel) pair
(`ops/pallas/raster2d.py`) with camera-facing synthetic surfels
(M1=(s,0,mx), M2=(0,s,my), M3=(0,0,1) -> u=(px-mx)/s, v=(py-my)/s,
z=1): the r4 VERDICT asked for the same cost-model rigor the 3DGS pair
got. Its default grid is the 2DGS tile's OWN 1080p shape (60x68 at
32x16 tiles — double the 3DGS grid steps).

Usage: python tools/microbench_kernel_latency.py [--iters 20]
       [--kernel 3d|2d] [--n_tiles_x N --n_tiles_y N]
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


def sweep_3d(args):
    from horizongs_tpu.ops.pallas.raster3d import (
        G, INST_DIM, TILE_H, TILE_W, rasterize_bwd, rasterize_fwd)

    ntx = args.n_tiles_x or 60
    nty = args.n_tiles_y or 34
    n_tiles = ntx * nty
    rng = np.random.default_rng(0)
    rows = []
    for L in (1, 2, 4, 8, 16):
        cap = n_tiles * L * G
        # instance fields: means spread inside each tile so alphas are
        # real but tiles don't saturate (opacity 0.3)
        data = np.zeros((INST_DIM, cap + 2 * G), np.float32)
        mx = rng.uniform(0, ntx * TILE_W, cap)
        my = rng.uniform(0, nty * TILE_H, cap)
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
        rows.append((L, t_fwd, t_bwd, chunks))
        print(f"L={L:2d}: fwd {t_fwd*1e3:7.2f} ms "
              f"({t_fwd/chunks*1e6:5.2f} us/chunk)   "
              f"bwd {t_bwd*1e3:7.2f} ms "
              f"({t_bwd/chunks*1e6:5.2f} us/chunk)")
    return fit_cost_model(rows, n_tiles)


def sweep_2d(args):
    from horizongs_tpu.ops.pallas.raster2d import (
        G, INST_DIM, TILE_H, TILE_W, rasterize2d_bwd, rasterize2d_fwd)

    # the 2DGS tile's OWN 1080p grid (its tiles are TILE_WxTILE_H)
    ntx = args.n_tiles_x or (1920 // TILE_W)
    nty = args.n_tiles_y or (-(-1088 // TILE_H))
    n_tiles = ntx * nty
    rng = np.random.default_rng(0)
    rows = []
    for L in (1, 2, 4, 8, 16):
        cap = n_tiles * L * G
        data = np.zeros((INST_DIM, cap + 2 * G), np.float32)
        mx = rng.uniform(0, ntx * TILE_W, cap)
        my = rng.uniform(0, nty * TILE_H, cap)
        s = 7.0                      # surfel half-extent in pixels
        data[0, :cap] = s            # M1 = (s, 0, mx)
        data[2, :cap] = mx
        data[4, :cap] = s            # M2 = (0, s, my)
        data[5, :cap] = my
        data[8, :cap] = 1.0          # M3 = (0, 0, 1) -> z = 1
        data[9, :cap] = mx
        data[10, :cap] = my
        data[11, :cap] = 0.005      # no-saturation opacity (see 3d sweep)
        data[12:15, :cap] = rng.uniform(0, 1, (3, cap))
        data[15:18, :cap] = rng.uniform(-1, 1, (3, cap))
        data[18, :cap] = 1.0
        tile_starts = (np.arange(n_tiles + 1) * L * G).astype(np.int32)
        d = jnp.asarray(data)
        ts = jnp.asarray(tile_starts)

        fwd = jax.jit(lambda d, ts: rasterize2d_fwd(d, ts, ntx, nty))
        acc, aux = jax.block_until_ready(fwd(d, ts))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc, aux = fwd(d, ts)
        jax.block_until_ready(acc)
        t_fwd = (time.perf_counter() - t0) / args.iters

        out_starts = ts
        ifin = aux[:, 6, 0].astype(jnp.int32)
        dacc = jnp.ones_like(acc)
        # exercise the depth + distortion gradient paths too
        daux = jnp.zeros_like(aux).at[:, 1:3, :].set(1.0)
        bwd = jax.jit(lambda d, dacc, daux, aux, ifin: rasterize2d_bwd(
            d, ts, out_starts, ifin, dacc, daux, aux, ntx, nty))
        g = jax.block_until_ready(bwd(d, dacc, daux, aux, ifin))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = bwd(d, dacc, daux, aux, ifin)
        jax.block_until_ready(g)
        t_bwd = (time.perf_counter() - t0) / args.iters

        chunks = n_tiles * L
        rows.append((L, t_fwd, t_bwd, chunks))
        print(f"L={L:2d}: fwd {t_fwd*1e3:7.2f} ms "
              f"({t_fwd/chunks*1e6:5.2f} us/chunk)   "
              f"bwd {t_bwd*1e3:7.2f} ms "
              f"({t_bwd/chunks*1e6:5.2f} us/chunk)")
    return fit_cost_model(rows, n_tiles)


def fit_cost_model(rows, n_tiles):
    """Least-squares  t = n_tiles*a + chunks*b  over the sweep — the
    (per-tile fixed, per-chunk) cost decomposition ROOFLINE.json uses.
    The L=1 FORWARD point is excluded: it repeatedly measures
    sub-physical times over the remote-TPU tunnel (0.01-0.1 us/chunk —
    less than the DMA issue alone) and would corrupt the fixed-cost
    coefficient; the backward at L=1 measures normally."""
    fit_rows = [r for r in rows if r[0] >= 2]
    A = np.asarray([[n_tiles, r[3]] for r in fit_rows], np.float64)
    yf = np.asarray([r[1] * 1e6 for r in fit_rows])
    yb = np.asarray([r[2] * 1e6 for r in fit_rows])
    (af, bf), *_ = np.linalg.lstsq(A, yf, rcond=None)
    (ab, bb), *_ = np.linalg.lstsq(A, yb, rcond=None)
    print(f"cost model (us): t_fwd = n_tiles*{af:.2f} + chunks*{bf:.2f}"
          f"   t_bwd = n_tiles*{ab:.2f} + chunks*{bb:.2f}")
    return {"fixed_us_per_tile_fwd": round(float(af), 3),
            "us_per_chunk_fwd": round(float(bf), 3),
            "fixed_us_per_tile_bwd": round(float(ab), 3),
            "us_per_chunk_bwd": round(float(bb), 3),
            "n_tiles": n_tiles,
            "sweep": [{"L": r[0], "fwd_ms": round(r[1] * 1e3, 3),
                       "bwd_ms": round(r[2] * 1e3, 3)} for r in rows]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_tiles_x", type=int, default=0)
    ap.add_argument("--n_tiles_y", type=int, default=0)
    ap.add_argument("--kernel", default="3d", choices=["3d", "2d"])
    args = ap.parse_args()
    if args.kernel == "2d":
        sweep_2d(args)
    else:
        sweep_3d(args)


if __name__ == "__main__":
    main()
