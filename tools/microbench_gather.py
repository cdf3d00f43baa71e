"""Micro-benchmark of the gradient-routing gathers that dominate the
non-kernel train-step time (HLO trace r4: the un-sort gather fusion.5
costs 14.2 ms, the live-mask gather fusion.4 5.8 ms, vs 16.7 ms for the
whole backward raster kernel).

Variants measured at the real 1080p/36.8k-anchor shapes:
  unsort_lane    : take((10, CAP_OUT), idx, axis=1)   [current]
  unsort_row     : take((CAP_OUT, 10), idx, axis=0)   [transposed layout]
  unsort_sort    : lax.sort by original slot with 10 f32 payload columns
  livemask_gather: ifin[slot_tile] compare             [current]
  livemask_none  : no mask (kernel zeroes dead columns instead)

Each variant runs in a chained loop with a data dependency so XLA can't
CSE the repeats; reported per-iter times include one extra elementwise
pass (~0.2 ms) of dependency-threading noise.

Usage: python tools/microbench_gather.py [--cap 881792] [--iters 20]
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


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:18s} {dt*1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=881_792)
    ap.add_argument("--n", type=int, default=368_640)
    ap.add_argument("--n_tiles", type=int, default=2040)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    from horizongs_tpu.ops.binning import grad_capacity

    cap, N, n_tiles = args.cap, args.n, args.n_tiles
    cap_out = grad_capacity(cap, n_tiles)   # incl. the sentinel block

    rng = np.random.default_rng(0)
    ginst_l = jnp.asarray(rng.normal(size=(10, cap_out)).astype(np.float32))
    ginst_r = jnp.asarray(np.ascontiguousarray(np.asarray(ginst_l).T))
    idx = jnp.asarray(rng.integers(0, cap_out, cap).astype(np.int32))
    slot_tile = jnp.asarray(rng.integers(0, n_tiles, cap).astype(np.int32))
    slot_chunk = jnp.asarray(rng.integers(0, 8, cap).astype(np.int32))
    ifin = jnp.asarray(rng.integers(0, 8, n_tiles).astype(np.int32))
    perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
    ends = jnp.asarray(np.sort(rng.integers(0, cap, N)).astype(np.int32))
    starts = jnp.maximum(ends - 2, 0)

    @jax.jit
    def unsort_lane(g, idx, prev=None):
        if prev is not None:
            g = g + prev[0, 0] * 1e-20
        gu = jnp.take(g, idx, axis=1)
        csum = jnp.cumsum(gu, axis=1)
        csum = jnp.concatenate([jnp.zeros((10, 1)), csum], axis=1)
        return (jnp.take(csum, ends, axis=1)
                - jnp.take(csum, starts, axis=1)).T

    @jax.jit
    def unsort_row(g, idx, prev=None):
        if prev is not None:
            g = g + prev[0, 0] * 1e-20
        gu = jnp.take(g, idx, axis=0)                  # (cap, 10)
        csum = jnp.cumsum(gu, axis=0)
        csum = jnp.concatenate([jnp.zeros((1, 10)), csum], axis=0)
        return jnp.take(csum, ends, axis=0) - jnp.take(csum, starts, axis=0)

    @jax.jit
    def unsort_sort(g, key, prev=None):
        # grads arrive gap-free in sorted-row order (hypothetical kernel
        # layout); one multi-payload sort restores original slot order
        if prev is not None:
            g = g + prev[0, 0] * 1e-20
        cols = tuple(g[i, :cap] for i in range(10))
        out = jax.lax.sort((key,) + cols, num_keys=1)
        gu = jnp.stack(out[1:], axis=0)                # (10, cap)
        csum = jnp.cumsum(gu, axis=1)
        csum = jnp.concatenate([jnp.zeros((10, 1)), csum], axis=1)
        return (jnp.take(csum, ends, axis=1)
                - jnp.take(csum, starts, axis=1)).T

    @jax.jit
    def livemask_gather(g, prev=None):
        if prev is not None:
            g = g + prev[0, 0] * 1e-20
        live = slot_chunk < ifin[slot_tile]
        return jnp.where(live[None, :cap], g[:, :cap], 0.0)

    @jax.jit
    def livemask_none(g, prev=None):
        if prev is not None:
            g = g + prev[0, 0] * 1e-20
        return g[:, :cap] * 1.0

    print(f"cap={cap} cap_out={cap_out} N={N} backend={jax.default_backend()}")
    timeit("unsort_lane", unsort_lane, ginst_l, idx, iters=args.iters)
    timeit("unsort_row", unsort_row, ginst_r, idx, iters=args.iters)
    timeit("unsort_sort", unsort_sort, ginst_l, perm, iters=args.iters)
    timeit("livemask_gather", livemask_gather, ginst_l, iters=args.iters)
    timeit("livemask_none", livemask_none, ginst_l, iters=args.iters)


if __name__ == "__main__":
    main()
