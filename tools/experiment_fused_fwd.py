"""r5 kernel-scheduling experiment (ROOFLINE.json's named escape hatch):
a FUSED-GRID 3DGS forward — the whole tile grid walked inside ONE pallas
grid step (fori_loop over tiles, same pair-chunk walk as
`raster3d._fwd_kernel`, manual double-buffered OUTPUT DMA of each tile's
(16, P) acc + (2, P) logT frames) — against the production per-tile-grid
kernel.

Motivation: the r4 cost model pins the forward at
t = n_tiles*1.7us + chunks*1.28us, and six measured restructurings
could not move the per-chunk term. The per-TILE term is Mosaic's
grid-step machinery (prologue, output-block pipelining); paying it once
per frame instead of 2040x is the one untried lever the r4 VERDICT
sanctioned a timeboxed attempt at (#5). Output writes here overlap the
next tile's walk exactly like the production kernel's auto-pipelined
blocks, so any delta is the grid-step overhead itself.

Correctness is checked against the production kernel on the synthetic
equal-L workload before timing. Result goes to ROOFLINE.json as the
seventh scheduling entry — kept only on a measured win.

Usage: python tools/experiment_fused_fwd.py [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from horizongs_tpu.ops.pallas.raster3d import (
    G, INST_DIM, LOG_T_EPS, P, TILE_H, TILE_W, _chunk_alpha, dot_f32,
    lane_prefix_excl, rasterize_fwd)

F32 = jnp.float32


def _fused_fwd_kernel(tile_starts, inst_hbm, acc_hbm, logT_hbm,
                      buf, obuf, lbuf, sem, osem, lsem, *, n_tiles_x,
                      n_tiles):
    def dma(base, p, slot):
        off = pl.multiple_of(base + p * (2 * G), G)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, 2 * G)], buf.at[slot], sem.at[slot])

    def odma(t, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], acc_hbm.at[t], osem.at[slot])

    def ldma(t, slot):
        return pltpu.make_async_copy(
            lbuf.at[slot], logT_hbm.at[t], lsem.at[slot])

    def tile_body(t, carry):
        start = tile_starts[t]
        count = tile_starts[t + 1] - start
        base = (start // G) * G
        lead = start - base
        n_chunks = jnp.where(count > 0, pl.cdiv(lead + count, G), 0)
        n_pairs = pl.cdiv(n_chunks, 2)

        tx = (t % n_tiles_x).astype(F32) * TILE_W
        ty = (t // n_tiles_x).astype(F32) * TILE_H
        row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx + (row % TILE_W).astype(F32) + 0.5
        py = ty + (row // TILE_W).astype(F32) + 0.5

        @pl.when(n_pairs > 0)
        def _():
            dma(base, 0, 0).start()

        def cond(c):
            p, acc, logT = c
            return (p < n_pairs) & (jnp.max(logT) > LOG_T_EPS)

        def body(c):
            p, acc, logT = c
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < n_pairs)
            def _():
                dma(base, p + 1, jax.lax.rem(p + 1, 2)).start()

            dma(base, p, slot).wait()
            pair = buf[slot]
            alpha, lam, _, _, _ = _chunk_alpha(pair, px, py,
                                               p * (2 * G) - lead, count)
            lamA = lam[:, :G]
            lamB = lam[:, G:]
            sA = jnp.sum(lamA, axis=1, keepdims=True)
            logT_tot = logT + jnp.concatenate(
                [lane_prefix_excl(lamA), sA + lane_prefix_excl(lamB)],
                axis=1)
            w = jnp.where(logT_tot > LOG_T_EPS,
                          alpha * jnp.exp(logT_tot), 0.0)
            acc = acc + dot_f32(pair, w, (((1,), (1,)), ((), ())))
            logT = logT + sA + jnp.sum(lamB, axis=1, keepdims=True)
            return p + 1, acc, logT

        p_fin, acc, logT = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), jnp.zeros((INST_DIM, P), F32),
             jnp.zeros((P, 1), F32)))

        @pl.when((p_fin < n_pairs) & (n_pairs > 0))
        def _():
            dma(base, p_fin, jax.lax.rem(p_fin, 2)).wait()

        i_fin = jnp.minimum(2 * p_fin, n_chunks)
        oslot = jax.lax.rem(t, 2)

        # wait for this slot's previous output write before overwriting
        @pl.when(t >= 2)
        def _():
            odma(t - 2, oslot).wait()
            ldma(t - 2, oslot).wait()

        obuf[oslot] = acc
        lbuf[oslot] = jnp.concatenate(
            [jnp.swapaxes(logT, 0, 1),
             jnp.full((1, P), i_fin.astype(F32))], axis=0)
        odma(t, oslot).start()
        ldma(t, oslot).start()
        return carry

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)
    # drain the last two tiles' writes
    odma(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()
    ldma(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()
    odma(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()
    ldma(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y"))
def rasterize_fwd_fused(inst_data, tile_starts, n_tiles_x: int,
                        n_tiles_y: int):
    n_tiles = n_tiles_x * n_tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, 2 * G), F32),
            pltpu.VMEM((2, INST_DIM, P), F32),
            pltpu.VMEM((2, 2, P), F32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, n_tiles_x=n_tiles_x,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, INST_DIM, P), F32),
                   jax.ShapeDtypeStruct((n_tiles, 2, P), F32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, inst_data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_tiles_x", type=int, default=60)
    ap.add_argument("--n_tiles_y", type=int, default=34)
    ap.add_argument("--record", action="store_true",
                    help="append the result to ROOFLINE.json")
    args = ap.parse_args()
    ntx, nty = args.n_tiles_x, args.n_tiles_y
    n_tiles = ntx * nty
    rng = np.random.default_rng(0)
    results = []
    for L in (1, 2, 4, 16):
        cap = n_tiles * L * G
        data = np.zeros((INST_DIM, cap + 2 * G), np.float32)
        data[0, :cap] = rng.uniform(0, ntx * 32, cap)
        data[1, :cap] = rng.uniform(0, nty * 32, cap)
        data[2, :cap] = 0.02
        data[4, :cap] = 0.02
        data[5, :cap] = 0.005
        data[6:9, :cap] = rng.uniform(0, 1, (3, cap))
        data[9, :cap] = rng.uniform(1, 10, cap)
        data[10, :cap] = 1.0
        d = jnp.asarray(data)
        ts = jnp.asarray((np.arange(n_tiles + 1) * L * G).astype(np.int32))

        base = jax.jit(lambda d, ts: rasterize_fwd(d, ts, ntx, nty))
        fused = jax.jit(lambda d, ts: rasterize_fwd_fused(d, ts, ntx, nty))
        ab, lb = jax.block_until_ready(base(d, ts))
        af, lf = jax.block_until_ready(fused(d, ts))
        err = max(float(jnp.max(jnp.abs(ab - af))),
                  float(jnp.max(jnp.abs(lb - lf))))

        def tmin(f):
            best = float("inf")
            for _ in range(3):
                o = jax.block_until_ready(f(d, ts))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = f(d, ts)
                jax.block_until_ready(o[0])
                best = min(best, (time.perf_counter() - t0) / args.iters)
            return best

        tb, tf = tmin(base), tmin(fused)
        chunks = n_tiles * L
        results.append({"L": L, "base_ms": round(tb * 1e3, 3),
                        "fused_ms": round(tf * 1e3, 3),
                        "max_err": err})
        print(f"L={L:2d}: base {tb*1e3:7.2f} ms ({tb/chunks*1e6:5.2f} "
              f"us/chunk)  fused {tf*1e3:7.2f} ms "
              f"({tf/chunks*1e6:5.2f} us/chunk)  max_err {err:.2e}")

    if args.record:
        path = "ROOFLINE.json"
        prior = json.load(open(path)) if os.path.exists(path) else {}
        win = all(r["fused_ms"] < r["base_ms"] for r in results)
        prior["scheduling_attempt_fused_grid_fwd"] = {
            "sweep": results,
            "verdict": "win" if win else "negative",
        }
        with open(path, "w") as f:
            json.dump(prior, f, indent=1)
        print(f"recorded to {path}")


if __name__ == "__main__":
    main()
