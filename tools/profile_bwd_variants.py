"""Isolate the 3DGS backward kernel's cost centers on TPU.

Builds stripped-down variants of `raster3d._bwd_kernel` (same DMA/loop
skeleton) and times each at the 1080p/100k bench shape:
  full      — the real kernel (baseline)
  no_write  — gradients computed but never DMA'd out
  no_dots   — dw/gcd MXU dots replaced by cheap placeholders
  no_scan   — suffix scans replaced by plain sums
  walk_only — DMA + alpha recompute only (no grad math at all)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.binning import build_tile_instances, grad_capacity
from horizongs_tpu.ops.pallas import raster3d as r3
from horizongs_tpu.ops.pallas.raster3d import (
    _chunk_alpha, _pixel_coords, dot_f32, lane_suffix_incl,
    G, INST_DIM, LOG_T_EPS, P, TILE_H, TILE_W, F32)
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import _make_grid
from horizongs_tpu.ops.raster_pallas import _assemble_inst


def make_bwd(mode):
    def kern(tile_starts, out_starts, ifin, inst_hbm, dacc_hbm,
             dlogT_hbm, logT_final_hbm, ginst_ref, buf, go, gbuf,
             lt_buf, sem, sem_go, wsem, *, n_tiles_x):
        t = pl.program_id(0)
        start = tile_starts[t]
        count = tile_starts[t + 1] - start
        base = (start // G) * G
        lead = start - base
        out0 = out_starts[t]
        n_live = ifin[t]

        cp_go = pltpu.make_async_copy(dacc_hbm.at[t], go, sem_go)
        cp_go.start()
        cp_dl = pltpu.make_async_copy(dlogT_hbm.at[t], lt_buf.at[0], sem_go)
        cp_dl.start()
        cp_lt = pltpu.make_async_copy(logT_final_hbm.at[t], lt_buf.at[1],
                                      sem_go)
        cp_lt.start()
        cp_go.wait()
        cp_dl.wait()
        cp_lt.wait()

        px, py = _pixel_coords(t, n_tiles_x)
        dlogT = jnp.swapaxes(lt_buf[0], 0, 1)
        logT0 = jnp.swapaxes(lt_buf[1], 0, 1)

        def dma(i, slot):
            off = pl.multiple_of(base + i * G, G)
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(off, G)], buf.at[slot], sem.at[slot])

        def wdma(i, slot):
            off = pl.multiple_of(out0 + i * G, G)
            return pltpu.make_async_copy(
                gbuf.at[slot], ginst_ref.at[:, pl.ds(off, G)],
                wsem.at[slot])

        @pl.when(n_live > 0)
        def _():
            dma(n_live - 1, jax.lax.rem(n_live - 1, 2)).start()

        def body(k, carry):
            S, logT_after = carry
            i = n_live - 1 - k
            slot = jax.lax.rem(i, 2)

            @pl.when(i - 1 >= 0)
            def _():
                dma(i - 1, jax.lax.rem(i - 1, 2)).start()

            dma(i, slot).wait()
            chunk = buf[slot]
            alpha, lam, dx, dy, not_clamped = _chunk_alpha(
                chunk, px, py, i * G - lead, count)

            if mode == "walk_only":
                S = S + jnp.sum(alpha, axis=1, keepdims=True)
                logT_after = logT_after - jnp.sum(lam, axis=1,
                                                  keepdims=True)
                return S, logT_after

            if mode == "no_scan":
                logT_tot = logT_after - lam
            else:
                logT_tot = logT_after - lane_suffix_incl(lam)
            T = jnp.exp(logT_tot)
            w = jnp.where(logT_tot > LOG_T_EPS, alpha * T, 0.0)

            if mode == "no_dots":
                dw = w
                gcd = chunk
            else:
                dw = dot_f32(go[:], chunk, (((0,), (0,)), ((), ())))
                gcd = dot_f32(go[:], w, (((1,), (0,)), ((), ())))
            wdw = w * dw
            if mode == "no_scan":
                S_after = S + wdw
            else:
                S_after = S + lane_suffix_incl(wdw) - wdw
            live = w > 0.0
            dalpha = jnp.where(live, T * dw - S_after / (1.0 - alpha), 0.0)

            a = chunk[2:3, :]
            b = chunk[3:4, :]
            c = chunk[4:5, :]
            op = chunk[5:6, :]
            ens = jnp.where(op > 0, alpha / jnp.maximum(op, 1e-12), 0.0)
            dsig = jnp.where(not_clamped & live, -alpha * dalpha, 0.0)
            dop = jnp.where(not_clamped & live, ens * dalpha, 0.0)

            gmx = -jnp.sum((a * dx + b * dy) * dsig, axis=0, keepdims=True)
            gmy = -jnp.sum((b * dx + c * dy) * dsig, axis=0, keepdims=True)
            ga = jnp.sum(0.5 * dx * dx * dsig, axis=0, keepdims=True)
            gb = jnp.sum(dx * dy * dsig, axis=0, keepdims=True)
            gc = jnp.sum(0.5 * dy * dy * dsig, axis=0, keepdims=True)
            gop = jnp.sum(dop, axis=0, keepdims=True)
            zero = jnp.zeros((1, G), F32)

            if mode != "no_write":
                @pl.when(k >= 2)
                def _():
                    wdma(i + 2, slot).wait()

            gbuf[slot] = jnp.concatenate(
                [gmx, gmy, ga, gb, gc, gop,
                 gcd[6:7], gcd[7:8], gcd[8:9], gcd[9:10],
                 zero, zero, zero, zero, zero, zero], axis=0)
            if mode != "no_write":
                wdma(i, slot).start()

            S = S + jnp.sum(wdw, axis=1, keepdims=True)
            logT_after = logT_after - jnp.sum(lam, axis=1, keepdims=True)
            return S, logT_after

        jax.lax.fori_loop(0, n_live, body, (dlogT, logT0))

        if mode not in ("no_write", "walk_only"):
            @pl.when(n_live > 0)
            def _():
                wdma(0, 0).wait()

            @pl.when(n_live > 1)
            def _():
                wdma(1, 1).wait()
        else:
            @pl.when(n_live > 0)
            def _():
                wdma(0, 0).start()
                wdma(0, 0).wait()

    return kern


def run_variant(mode, inst_data, inst, ifin, d_acc, d_logT, logT, ntx, nty):
    n_tiles = ntx * nty
    cap = inst_data.shape[1] - 2 * G
    cap_out = grad_capacity(cap, n_tiles, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, G), F32),
            pltpu.VMEM((INST_DIM, P), F32),
            pltpu.VMEM((2, INST_DIM, G), F32),
            pltpu.VMEM((2, 1, P), F32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(make_bwd(mode), n_tiles_x=ntx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((INST_DIM, cap_out), F32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jfn = jax.jit(lambda: fn(inst.tile_starts, inst.out_starts, ifin,
                             inst_data, d_acc, d_logT, logT))
    out = jax.block_until_ready(jfn())
    t0 = time.perf_counter()
    for _ in range(20):
        out = jfn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"bwd[{mode:10s}] {dt * 1e3:8.2f} ms")


def main():
    W, H = 1920, 1088
    n = 100_000
    cam = lookat_camera(width=W, height=H, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=0, extent=1.5,
                          scale_range=(0.004, 0.02)).items()}
    cap = -(-6 * n // G) * G
    grid = _make_grid(W, H, TILE_W, TILE_H)

    proj = jax.jit(lambda m, q, s: project_3dgs(
        m, q, s, cam.viewmat, cam.K, W, H))(g["means"], g["quats"],
                                            g["scales"])
    radii = jnp.where(g["opacities"] >= 1 / 255.0, proj.radii, 0.0)
    co, op = proj.conics, g["opacities"]
    inst = jax.jit(lambda m, r, d: build_tile_instances(
        m, r, d, grid.n_tiles_x, grid.n_tiles_y, TILE_W, TILE_H,
        cap, conics=co, opacities=op))(proj.means2d, radii, proj.depths)
    fields = jnp.concatenate([
        proj.means2d, proj.conics, g["opacities"][:, None], g["colors"],
        proj.depths[:, None]], axis=-1)
    inst_data = jax.jit(lambda f: _assemble_inst(f, inst))(fields)
    acc, logT2 = jax.jit(lambda d, ts: r3.rasterize_fwd(
        d, ts, grid.n_tiles_x, grid.n_tiles_y))(inst_data,
                                                inst.tile_starts)
    ifin = logT2[:, 1, 0].astype(jnp.int32)
    d_acc = jnp.ones_like(acc)
    d_logT = jnp.zeros((logT2.shape[0], 1, logT2.shape[2]))
    logT = logT2[:, 0:1, :]

    for mode in ("full", "no_write", "no_dots", "no_scan", "walk_only"):
        run_variant(mode, inst_data, inst, ifin, d_acc, d_logT, logT,
                    grid.n_tiles_x, grid.n_tiles_y)


if __name__ == "__main__":
    main()
