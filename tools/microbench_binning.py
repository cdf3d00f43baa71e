"""Cost model of the NON-KERNEL raster path vs the static instance
capacity (r4 VERDICT ask #3): on the flagship 1080p view, time each
stage — binning (spans -> slot expansion -> sort -> routing tables),
instance assembly, the backward gradient un-sort — at a ladder of
capacities around the calibrated one, with the LIVE workload held
fixed. The fitted slope (ms per 100k capacity slots) is what a unit of
cap slack costs per step; the intercept is the live-work floor.

The binning/routing stages are all O(cap) gathers/sorts/cumsums
(`ops/binning.py`), so cost should be ~linear in cap: the artifact
makes the slack-vs-recompile tradeoff of `suggest_instance_cap`
buckets/margins a measured number instead of a guess.

Usage: python tools/microbench_binning.py [--out BINNING_COST.json]
Writes/merges the `capacity_cost` section into ROOFLINE.json by
default.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tmin(f, *a, iters=10, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        o = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--out", default="ROOFLINE.json")
    args = ap.parse_args()

    from tools.bench_scaling import _scene
    from horizongs_tpu.models.anchors import (anchor_lod_mask,
                                              decode_neural_gaussians)
    from horizongs_tpu.ops.binning import (build_tile_instances,
                                           grad_capacity)
    from horizongs_tpu.ops.pallas.raster3d import (
        G, INST_DIM, TILE_H, TILE_W, rasterize_bwd, rasterize_fwd)
    from horizongs_tpu.ops.raster import _make_grid
    from horizongs_tpu.ops.raster_fields import pack_fields_3dgs
    from horizongs_tpu.ops.raster_pallas import (
        _assemble_inst, _instance_grads_to_fields)
    from horizongs_tpu.train.optim import mlps_from_params

    W, H = args.width, args.height
    cfg, ts, cams = _scene(W, H, args.n_points, 0, 1, 1)
    cam = cams[0]
    mlps = mlps_from_params(ts.params)
    astate = ts.anchor_state()
    grid = _make_grid(W, H, TILE_W, TILE_H)
    n_tiles = grid.n_tiles_x * grid.n_tiles_y

    @jax.jit
    def decode(astate):
        mask, smooth = anchor_lod_mask(cfg, astate, cam.cam_center,
                                       cam.resolution_scale)
        dec = decode_neural_gaussians(cfg, mlps, astate, cam.cam_center,
                                      mask, smooth,
                                      appearance_id=jnp.asarray(0))
        fields, radii, _ = pack_fields_3dgs(
            dec.means, dec.quats, dec.scales, dec.opacities, dec.colors,
            cam.viewmat, cam.K, W, H)
        return fields, radii

    fields, radii = jax.block_until_ready(decode(astate))

    def binfn(cap):
        def f(fields, radii):
            return build_tile_instances(
                fields[:, 0:2], radii, fields[:, 9], grid.n_tiles_x,
                grid.n_tiles_y, TILE_W, TILE_H, cap,
                conics=fields[:, 2:5], opacities=fields[:, 5])
        return jax.jit(f)

    # live workload: span-instance count of this view
    inst_probe = jax.block_until_ready(binfn(4 * fields.shape[0] * 10)
                                       (fields, radii))
    n_live = int(inst_probe.n_instances)

    rows = []
    for slack in (1.05, 1.25, 1.5, 1.76, 2.2):
        cap = -(-int(n_live * slack) // G) * G
        bf = binfn(cap)
        inst = jax.block_until_ready(bf(fields, radii))
        assert int(inst.n_dropped) == 0
        t_bin = tmin(bf, fields, radii)
        asm = jax.jit(_assemble_inst)
        data = jax.block_until_ready(asm(fields, inst))
        t_asm = tmin(asm, fields, inst)
        fwd = jax.jit(lambda d, t: rasterize_fwd(
            d, t, grid.n_tiles_x, grid.n_tiles_y))
        acc, logT2 = jax.block_until_ready(fwd(data, inst.tile_starts))
        t_fwd = tmin(fwd, data, inst.tile_starts)
        ifin = logT2[:, 1, 0].astype(jnp.int32)
        dacc = jnp.ones_like(acc)
        dlogT = jnp.zeros((n_tiles, 1, acc.shape[2]))
        logTf = logT2[:, 0:1, :]
        bwd = jax.jit(lambda d, da, i, lf, ts_, os_: rasterize_bwd(
            d, ts_, os_, i, da, dlogT, lf,
            grid.n_tiles_x, grid.n_tiles_y))
        gi = jax.block_until_ready(bwd(data, dacc, ifin, logTf,
                                       inst.tile_starts, inst.out_starts))
        t_bwd = tmin(bwd, data, dacc, ifin, logTf, inst.tile_starts,
                     inst.out_starts)
        uns = jax.jit(_instance_grads_to_fields)
        jax.block_until_ready(uns(gi, inst))
        t_uns = tmin(uns, gi, inst)
        non_kernel = t_bin + t_asm + t_uns
        rows.append({"cap": cap, "slack": round(cap / n_live, 3),
                     "binning_ms": round(t_bin, 3),
                     "assemble_ms": round(t_asm, 3),
                     "unsort_ms": round(t_uns, 3),
                     "fwd_kernel_ms": round(t_fwd, 3),
                     "bwd_kernel_ms": round(t_bwd, 3),
                     "non_kernel_ms": round(non_kernel, 3)})
        print(f"cap={cap} (slack {cap / n_live:.2f}): bin {t_bin:.2f} "
              f"asm {t_asm:.2f} unsort {t_uns:.2f} | fwd {t_fwd:.2f} "
              f"bwd {t_bwd:.2f}  non-kernel {non_kernel:.2f} ms")

    caps = np.asarray([r["cap"] for r in rows], np.float64)
    A = np.stack([np.ones_like(caps), caps], axis=1)
    fit = {}
    for k in ("binning_ms", "assemble_ms", "unsort_ms", "non_kernel_ms"):
        y = np.asarray([r[k] for r in rows])
        (c0, c1), *_ = np.linalg.lstsq(A, y, rcond=None)
        fit[k] = {"intercept_ms": round(float(c0), 3),
                  "ms_per_100k_cap": round(float(c1) * 1e5, 3)}
    print("slopes (ms/100k cap):",
          {k: v["ms_per_100k_cap"] for k, v in fit.items()})

    out = {"scene": {"width": W, "height": H, "n_anchors": int(ts.n),
                     "n_live_span_instances": n_live},
           "ladder": rows, "fit": fit,
           "note": ("live workload fixed, capacity varied: the slope is "
                    "the per-step cost of capacity slack (gathers/sorts/"
                    "cumsums are O(cap)); the intercept is the live-work "
                    "floor. Feeds the suggest_instance_cap bucket/margin "
                    "choice")}
    prior = {}
    if os.path.exists(args.out):
        try:
            prior = json.load(open(args.out))
        except Exception:
            prior = {}
    prior["capacity_cost"] = out
    with open(args.out, "w") as f:
        json.dump(prior, f, indent=1)
    print(f"wrote {args.out} (capacity_cost section)")


if __name__ == "__main__":
    main()
