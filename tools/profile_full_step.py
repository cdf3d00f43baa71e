"""Stage-wise timing of the FULL 1080p training step on the flagship LOD
model — where do the ~80 ms go?

Times, each as its own jitted function on the chip:
  (1) LOD mask + frustum prefilter
  (2) neural-gaussian MLP decode
  (3) field packing (projection + SH + cull)
  (4) tile binning (sort + segment build + instance assembly)
  (5) the complete train step (fwd+bwd+Adam+stats)
so decode/binning/loss costs can be separated from the raster kernels
(`tools/profile_bench.py` breaks the kernel pair down further).

CAVEAT (remote-TPU environments): once large programs/buffers are
resident in a session, EVERY dispatch carries a fixed overhead (measured
0.05 ms fresh -> 1.6-15 ms loaded on the axon tunnel). The "dispatch
floor" line measures it with a trivial op — subtract it from each stage;
only the end-to-end step time is overhead-amortized. For true on-device
breakdowns capture a jax.profiler trace instead.

Usage: python tools/profile_full_step.py [--n_points 20000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    args = ap.parse_args()

    from __graft_entry__ import _flagship
    from horizongs_tpu.config import make_optim
    from horizongs_tpu.core.cameras import Camera
    from horizongs_tpu.models.anchors import anchor_lod_mask, \
        decode_neural_gaussians
    from horizongs_tpu.ops.binning import build_tile_instances
    from horizongs_tpu.ops.raster import _make_grid
    from horizongs_tpu.ops.raster_fields import pack_fields_3dgs
    from horizongs_tpu.ops.raster_pallas import (
        TILE_H, TILE_W, suggest_instance_cap)
    from horizongs_tpu.render import count_render_instances, \
        prefilter_anchors
    from horizongs_tpu.train.optim import mlps_from_params
    from horizongs_tpu.train.step import build_train_step, camera_tensors

    W, H = args.width, args.height
    cfg, ts, cams = _flagship(capacity=None, width=W, height=H, n_cams=1,
                              n_points=args.n_points, voxel_size=0.02,
                              scale_range=(0.01, 0.04))
    # _flagship initializes on the CPU backend; commit everything to the
    # accelerator FIRST or each timed call re-uploads its inputs and the
    # numbers measure the transport, not the compute
    dev = jax.devices()[0]
    ts = jax.tree.map(lambda x: jax.device_put(x, dev), ts)
    cams = jax.tree.map(lambda x: jax.device_put(x, dev)
                        if hasattr(x, "shape") else x, cams)
    cam = cams[0]._replace(image=jnp.zeros((H, W, 3)),
                           alpha_mask=jnp.ones((H, W, 1)))
    print(f"anchors={int(ts.n)} capacity={ts.params.anchor.shape[0]}",
          flush=True)
    mlps = mlps_from_params(ts.params)
    astate = ts.anchor_state()
    opt = make_optim(start_stat=0)
    n_inst = int(count_render_instances(cam, cfg, mlps, astate,
                                        add_prefilter=True))
    cap = suggest_instance_cap(n_inst, margin=1.15)
    print(f"instances={n_inst} cap={cap}", flush=True)

    probe = jnp.ones((1024,))
    timeit("dispatch floor (trivial op)",
           jax.jit(lambda v: v * 2 + 1), probe)

    @jax.jit
    def stage_mask(astate):
        m, s = anchor_lod_mask(cfg, astate, cam.cam_center,
                               cam.resolution_scale)
        return prefilter_anchors(cfg, astate, cam, m), s

    mask, smooth = timeit("lod mask + prefilter", stage_mask, astate)

    @jax.jit
    def stage_decode(astate, mask, smooth):
        return decode_neural_gaussians(cfg, mlps, astate, cam.cam_center,
                                       mask, smooth,
                                       appearance_id=jnp.asarray(0))

    dec = timeit("mlp decode", stage_decode, astate, mask, smooth)

    @jax.jit
    def stage_pack(dec):
        return pack_fields_3dgs(dec.means, dec.quats, dec.scales,
                                dec.opacities, dec.colors,
                                cam.viewmat, cam.K, W, H)

    fields, radii, proj = timeit("field pack (proj+SH+cull)",
                                 stage_pack, dec)

    grid = _make_grid(W, H, TILE_W, TILE_H)

    @jax.jit
    def stage_bin(fields, radii):
        return build_tile_instances(
            fields[:, 0:2], radii, fields[:, 9], grid.n_tiles_x,
            grid.n_tiles_y, TILE_W, TILE_H, cap,
            conics=fields[:, 2:5], opacities=fields[:, 5])

    timeit("tile binning + assembly", stage_bin, fields, radii)

    step = build_train_step(cfg, opt, H, W, add_prefilter=True,
                            rasterizer="pallas", instance_cap=cap)
    ct = camera_tensors(cam, do_stats=True)
    # the step donates its state argument: time by rebinding (bench.py's
    # measurement loop), never by re-calling with a donated buffer
    ts2, m = step(ts, ct, 1)
    jax.block_until_ready(m["loss"])
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        ts2, m = step(ts2, ct, i + 2)
    jax.block_until_ready(m["loss"])
    print(f"{'FULL train step':34s} "
          f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
