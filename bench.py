"""Benchmark: rasterizer forward+backward throughput at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "rays_per_sec_fwd_bwd_1080p", "value": N, "unit": "rays/s",
   "vs_baseline": N / 2_073_600,
   "full_step_ms_1080p": M, "full_step_rays_per_sec": R,
   "full_step_anchors": A}

The baseline unit is one full 1080p frame differentiated per second
(2 073 600 rays/s), so vs_baseline reads as "differentiable frames per
second". The reference repo publishes no numbers (BASELINE.md) — the
gsplat CUDA path cannot run on TPU at all — so this metric tracks our
own TPU-native kernel across rounds.

Headline scene: 100k random gaussians (~420k tile instances at 1080p),
full forward render (RGB+ED) + backward to means/scales/opacities/colors
via the Pallas kernel pair.

`full_step_*`: the COMPLETE training step at 1080p on the flagship LOD
model (~20k-point octree scene: LOD mask -> prefilter -> MLP decode of
anchors x 10 offsets -> Pallas raster -> loss -> backward -> Adam ->
densify stats), so decode/loss/optimizer regressions are visible per
round, not just the rasterizer (round-2 VERDICT weak #5).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
    on_tpu = jax.default_backend() not in ("cpu",)

    W, H = 1920, 1088  # tile-aligned 1080p (driver metric uses 1920x1080 rays)
    RAYS = 1920 * 1080
    n = 100_000 if on_tpu else 2_000
    if not on_tpu:
        W, H = 256, 144
        RAYS = W * H

    cam = lookat_camera(width=W, height=H, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=0, extent=1.5,
                          scale_range=(0.004, 0.02)).items()}
    bg = jnp.zeros(3)

    if on_tpu:
        from horizongs_tpu.ops.raster_pallas import (
            count_instances_3dgs, rasterize_pallas_3dgs)
        # calibrate the static instance capacity to the scene (the
        # binning/assembly/routing stages scale with it; gsplat sizes
        # its instance list exactly per frame — this is the static-shape
        # analog, 2% pad + G rounding)
        n_inst = int(jax.jit(count_instances_3dgs,
                             static_argnames=("width", "height"))(
            g["means"], g["quats"], g["scales"], g["opacities"],
            cam.viewmat, cam.K, width=W, height=H))
        cap = -(-int(n_inst * 1.02) // 128) * 128

        def loss(m, s, o, c):
            r, _, _ = rasterize_pallas_3dgs(
                m, g["quats"], s, o, c, cam.viewmat, cam.K, W, H, bg,
                render_mode="RGB+ED", cap=cap)
            return jnp.mean(r ** 2)
    else:
        from horizongs_tpu.ops.raster import rasterize_tiled_3dgs

        def loss(m, s, o, c):
            r, _, _ = rasterize_tiled_3dgs(
                m, g["quats"], s, o, c, cam.viewmat, cam.K, W, H, bg,
                render_mode="RGB+ED", chunk=512)
            return jnp.mean(r ** 2)

    # chain each iteration on the previous gradients (zero-scaled,
    # inside the jit — eager glue ops over a remote TPU tunnel cost
    # ~ms each): real training steps are sequential, and chaining
    # prevents the runtime from eliding repeated identical dispatches
    def step_fn(m, s, o, c, chain):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
            m + chain * 0.0, s, o, c)
        return grads, grads[0][0, 0]

    step = jax.jit(step_fn)
    args = (g["means"], g["scales"], g["opacities"], g["colors"])
    out, chain = step(*args, jnp.float32(0))
    jax.block_until_ready(out)

    iters = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(iters):
        out, chain = step(*args, chain)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    rays_per_sec = RAYS / dt
    metric = ("rays_per_sec_fwd_bwd_1080p" if on_tpu
              else "rays_per_sec_fwd_bwd_256x144_cpu_fallback")

    # forward-only render FPS (the serving path; the reference times
    # per-view render latency with cuda events, train.py:409-413)
    if on_tpu:
        def render_only(m, chain):
            r, _, _ = rasterize_pallas_3dgs(
                m + chain * 0.0, g["quats"], g["scales"], g["opacities"],
                g["colors"], cam.viewmat, cam.K, W, H, bg,
                render_mode="RGB+ED", cap=cap)
            return r, r[0, 0, 0]
    else:
        def render_only(m, chain):
            r, _, _ = rasterize_tiled_3dgs(
                m + chain * 0.0, g["quats"], g["scales"], g["opacities"],
                g["colors"], cam.viewmat, cam.K, W, H, bg,
                render_mode="RGB+ED", chunk=512)
            return r, r[0, 0, 0]

    rstep = jax.jit(render_only)
    r, rchain = rstep(g["means"], jnp.float32(0))
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r, rchain = rstep(g["means"], rchain)
    jax.block_until_ready(r)
    render_fps = 1.0 / ((time.time() - t0) / iters)

    # 2DGS kernel pair (the surface-reconstruction path: normals +
    # distortion + median depth, reference gsplat rasterization_2dgs)
    # on the same scene — tracked so the second kernel family can't
    # silently regress behind the 3DGS headline
    rays_2d = None
    if on_tpu:
        from horizongs_tpu.ops.raster_pallas import (
            count_instances_2dgs, rasterize_pallas_2dgs)
        n2 = int(jax.jit(count_instances_2dgs,
                         static_argnames=("width", "height"))(
            g["means"], g["quats"], g["scales"], g["opacities"],
            cam.viewmat, cam.K, width=W, height=H))
        cap2 = -(-int(n2 * 1.02) // 128) * 128

        def loss2(m, s, o, c):
            r, _, nrm, _, dist, _, _ = rasterize_pallas_2dgs(
                m, g["quats"], s, o, c, cam.viewmat, cam.K, W, H, bg,
                render_mode="RGB+ED", cap=cap2)
            return jnp.mean(r ** 2) + jnp.mean(nrm ** 2) + jnp.mean(dist)

        def step2_fn(m, s, o, c, chain):
            grads = jax.grad(loss2, argnums=(0, 1, 2, 3))(
                m + chain * 0.0, s, o, c)
            return grads, grads[0][0, 0]

        step2 = jax.jit(step2_fn)
        out2, chain2 = step2(*args, jnp.float32(0))
        jax.block_until_ready(out2)
        t0 = time.time()
        for _ in range(iters):
            out2, chain2 = step2(*args, chain2)
        jax.block_until_ready(out2)
        rays_2d = RAYS / ((time.time() - t0) / iters)

    full = full_train_step(on_tpu)
    line = {
        "metric": metric,
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 2_073_600, 3),
        "render_fps_fwd_only": round(render_fps, 1),
        **full,
    }
    if rays_2d is not None:
        line["rays_per_sec_2dgs_fwd_bwd"] = round(rays_2d)
    print(json.dumps(line))


def full_train_step(on_tpu: bool) -> dict:
    """Complete train step (decode -> raster -> loss -> backward -> Adam
    -> stats) at 1080p on the flagship LOD model; small shapes on the
    CPU fallback."""
    from __graft_entry__ import _flagship
    from horizongs_tpu.config import make_optim
    from horizongs_tpu.ops.raster_pallas import suggest_instance_cap
    from horizongs_tpu.render import count_render_instances
    from horizongs_tpu.train.optim import mlps_from_params
    from horizongs_tpu.train.step import build_train_step, camera_tensors

    if on_tpu:
        W, H, n_points, rasterizer, iters = 1920, 1088, 20_000, "pallas", 10
        rays = 1920 * 1080
    else:
        W, H, n_points, rasterizer, iters = 256, 144, 500, "tiled", 2
        rays = W * H
    cfg, ts, cams = _flagship(capacity=None, width=W, height=H, n_cams=1,
                              n_points=n_points, voxel_size=0.02,
                              scale_range=(0.01, 0.04))
    cam = cams[0]._replace(image=jnp.zeros((H, W, 3)),
                           alpha_mask=jnp.ones((H, W, 1)))
    opt = make_optim(start_stat=0)
    # count with the chosen backend's OWN tile shape (scan tiles are
    # 16x16, pallas 32x32 — a pallas-tile count under-sizes the scan cap
    # ~4x and the fallback bench would silently drop instances)
    n_inst = int(count_render_instances(
        cam, cfg, mlps_from_params(ts.params), ts.anchor_state(),
        add_prefilter=True,
        backend="pallas" if rasterizer == "pallas" else "scan"))
    cap = suggest_instance_cap(n_inst, margin=1.15)
    step = build_train_step(cfg, opt, H, W, add_prefilter=True,
                            rasterizer=rasterizer, instance_cap=cap)
    ct = camera_tensors(cam, do_stats=True)
    m = None
    for i in range(2):
        ts, m = step(ts, ct, i + 1)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for i in range(iters):
        ts, m = step(ts, ct, i + 10)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / iters
    key = "full_step_ms_1080p" if on_tpu else "full_step_ms_cpu_fallback"
    return {key: round(dt * 1e3, 2),
            "full_step_rays_per_sec": round(rays / dt),
            "full_step_anchors": int(jax.device_get(ts.n))}


if __name__ == "__main__":
    main()
