"""Benchmark: rasterizer forward+backward throughput at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "rays_per_sec_fwd_bwd_1080p", "value": N, "unit": "rays/s",
   "vs_baseline": N / 2_073_600}

The baseline unit is one full 1080p frame differentiated per second
(2 073 600 rays/s), so vs_baseline reads as "differentiable frames per
second". The reference repo publishes no numbers (BASELINE.md) — the
gsplat CUDA path cannot run on TPU at all — so this metric tracks our
own TPU-native kernel across rounds.

Scene: 100k random gaussians (~420k tile instances at 1080p), full
forward render (RGB+ED) + backward to means/scales/opacities/colors via
the Pallas kernel pair.
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
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 2_073_600, 3),
    }))


if __name__ == "__main__":
    main()
