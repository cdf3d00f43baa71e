"""Component-wise timing of the 1080p fwd+bwd bench pipeline on TPU.

Times (1) projection+SH, (2) tile binning + align, (3) instance assembly,
(4) pallas fwd kernel, (5) pallas bwd kernel + grad routing, (6) full
fwd+bwd, so kernel work can be separated from XLA prep overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.binning import build_tile_instances
from horizongs_tpu.ops.pallas.raster3d import (
    G, TILE_H, TILE_W, rasterize_bwd, rasterize_fwd)
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import _make_grid
from horizongs_tpu.ops.raster_pallas import (
    _assemble_inst, _instance_grads_to_fields, rasterize_pallas_3dgs)


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    W, H = 1920, 1088
    n = 100_000
    cam = lookat_camera(width=W, height=H, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=0, extent=1.5,
                          scale_range=(0.004, 0.02)).items()}
    bg = jnp.zeros(3)
    cap = 6 * n
    cap = -(-cap // G) * G
    grid = _make_grid(W, H, TILE_W, TILE_H)

    proj_fn = jax.jit(lambda m, q, s: project_3dgs(
        m, q, s, cam.viewmat, cam.K, W, H))
    proj = timeit("project_3dgs", proj_fn, g["means"], g["quats"], g["scales"])

    bin_fn = jax.jit(lambda m2d, r, d: build_tile_instances(
        m2d, r, d, grid.n_tiles_x, grid.n_tiles_y, TILE_W, TILE_H, cap,
        conics=co, opacities=op))
    radii = jnp.where(g["opacities"] >= 1 / 255.0, proj.radii, 0.0)
    co, op = proj.conics, g["opacities"]
    inst = timeit("binning", bin_fn, proj.means2d, radii, proj.depths)
    print(f"   instances: {int(inst.n_instances)} dropped: {int(inst.n_dropped)}")

    fields = jnp.concatenate([
        proj.means2d, proj.conics, g["opacities"][:, None], g["colors"],
        proj.depths[:, None]], axis=-1)
    asm_fn = jax.jit(lambda f: _assemble_inst(f, inst))
    inst_data = timeit("assemble_inst", asm_fn, fields)

    fwd_fn = jax.jit(lambda d, ts: rasterize_fwd(
        d, ts, grid.n_tiles_x, grid.n_tiles_y))
    acc, logT2 = timeit("pallas fwd", fwd_fn, inst_data, inst.tile_starts)
    ifin = (logT2[:, 1, 0]).astype(jnp.int32)
    import numpy as _np
    # chunk count must match the kernel's floor-aligned walk:
    # n_chunks_t = ceil((lead_t + count_t)/G), lead_t = start_t mod G
    starts = inst.tile_starts[:-1]
    counts = inst.tile_starts[1:] - starts
    lead = starts % 128
    n_chunks = jnp.where(counts > 0, (lead + counts + 127) // 128, 0)
    print(f"   chunks: total={int(jnp.sum(n_chunks))} "
          f"live={int(jnp.sum(ifin))}")

    d_acc = jnp.ones_like(acc)
    d_logT = jnp.zeros((logT2.shape[0], 1, logT2.shape[2]))
    logT = logT2[:, 0:1, :]
    bwd_fn = jax.jit(lambda d, ts: rasterize_bwd(
        d, ts, inst.out_starts, ifin, d_acc, d_logT, logT,
        grid.n_tiles_x, grid.n_tiles_y))
    ginst = timeit("pallas bwd", bwd_fn, inst_data, inst.tile_starts)

    route_fn = jax.jit(lambda gi: _instance_grads_to_fields(gi, inst))
    timeit("grad routing", route_fn, ginst)

    def loss(m, s, o, c):
        r, _, _ = rasterize_pallas_3dgs(
            m, g["quats"], s, o, c, cam.viewmat, cam.K, W, H, bg,
            render_mode="RGB+ED", cap=cap)
        return jnp.mean(r ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    timeit("full fwd+bwd", gfn, g["means"], g["scales"], g["opacities"],
           g["colors"], n=10)

    fwd_only = jax.jit(lambda m, s, o, c: rasterize_pallas_3dgs(
        m, g["quats"], s, o, c, cam.viewmat, cam.K, W, H, bg,
        render_mode="RGB+ED", cap=cap)[0])
    timeit("full fwd only", fwd_only, g["means"], g["scales"],
           g["opacities"], g["colors"], n=10)


if __name__ == "__main__":
    main()
