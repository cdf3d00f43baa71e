"""Field-level rasterization API: composite pre-projected splat records.

The differentiable boundary of both rasterizer backends is a packed
per-gaussian field matrix ("records"): projection, SH evaluation, and the
neural decode happen before it; binning + compositing after. This module
exposes that boundary so splat records can cross devices — the
tile-band-sharded rasterizer (`parallel/tile_exchange.py`) exchanges
records by band ownership over ICI and each device composites only its
rows of the image. No device ever holds the full decoded gaussian set
(SURVEY.md §2.3 "image-tile sharding of the rasterizer"; the reference's
only scale-out is whole-job chunking, `preprocess/data_preprocess.py:459-471`).

Field layouts (float32):
  3DGS (N, 10): [mx, my, conic_a, conic_b, conic_c, opacity, r, g, b, depth]
  2DGS (N, 18): [M1(3), M2(3), M3(3), mx, my, opacity, r, g, b, normal(3)]
    (+ a separate depth vector: 2DGS depth is the per-pixel ray-splat
     intersection, so records carry depth only as the binning sort key)

Band shifting: a device that owns image rows [dy, dy+band_px) composites
its band as a standalone image. For 3DGS that is `my -= dy`. For 2DGS the
ray-splat transform M maps (u,v,1) -> screen homogeneous with
hu = px*M3 - M1, hv = py*M3 - M2; substituting py = py_local + dy gives
M2' = M2 - dy*M3 (and my' = my - dy for the 2D low-pass term). Both are
plain differentiable XLA ops, so band gradients flow back to global
records automatically — the kernels never learn about bands.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.ops.binning import build_tile_instances, cull_radius
from horizongs_tpu.ops.projection import project_2dgs, project_3dgs
from horizongs_tpu.ops.raster import (
    _make_grid,
    _tiles_to_image,
    composite_scan_2dgs,
    composite_scan_3dgs,
)
from horizongs_tpu.ops.reference import _sh_colors

N_FIELDS_3D = 10
N_FIELDS_2D = 18


def backend_tile_shape(gs_attr: str, backend: str) -> tuple[int, int]:
    """(tile_w, tile_h) of a backend — the band granularity for sharding."""
    if backend in ("pallas", "pallas_interpret"):
        if gs_attr == "2D":
            from horizongs_tpu.ops.pallas.raster2d import TILE_H, TILE_W
        else:
            from horizongs_tpu.ops.pallas.raster3d import TILE_H, TILE_W
        return TILE_W, TILE_H
    return 16, 16


def pack_fields_3dgs(means, quats, scales, opacities, colors, viewmat, K,
                     width: int, height: int, sh_degree=None,
                     eps2d: float = 0.3, means2d_override=None,
                     means2d_probe=None):
    """Project + SH-eval + lossless opacity cull -> (fields (N, 10),
    radii (N,), proj). `radii` is the post-cull binning radius (0 =>
    never contributes); `proj.radii` stays the geometric radius for the
    densification stats contract. `means2d_probe`: zeros added to the
    projected centers — grad w.r.t. it is the screen-space gradient the
    densification statistics need (`render.py:91-93` contract)."""
    proj = project_3dgs(means, quats, scales, viewmat, K, width, height,
                        eps2d=eps2d)
    means2d = proj.means2d if means2d_override is None else means2d_override
    if means2d_probe is not None:
        means2d = means2d + means2d_probe
    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)
    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities), 0.0)
    fields = jnp.concatenate([
        means2d, proj.conics, opacities[:, None], rgb, proj.depths[:, None],
    ], axis=-1)
    return fields, radii, proj


def pack_fields_2dgs(means, quats, scales, opacities, colors, viewmat, K,
                     width: int, height: int, sh_degree=None,
                     means2d_override=None, means2d_probe=None):
    """-> (fields (N, 18), radii (N,), depths (N,), proj)."""
    proj = project_2dgs(means, quats, scales, viewmat, K, width, height)
    means2d = proj.means2d if means2d_override is None else means2d_override
    if means2d_probe is not None:
        means2d = means2d + means2d_probe
    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)
    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities, guard_px=2.2),
                      0.0)
    M = proj.transforms
    fields = jnp.concatenate([
        M[:, 0, :], M[:, 1, :], M[:, 2, :], means2d,
        opacities[:, None], rgb, proj.normals,
    ], axis=-1)
    return fields, radii, proj.depths, proj


def shift_band_3dgs(fields: jnp.ndarray, dy) -> jnp.ndarray:
    """Global-coordinate records -> band-local (image rows start at dy)."""
    return fields.at[:, 1].add(-dy)


def shift_band_2dgs(fields: jnp.ndarray, dy) -> jnp.ndarray:
    m2p = fields[:, 3:6] - dy * fields[:, 6:9]     # M2' = M2 - dy*M3
    return jnp.concatenate([
        fields[:, 0:3], m2p, fields[:, 6:10],
        (fields[:, 10] - dy)[:, None], fields[:, 11:]], axis=-1)


def _round_cap(n_records: int, cap: Optional[int], chunk: int,
               backend: str) -> int:
    if backend in ("pallas", "pallas_interpret"):
        from horizongs_tpu.ops.pallas.raster3d import G
        cap = cap if cap is not None else max(4 * n_records, G)
        return -(-cap // G) * G
    cap = cap if cap is not None else max(4 * n_records, chunk)
    return -(-cap // chunk) * chunk


def composite_fields_3dgs(fields: jnp.ndarray, radii: jnp.ndarray,
                          width: int, height: int, background,
                          render_mode: str = "RGB", backend: str = "scan",
                          cap: Optional[int] = None, chunk: int = 1024):
    """Composite packed 3DGS records into an image of (height, width).
    height/width may be a band of a larger image — shift the records
    first (`shift_band_3dgs`). Returns (render, alphas, info)."""
    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    tile_w, tile_h = backend_tile_shape("3D", backend)
    grid = _make_grid(width, height, tile_w, tile_h)
    cap = _round_cap(fields.shape[0], cap, chunk, backend)

    means2d = fields[:, 0:2]
    conics = fields[:, 2:5]
    opac = fields[:, 5]
    rgb = fields[:, 6:9]
    depths = fields[:, 9]
    inst = build_tile_instances(
        jax.lax.stop_gradient(means2d), radii,
        jax.lax.stop_gradient(depths), grid.n_tiles_x, grid.n_tiles_y,
        tile_w, tile_h, cap,
        conics=jax.lax.stop_gradient(conics),
        opacities=jax.lax.stop_gradient(opac))

    if backend in ("pallas", "pallas_interpret"):
        from horizongs_tpu.ops.raster_pallas import _raster_core
        acc, logT2 = _raster_core(fields, inst, grid.n_tiles_x,
                                  grid.n_tiles_y,
                                  backend == "pallas_interpret")
        logT = logT2[:, 0:1, :]
        color_t = jnp.swapaxes(acc[:, 6:9, :], 1, 2)
        alpha_t = jnp.swapaxes(acc[:, 10:11, :], 1, 2)
        depth_t = jnp.swapaxes(acc[:, 9:10, :], 1, 2)
        T_final = jnp.exp(jnp.swapaxes(logT, 1, 2))
        render = _tiles_to_image(
            color_t + T_final * background[None, None, :],
            grid, height, width)
        alphas = _tiles_to_image(alpha_t, grid, height, width)
        if render_mode == "RGB+D":
            depth_img = _tiles_to_image(depth_t, grid, height, width)
            render = jnp.concatenate([render, depth_img], axis=-1)
        elif render_mode == "RGB+ED":
            ed = depth_t / jnp.clip(alpha_t, 1e-10, None)
            depth_img = _tiles_to_image(ed, grid, height, width)
            render = jnp.concatenate([render, depth_img], axis=-1)
    else:
        render, alphas = composite_scan_3dgs(
            means2d, conics, opac, rgb, depths, inst, grid,
            width, height, background, render_mode, chunk, tile_w, tile_h)

    info = {"n_instances": inst.n_instances, "n_dropped": inst.n_dropped}
    return render, alphas, info


def composite_fields_2dgs(fields: jnp.ndarray, radii: jnp.ndarray,
                          depths: jnp.ndarray,
                          width: int, height: int, background,
                          render_mode: str = "RGB", backend: str = "scan",
                          cap: Optional[int] = None, chunk: int = 1024):
    """Composite packed 2DGS records. Returns (render, alphas, normals,
    distort, median, info). `normals_from_depth` must be derived by the
    caller from the (re-assembled) median-depth image."""
    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    tile_w, tile_h = backend_tile_shape("2D", backend)
    grid = _make_grid(width, height, tile_w, tile_h)
    cap = _round_cap(fields.shape[0], cap, chunk, backend)

    means2d = fields[:, 9:11]
    inst = build_tile_instances(
        jax.lax.stop_gradient(means2d), radii,
        jax.lax.stop_gradient(depths), grid.n_tiles_x, grid.n_tiles_y,
        tile_w, tile_h, cap)

    if backend in ("pallas", "pallas_interpret"):
        from horizongs_tpu.ops.raster_pallas import _raster2d_core
        acc, aux = _raster2d_core(fields, inst, grid.n_tiles_x,
                                  grid.n_tiles_y,
                                  backend == "pallas_interpret")
        color_t = jnp.swapaxes(acc[:, 12:15, :], 1, 2)
        normal_t = jnp.swapaxes(acc[:, 15:18, :], 1, 2)
        alpha_t = jnp.swapaxes(acc[:, 18:19, :], 1, 2)
        logT_t = jnp.swapaxes(aux[:, 0:1, :], 1, 2)
        depth_t = jnp.swapaxes(aux[:, 1:2, :], 1, 2)
        dist_t = jnp.swapaxes(aux[:, 2:3, :], 1, 2)
        med_t = jnp.swapaxes(aux[:, 3:4, :], 1, 2)
        T_final = jnp.exp(logT_t)
        render = _tiles_to_image(
            color_t + T_final * background[None, None, :],
            grid, height, width)
        alphas = _tiles_to_image(alpha_t, grid, height, width)
        normals = _tiles_to_image(normal_t, grid, height, width)
        distort = _tiles_to_image(dist_t, grid, height, width)
        median = _tiles_to_image(med_t, grid, height, width)
        if render_mode == "RGB+D":
            depth_img = _tiles_to_image(depth_t, grid, height, width)
            render = jnp.concatenate([render, depth_img], axis=-1)
        elif render_mode == "RGB+ED":
            ed = depth_t / jnp.clip(alpha_t, 1e-10, None)
            depth_img = _tiles_to_image(ed, grid, height, width)
            render = jnp.concatenate([render, depth_img], axis=-1)
    else:
        transforms = fields[:, 0:9].reshape(-1, 3, 3)
        opac = fields[:, 11]
        rgb = fields[:, 12:15]
        normals_g = fields[:, 15:18]
        render, alphas, normals, distort, median = composite_scan_2dgs(
            means2d, transforms, opac, rgb, normals_g, inst, grid,
            width, height, background, render_mode, chunk, tile_w, tile_h)

    info = {"n_instances": inst.n_instances, "n_dropped": inst.n_dropped}
    return render, alphas, normals, distort, median, info
