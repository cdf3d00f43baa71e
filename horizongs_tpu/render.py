"""Render layer: camera + model -> output dict.

TPU-native equivalent of the reference's `gaussian_renderer/render.py`:
LOD anchor mask -> optional frustum prefilter -> neural-gaussian decode ->
rasterize (3DGS or 2DGS; dense oracle or tiled Pallas backend).

Outputs mirror the reference's return dict (`render.py:98-116`):
render (H,W,3), render_depth, render_alphas, scaling, opacity,
selection_mask, visible_mask, radii, visibility_filter (+ 2DGS extras).
Images are HWC float32 (the TPU-friendly layout; CLIs convert on save).

The `means2d_probe` argument is the autodiff handle replacing torch's
`info["means2d"].retain_grad()` (`render.py:91-93`): pass zeros of shape
(C*k, 2), take `jax.grad` w.r.t. it, and you get exactly the screen-space
gradients the densification statistics need.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.core.cameras import Camera
from horizongs_tpu.models.anchors import (
    AnchorState,
    anchor_lod_mask,
    decode_neural_gaussians,
)
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams
from horizongs_tpu.ops.projection import project_3dgs, project_2dgs
from horizongs_tpu.ops.reference import render_dense_3dgs, render_dense_2dgs


def prefilter_anchors(cfg: ModelConfig, state: AnchorState, cam: Camera,
                      anchor_mask: jnp.ndarray) -> jnp.ndarray:
    """Frustum prefilter: project anchors as gaussians with their offset
    scales and keep radii > 0 (`prefilter_voxel`, `render.py:120-197`)."""
    scales = jnp.exp(state.scaling_log)[:, :3]
    if cfg.gs_attr == "2D":
        proj = project_2dgs(state.anchor, state.rotation, scales,
                            cam.viewmat, cam.K, cam.width, cam.height)
    else:
        proj = project_3dgs(state.anchor, state.rotation, scales,
                            cam.viewmat, cam.K, cam.width, cam.height,
                            eps2d=0.3)
    return anchor_mask & (proj.radii > 0)


def render(cam: Camera,
           cfg: ModelConfig,
           mlps: MlpParams,
           state: AnchorState,
           background: jnp.ndarray,
           add_prefilter: bool = True,
           active_sh_degree: Optional[int] = None,
           means2d_probe: Optional[jnp.ndarray] = None,
           rasterizer: str = "dense",
           instance_cap: Optional[int] = None,
           scaling_modifier: float = 1.0) -> dict:
    """`instance_cap`: static (gaussian, tile) instance capacity for the
    tiled/pallas backends (default: the wrappers' worst-case 4N). Use
    `ops.raster_pallas.count_instances_3dgs` + `suggest_instance_cap` to
    calibrate per scene/resolution — the binning/routing stages scale
    with it. Overflow is counted, never silent (`info["n_dropped"]`,
    surfaced as `pkg["n_dropped"]`).

    `scaling_modifier`: multiplies decoded gaussian scales before
    rasterization (the viewer's splat-size slider; reference threads it
    as `scaling_modifier` into gsplat, `render.py:38,98`)."""
    anchor_mask, smooth = anchor_lod_mask(cfg, state, cam.cam_center,
                                          cam.resolution_scale)
    if add_prefilter:
        anchor_mask = prefilter_anchors(cfg, state, cam, anchor_mask)

    dec = decode_neural_gaussians(cfg, mlps, state, cam.cam_center,
                                  anchor_mask, smooth,
                                  appearance_id=jnp.asarray(cam.uid))
    if scaling_modifier != 1.0:
        dec = dec._replace(scales=dec.scales * scaling_modifier)

    if cfg.color_attr == "RGB":
        colors = dec.colors
        sh_degree = None
    else:
        K_sh = cfg.color_dim // 3
        colors = dec.colors.reshape(-1, K_sh, 3)
        sh_degree = cfg.max_sh_degree if active_sh_degree is None else active_sh_degree

    probe = None
    if means2d_probe is not None:
        if cfg.gs_attr == "2D":
            proj = project_2dgs(dec.means, dec.quats, dec.scales,
                                cam.viewmat, cam.K, cam.width, cam.height)
        else:
            proj = project_3dgs(dec.means, dec.quats, dec.scales,
                                cam.viewmat, cam.K, cam.width, cam.height)
        probe = proj.means2d + means2d_probe

    if rasterizer == "dense":
        if cfg.gs_attr == "3D":
            out, alphas, info = render_dense_3dgs(
                dec.means, dec.quats, dec.scales, dec.opacities, colors,
                cam.viewmat, cam.K, cam.width, cam.height, background,
                sh_degree=sh_degree, render_mode=cfg.render_mode,
                means2d_override=probe)
            extras = {}
        elif cfg.gs_attr == "2D":
            (out, alphas, normals, normals_fd, distort, median, info) = \
                render_dense_2dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities, colors,
                    cam.viewmat, cam.K, cam.width, cam.height, background,
                    sh_degree=sh_degree, render_mode=cfg.render_mode,
                    means2d_override=probe)
            extras = {"render_normals": normals,
                      "render_normals_from_depth": normals_fd,
                      "render_distort": distort,
                      "render_median_depth": median}
        else:
            raise ValueError(f"Unknown gs_attr: {cfg.gs_attr}")
    elif rasterizer == "tiled":
        from horizongs_tpu.ops.raster import render_tiled
        cap_kw = {} if instance_cap is None else {"cap": instance_cap}
        out, alphas, info, extras = render_tiled(
            cfg.gs_attr, dec.means, dec.quats, dec.scales, dec.opacities,
            colors, cam.viewmat, cam.K, cam.width, cam.height, background,
            sh_degree=sh_degree, render_mode=cfg.render_mode,
            means2d_override=probe, **cap_kw)
    elif rasterizer in ("pallas", "pallas_interpret"):
        interp = rasterizer == "pallas_interpret"
        if cfg.gs_attr == "3D":
            from horizongs_tpu.ops.raster_pallas import rasterize_pallas_3dgs
            out, alphas, info = rasterize_pallas_3dgs(
                dec.means, dec.quats, dec.scales, dec.opacities, colors,
                cam.viewmat, cam.K, cam.width, cam.height, background,
                sh_degree=sh_degree, render_mode=cfg.render_mode,
                means2d_override=probe, cap=instance_cap, interpret=interp)
            extras = {}
        else:
            from horizongs_tpu.ops.raster_pallas import rasterize_pallas_2dgs
            (out, alphas, normals, normals_fd, distort, median, info) = \
                rasterize_pallas_2dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities, colors,
                    cam.viewmat, cam.K, cam.width, cam.height, background,
                    sh_degree=sh_degree, render_mode=cfg.render_mode,
                    means2d_override=probe, cap=instance_cap,
                    interpret=interp)
            extras = {"render_normals": normals,
                      "render_normals_from_depth": normals_fd,
                      "render_distort": distort,
                      "render_median_depth": median}
    else:
        raise ValueError(f"Unknown rasterizer: {rasterizer}")

    if out.shape[-1] == 4:
        image, depth = out[..., :3], out[..., 3:4]
    else:
        image, depth = out, None

    pkg = {
        "render": image,                       # (H, W, 3)
        "render_depth": depth,                 # (H, W, 1) or None
        "render_alphas": alphas,               # (H, W, 1)
        "scaling": dec.scales,                 # (C*k, 3)
        "opacity": dec.opacities,              # (C*k,)
        "selection_mask": dec.selection_mask,  # (C*k,)
        "visible_mask": dec.anchor_mask,       # (C,)
        "radii": info["radii"],                # (C*k,)
        "visibility_filter": info["radii"] > 0,
        "means2d": info["means2d"],
        # tiled/pallas backends: instances beyond the static capacity
        # (0 for the dense oracle, which has no capacity)
        "n_dropped": info.get("n_dropped", jnp.zeros((), jnp.int32)),
        "n_instances": info.get("n_instances", jnp.zeros((), jnp.int32)),
    }
    pkg.update(extras)
    return pkg


_COUNTERS: dict = {}


def count_render_instances(cam: Camera,
                           cfg: ModelConfig,
                           mlps: MlpParams,
                           state: AnchorState,
                           add_prefilter: bool = True,
                           backend: str = "pallas") -> jnp.ndarray:
    """Tile-instance count the pallas/tiled backends will enumerate for
    this view with the current model state: LOD mask -> decode ->
    projection + lossless cull + AABB spans. Take the max over a few
    sample cameras to calibrate `render(instance_cap=...)` via
    `ops.raster_pallas.suggest_instance_cap` — the binning, instance
    assembly, and gradient-routing stages all scale with the capacity.
    Jits internally per (cfg, resolution); cameras carry non-array
    fields, so only their array leaves cross the jit boundary."""
    import functools

    key = (cfg, cam.width, cam.height, add_prefilter, backend)
    if key not in _COUNTERS:
        from horizongs_tpu.ops.raster_fields import backend_tile_shape
        from horizongs_tpu.ops.raster_pallas import (
            count_instances_2dgs, count_instances_3dgs)
        width, height = cam.width, cam.height
        tile_w, tile_h = backend_tile_shape(cfg.gs_attr, backend)

        @functools.partial(jax.jit, static_argnames=("uid",))
        def counter(viewmat, K, cam_center, res_scale, uid, mlps, state):
            camera = Camera(viewmat=viewmat, K=K, width=width,
                            height=height, cam_center=cam_center,
                            uid=uid, resolution_scale=res_scale)
            anchor_mask, smooth = anchor_lod_mask(cfg, state, cam_center,
                                                  res_scale)
            if add_prefilter:
                anchor_mask = prefilter_anchors(cfg, state, camera,
                                                anchor_mask)
            dec = decode_neural_gaussians(cfg, mlps, state, cam_center,
                                          anchor_mask, smooth,
                                          appearance_id=jnp.asarray(uid))
            count = (count_instances_2dgs if cfg.gs_attr == "2D"
                     else count_instances_3dgs)
            return count(dec.means, dec.quats, dec.scales, dec.opacities,
                         viewmat, K, width, height,
                         tile_w=tile_w, tile_h=tile_h)

        _COUNTERS[key] = counter
    return _COUNTERS[key](cam.viewmat, cam.K, cam.cam_center,
                          cam.resolution_scale, int(cam.uid), mlps, state)
