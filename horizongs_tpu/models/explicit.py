"""Explicit (baked, MLP-free) gaussians: the chunk-merge representation.

`bake_explicit` reproduces `save_explicit` (`base_model.py:566-654`,
`lod_model.py:681-780`): decode every anchor's offsets through the MLPs
*without* view direction (hence the reference's requirement
color_attr == SH*, view_dim == 0, `scene/__init__.py:159-164`), keep
children with neural opacity > 0, and store plain 3DGS attributes:
linear scales, raw (tanh) opacity, SH color coefficients.

`ExplicitState` is the render-side table (`load_explicit` +
`generate_explicit_gaussians`, `basic_model.py:373-383`): attributes are
passed to the rasterizer as stored (no activations), matching the
reference's explicit render path (`gaussian_renderer/render.py:22-25`).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.core.transforms import normalize_quat
from horizongs_tpu.models.anchors import AnchorState, map_to_int_level
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams, mlp_apply


class ExplicitState(NamedTuple):
    xyz: jnp.ndarray          # (M, 3)
    features: jnp.ndarray     # (M, K, 3) SH coefficients (DC first)
    opacity: jnp.ndarray      # (M,) in (0, 1), stored raw
    scaling: jnp.ndarray      # (M, 3) linear scales
    rotation: jnp.ndarray     # (M, 4) wxyz
    level: jnp.ndarray        # (M,) int32
    extra_level: jnp.ndarray  # (M,)
    n: jnp.ndarray            # () int32 live rows

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.xyz.shape[0]) < self.n


def explicit_gs_mask(cfg: ModelConfig, state: ExplicitState,
                     cam_center: jnp.ndarray,
                     resolution_scale: float = 1.0) -> jnp.ndarray:
    """`set_gs_mask` (`lod_model.py:292-296`): LOD gate on baked gaussians."""
    if not cfg.is_lod:
        return state.valid_mask()
    dist = jnp.clip(jnp.linalg.norm(state.xyz - cam_center[None], axis=-1)
                    * resolution_scale, 1e-8, None)
    pred = (jnp.log2(cfg.standard_dist / dist) / math.log2(cfg.fork)
            + state.extra_level)
    int_level, _, _ = map_to_int_level(cfg, pred, cfg.street_levels - 1,
                                       state.level)
    return (state.level <= int_level) & state.valid_mask()


def bake_explicit(cfg: ModelConfig, mlps: MlpParams, state: AnchorState
                  ) -> dict:
    """Decode anchors to explicit gaussians (host-side, returns numpy).

    Only valid anchors' children with neural opacity > 0 are kept —
    here we *do* compact (host-side numpy, not jitted)."""
    assert cfg.color_attr != "RGB", (
        "explicit bake requires SH colors (reference scene/__init__.py:159)")
    assert cfg.view_dim == 0, (
        "explicit bake requires view_dim == 0 (reference contract)")
    n = int(state.n)
    k = cfg.n_offsets
    feat = state.feat[:n]
    anchor = np.asarray(state.anchor[:n])
    grid_scaling = np.exp(np.asarray(state.scaling_log[:n]))

    neural_op = np.asarray(jnp.tanh(mlp_apply(mlps.opacity, feat)))  # (n, k)
    if cfg.appearance_dim > 0 and mlps.appearance is not None:
        app = np.asarray(mlps.appearance[0])
        inp = jnp.concatenate([feat, jnp.broadcast_to(app, (n, app.shape[0]))],
                              axis=-1)
        color = np.asarray(mlp_apply(mlps.color, inp))
    else:
        color = np.asarray(mlp_apply(mlps.color, feat))
    color = color.reshape(n * k, cfg.color_dim)
    scale_rot = np.asarray(mlp_apply(mlps.cov, feat)).reshape(n * k, 7)
    offsets = np.asarray(state.offset[:n]).reshape(n * k, 3)

    mask = neural_op.reshape(-1) > 0.0
    sig = 1.0 / (1.0 + np.exp(-scale_rot[:, 0:3]))
    scaling = np.repeat(grid_scaling[:, 3:6], k, axis=0) * sig
    rot = scale_rot[:, 3:7]
    rot = rot / np.clip(np.linalg.norm(rot, axis=-1, keepdims=True), 1e-12, None)
    xyz = (np.repeat(anchor, k, axis=0)
           + offsets * np.repeat(grid_scaling[:, 0:3], k, axis=0))
    levels = np.repeat(np.asarray(state.level[:n]), k)
    extra = np.repeat(np.asarray(state.extra_level[:n]), k)

    K_sh = cfg.color_dim // 3
    color = color.reshape(n * k, K_sh, 3)
    return {
        "xyz": xyz[mask].astype(np.float32),
        "features": color[mask].astype(np.float32),
        "opacity": neural_op.reshape(-1)[mask].astype(np.float32),
        "scaling": scaling[mask].astype(np.float32),
        "rotation": rot[mask].astype(np.float32),
        "level": levels[mask].astype(np.int32),
        "extra_level": extra[mask].astype(np.float32),
    }


def explicit_state_from_arrays(arrays: dict, capacity: Optional[int] = None
                               ) -> ExplicitState:
    n = arrays["xyz"].shape[0]
    C = capacity or max(128, -(-n // 128) * 128)

    def pad(a):
        out = np.zeros((C,) + a.shape[1:], dtype=a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    rot = np.zeros((C, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    rot[:n] = arrays["rotation"]
    return ExplicitState(
        xyz=pad(arrays["xyz"]), features=pad(arrays["features"]),
        opacity=pad(arrays["opacity"]), scaling=pad(arrays["scaling"]),
        rotation=jnp.asarray(rot),
        level=pad(arrays.get("level", np.zeros(n, np.int32))),
        extra_level=pad(arrays.get("extra_level", np.zeros(n, np.float32))),
        n=jnp.asarray(n, dtype=jnp.int32))


def render_explicit(cam, cfg: ModelConfig, state: ExplicitState,
                    background: jnp.ndarray, rasterizer: str = "tiled",
                    active_sh_degree: Optional[int] = None) -> dict:
    """Explicit render path (`render.py:22-25` + `rasterization` call)."""
    mask = explicit_gs_mask(cfg, state, cam.cam_center, cam.resolution_scale)
    opac = jnp.where(mask, state.opacity, 0.0)
    sh_degree = cfg.max_sh_degree if active_sh_degree is None else active_sh_degree

    kwargs = dict(sh_degree=sh_degree, render_mode=cfg.render_mode)
    if rasterizer == "dense":
        from horizongs_tpu.ops.reference import render_dense_3dgs
        out, alphas, info = render_dense_3dgs(
            state.xyz, state.rotation, state.scaling, opac, state.features,
            cam.viewmat, cam.K, cam.width, cam.height, background, **kwargs)
    elif rasterizer in ("pallas", "pallas_interpret"):
        from horizongs_tpu.ops.raster_pallas import rasterize_pallas_3dgs
        out, alphas, info = rasterize_pallas_3dgs(
            state.xyz, state.rotation, state.scaling, opac, state.features,
            cam.viewmat, cam.K, cam.width, cam.height, background,
            interpret=(rasterizer == "pallas_interpret"), **kwargs)
    else:
        from horizongs_tpu.ops.raster import rasterize_tiled_3dgs
        out, alphas, info = rasterize_tiled_3dgs(
            state.xyz, state.rotation, state.scaling, opac, state.features,
            cam.viewmat, cam.K, cam.width, cam.height, background, **kwargs)

    if out.shape[-1] == 4:
        image, depth = out[..., :3], out[..., 3:4]
    else:
        image, depth = out, None
    return {"render": image, "render_depth": depth, "render_alphas": alphas,
            "radii": info["radii"], "visibility_filter": info["radii"] > 0,
            "gs_mask": mask}
