"""Anchor tables and Scaffold-GS neural-gaussian decoding, TPU-style.

The reference stores anchors as resizable torch parameters and gathers
visible rows with boolean masks (`scene/basic_model.py:297-371`). On TPU
we keep a **capacity-padded static table** (`capacity` rows, `n` alive)
and replace every gather with masking: gaussians that would have been
filtered out simply get opacity 0, which contributes exactly nothing to
the composite. This keeps all shapes static across densification (only a
capacity growth triggers a recompile) and keeps the decode as three big
MXU matmuls over the whole table.

Numerics mirror `generate_neural_gaussians`:
  * view direction = normalize(anchor - cam_center); optional concat
  * neural opacity = tanh(MLP(feat[, dir])) * smooth_complement, kept
    only where > 0
  * scaling = exp(scaling_log)[3:6] * sigmoid(cov_mlp[..., :3])
  * rotation = normalize(cov_mlp[..., 3:7])
  * xyz = anchor + offset * exp(scaling_log)[0:3]
and `set_anchor_mask` / `map_to_int_level` (`lod_model.py:286-296`,
`basic_model.py:192-210`) for the LOD distance rule.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.core.transforms import normalize_quat
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams, mlp_apply


class AnchorState(NamedTuple):
    """Capacity-padded anchor table. Rows >= n are dead (zero) padding."""
    anchor: jnp.ndarray       # (C, 3) positions
    offset: jnp.ndarray       # (C, k, 3) learnable child offsets
    feat: jnp.ndarray         # (C, F) anchor features
    scaling_log: jnp.ndarray  # (C, 6) log scales: [0:3] offset, [3:6] gaussian
    rotation: jnp.ndarray     # (C, 4) wxyz (not optimized, like reference)
    level: jnp.ndarray        # (C,) int32 LOD level (0 for flat model)
    extra_level: jnp.ndarray  # (C,) float32 LOD promotion
    n: jnp.ndarray            # () int32 live row count

    @property
    def capacity(self) -> int:
        return self.anchor.shape[0]

    @property
    def n_offsets(self) -> int:
        return self.offset.shape[1]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n


class DecodedGaussians(NamedTuple):
    """Per-offset gaussians, flattened to (C*k, ...). Masked rows have
    opacity exactly 0 (the static-shape analog of the reference's
    boolean-mask selection; `selection_mask` preserves the mask for
    densification statistics, the `render.py:104` contract)."""
    means: jnp.ndarray        # (C*k, 3)
    quats: jnp.ndarray        # (C*k, 4)
    scales: jnp.ndarray       # (C*k, 3)
    opacities: jnp.ndarray    # (C*k,)
    colors: jnp.ndarray       # (C*k, color_dim)
    selection_mask: jnp.ndarray  # (C*k,) bool: opacity>0 & anchor visible
    anchor_mask: jnp.ndarray     # (C,) bool: anchor visible (LOD+prefilter)


def map_to_int_level(cfg: ModelConfig, pred_level: jnp.ndarray,
                     cur_level: int, level: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`BasicModel.map_to_int_level` (`basic_model.py:192-210`).

    Returns (int_level, prog_ratio, transition_mask); the latter two are
    only meaningful for dist2level == "progressive".
    """
    if cfg.dist2level == "floor":
        int_level = jnp.clip(jnp.floor(pred_level).astype(jnp.int32), 0, cur_level)
        prog = jnp.ones_like(pred_level)
        trans = jnp.zeros(pred_level.shape, dtype=bool)
    elif cfg.dist2level == "round":
        int_level = jnp.clip(jnp.round(pred_level).astype(jnp.int32), 0, cur_level)
        prog = jnp.ones_like(pred_level)
        trans = jnp.zeros(pred_level.shape, dtype=bool)
    elif cfg.dist2level == "ceil":
        int_level = jnp.clip(jnp.ceil(pred_level).astype(jnp.int32), 0, cur_level)
        prog = jnp.ones_like(pred_level)
        trans = jnp.zeros(pred_level.shape, dtype=bool)
    elif cfg.dist2level == "progressive":
        p = jnp.clip(pred_level + 1.0, 0.9999, cur_level + 0.9999)
        int_level = jnp.floor(p).astype(jnp.int32)
        prog = p - jnp.floor(p)
        trans = level == int_level
    else:
        raise ValueError(f"Unknown dist2level: {cfg.dist2level}")
    return int_level, prog, trans


def anchor_lod_mask(cfg: ModelConfig, state: AnchorState,
                    cam_center: jnp.ndarray, resolution_scale: float = 1.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`set_anchor_mask` (`lod_model.py:286-290`): distance -> level gate.

    Returns (mask (C,), smooth_complement (C,)) where the complement is
    the progressive-LOD opacity fade (`lod_model.py:215-222`), 1.0 in
    non-progressive modes.
    """
    if not cfg.is_lod:
        ones = jnp.ones(state.capacity, dtype=bool)
        return ones & state.valid_mask(), jnp.ones(state.capacity)
    dist = jnp.linalg.norm(state.anchor - cam_center[None, :], axis=-1)
    dist = jnp.clip(dist * resolution_scale, 1e-8, None)
    pred_level = (jnp.log2(cfg.standard_dist / dist) / math.log2(cfg.fork)
                  + state.extra_level)
    int_level, prog, trans = map_to_int_level(
        cfg, pred_level, cfg.street_levels - 1, state.level)
    mask = (state.level <= int_level) & state.valid_mask()
    complement = jnp.where(trans, prog, 1.0)
    return mask, complement


def decode_neural_gaussians(
    cfg: ModelConfig,
    mlps: MlpParams,
    state: AnchorState,
    cam_center: jnp.ndarray,
    anchor_mask: jnp.ndarray,             # (C,) visibility (LOD ∩ prefilter)
    smooth: Optional[jnp.ndarray] = None,  # (C,) progressive-LOD fade
    appearance_id: Optional[jnp.ndarray] = None,  # () int32 camera uid
) -> DecodedGaussians:
    C, k = state.capacity, state.n_offsets
    feat = state.feat                                         # (C, F)
    ob_view = state.anchor - cam_center[None, :]
    ob_dist = jnp.clip(jnp.linalg.norm(ob_view, axis=-1, keepdims=True), 1e-8, None)
    ob_view = ob_view / ob_dist

    if cfg.view_dim > 0:
        cat = jnp.concatenate([feat, ob_view], axis=-1)
    else:
        cat = feat

    neural_opacity = mlp_apply(mlps.opacity, cat, final_tanh=True)  # (C, k)
    if smooth is not None:
        neural_opacity = neural_opacity * smooth[:, None]

    if cfg.appearance_dim > 0:
        assert mlps.appearance is not None
        code = appearance_id if cfg.ape_code < 0 else jnp.asarray(cfg.ape_code)
        app = mlps.appearance[code]                           # (A,)
        app = jnp.broadcast_to(app[None, :], (C, cfg.appearance_dim))
        color = mlp_apply(mlps.color, jnp.concatenate([cat, app], axis=-1))
    else:
        color = mlp_apply(mlps.color, cat)
    color = color.reshape(C, k, cfg.color_dim)

    scale_rot = mlp_apply(mlps.cov, cat).reshape(C, k, 7)

    grid_scaling = jnp.exp(state.scaling_log)                 # (C, 6)
    scales = grid_scaling[:, None, 3:6] * jax.nn.sigmoid(scale_rot[..., 0:3])
    quats = normalize_quat(scale_rot[..., 3:7])
    means = state.anchor[:, None, :] + state.offset * grid_scaling[:, None, 0:3]

    sel = (neural_opacity > 0.0) & anchor_mask[:, None]       # (C, k)
    opacity = jnp.where(sel, neural_opacity, 0.0)

    return DecodedGaussians(
        means=means.reshape(C * k, 3),
        quats=quats.reshape(C * k, 4),
        scales=scales.reshape(C * k, 3),
        opacities=opacity.reshape(C * k),
        colors=color.reshape(C * k, cfg.color_dim),
        selection_mask=sel.reshape(C * k),
        anchor_mask=anchor_mask,
    )


# ---------------------------------------------------------------------------
# Host-side initialization (numpy): voxelization / octree sampling / KNN.
# Mirrors `create_from_pcd` for both models (`base_model.py:201-234`,
# `lod_model.py:251-284`). These run once at scene build, outside jit.
# ---------------------------------------------------------------------------

def round_capacity(n: int, block: int = 4096) -> int:
    return max(block, ((n + block - 1) // block) * block)


def voxelize(points: np.ndarray, voxel_size: float, padding: float = 0.0) -> np.ndarray:
    """`voxelize_sample` (`base_model.py:196-199`): snap-to-grid dedup."""
    q = np.unique(np.round(points / voxel_size), axis=0) * voxel_size
    return q + padding * voxel_size


def octree_sample(points: np.ndarray, cfg: ModelConfig
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """`octree_sample` (`lod_model.py:224-234`): multi-level voxel grids.

    Level l uses voxel size  voxel_size / fork^(l + 1 - aerial_levels).
    """
    pts_all, lv_all = [], []
    for lv in range(cfg.aerial_levels):
        size = cfg.voxel_size / (float(cfg.fork) ** (lv + 1 - cfg.aerial_levels))
        p = np.unique(np.round(points / size), axis=0) * size
        p = p + cfg.padding * size
        pts_all.append(p)
        lv_all.append(np.full(p.shape[0], lv, dtype=np.int32))
    return (np.concatenate(pts_all, axis=0).astype(np.float32),
            np.concatenate(lv_all, axis=0))


def knn_mean_sq_dist(points: np.ndarray, k: int = 4) -> np.ndarray:
    """Mean squared distance to the (k-1) nearest neighbors (excl. self),
    the scale init of `create_from_pcd` (`base_model.py:219-220`)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(points)
    d, _ = tree.query(points, k=k)
    return (d[:, 1:] ** 2).mean(axis=1)


def init_anchor_state_from_points(
    cfg: ModelConfig,
    points: np.ndarray,
    capacity: Optional[int] = None,
    weed_fn=None,
) -> AnchorState:
    """Build the initial padded anchor table from a raw point cloud.

    Flat model: single voxel grid (median-KNN voxel size if voxel_size<=0,
    `base_model.py:204-212`). LOD model: octree sample + optional weed-out
    (`lod_model.py:251-284`).
    """
    points = np.asarray(points, dtype=np.float32)
    voxel_size = cfg.voxel_size
    if cfg.is_lod:
        pts, levels = octree_sample(points, cfg)
    else:
        if voxel_size <= 0:
            d2 = knn_mean_sq_dist(points, 4)
            voxel_size = float(np.median(d2))
        pts = voxelize(points, voxel_size, cfg.padding).astype(np.float32)
        levels = np.zeros(pts.shape[0], dtype=np.int32)

    if weed_fn is not None:
        keep = weed_fn(pts, levels)
        pts, levels = pts[keep], levels[keep]

    n = pts.shape[0]
    C = capacity or round_capacity(n)
    k, F = cfg.n_offsets, cfg.feat_dim

    d2 = knn_mean_sq_dist(pts, 4) if n > 4 else np.full(n, voxel_size ** 2)
    scales = np.log(np.sqrt(np.clip(d2, 1e-12, None)))[:, None].repeat(6, axis=1)

    def pad(a, fill=0.0):
        out = np.full((C,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return out

    rot = np.zeros((n, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    rot_pad = np.zeros((C, 4), dtype=np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rot

    return AnchorState(
        anchor=jnp.asarray(pad(pts)),
        offset=jnp.zeros((C, k, 3), dtype=jnp.float32),
        feat=jnp.zeros((C, F), dtype=jnp.float32),
        scaling_log=jnp.asarray(pad(scales.astype(np.float32))),
        rotation=jnp.asarray(rot_pad),
        level=jnp.asarray(pad(levels)),
        extra_level=jnp.zeros((C,), dtype=jnp.float32),
        n=jnp.asarray(n, dtype=jnp.int32),
    )


def weed_out_mask(cfg: ModelConfig, positions: np.ndarray, levels: np.ndarray,
                  cam_infos: np.ndarray, weed_ratio: float) -> np.ndarray:
    """`weed_out` (`lod_model.py:236-249`): keep anchors visible (by the
    LOD distance rule) from more than `weed_ratio` of training cameras.

    cam_infos: (M, 4) rows of [cam_center_xyz, resolution_scale].
    Host-side numpy (runs at scene build / densify).
    """
    if weed_ratio <= 0 or len(cam_infos) == 0:
        return np.ones(positions.shape[0], dtype=bool)
    N = positions.shape[0]
    count = np.zeros(N, dtype=np.int64)
    logfork = math.log2(cfg.fork)
    cam_infos = np.asarray(cam_infos, dtype=np.float32)
    # broadcast over camera batches (one (B, N) distance matrix each) —
    # a per-camera Python loop costs M passes of interpreter overhead at
    # every fine-stage grow; batch size bounds the matrix at ~64MB
    batch = max(1, int(16_000_000 // max(N, 1)))
    for s in range(0, len(cam_infos), batch):
        centers = cam_infos[s:s + batch, :3]                 # (B, 3)
        scales = cam_infos[s:s + batch, 3:4]                 # (B, 1)
        d = positions[None, :, :] - centers[:, None, :]      # (B, N, 3)
        dist = np.clip(np.sqrt(np.einsum("bnd,bnd->bn", d, d)) * scales,
                       1e-8, None)
        pred = np.log2(cfg.standard_dist / dist) / logfork   # (B, N)
        if cfg.dist2level == "floor":
            int_level = np.clip(np.floor(pred), 0, cfg.street_levels - 1)
        elif cfg.dist2level == "round":
            int_level = np.clip(np.round(pred), 0, cfg.street_levels - 1)
        elif cfg.dist2level == "ceil":
            int_level = np.clip(np.ceil(pred), 0, cfg.street_levels - 1)
        else:  # progressive
            p = np.clip(pred + 1.0, 0.9999, cfg.street_levels - 1 + 0.9999)
            int_level = np.floor(p)
        count += (levels[None, :] <= int_level).sum(axis=0)
    frac = count / float(len(cam_infos))
    return frac > weed_ratio
