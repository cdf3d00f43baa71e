"""Tiled differentiable rasterizer: the gsplat-kernel replacement, TPU-first.

Pipeline (all static shapes, one fused XLA program):

  project -> tile-instance expansion + global (tile, depth) sort
  (`ops/binning.py`) -> chunked compositing scan.

The compositing scan processes the sorted instance list in chunks of B
rows. Each row is (gaussian, tile); its alpha footprint is evaluated
against the tile's P = tile_h*tile_w pixels, vectorized as a (B, P)
block on the VPU. Transmittance is handled in log space with *segmented*
prefix sums inside the chunk (rows of one tile are contiguous and
depth-sorted — the binning invariant), and per-(tile, pixel) carries
(log T, accumulated color/depth/alpha) compose associatively across
chunks. Work is proportional to the true instance count — no per-tile
capacity padding.

The backward pass is JAX autodiff through the (rematerialized) scan:
each chunk is recomputed in the backward sweep, so peak memory is
O(carry + one chunk), the same recompute-transmittance strategy as
gsplat's hand-written backward kernel.

Compositing numerics match the dense oracle (`ops/reference.py`) and
thus gsplat: alpha cutoff 1/255, max alpha 0.999, T cutoff 1e-4,
RGB / RGB+D / RGB+ED modes, plus 2DGS normals / distortion / median
depth via ray-splat intersection.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.ops.binning import build_tile_instances, cull_radius
from horizongs_tpu.ops.projection import project_2dgs, project_3dgs
from horizongs_tpu.ops.reference import (
    ALPHA_CUTOFF,
    FILTER_INV_SQUARE_2DGS,
    MAX_ALPHA,
    TRANSMITTANCE_EPS,
    _sh_colors,
    depth_to_normals,
)

LOG_T_EPS = math.log(TRANSMITTANCE_EPS)


def _seg_first_idx(tile_ids: jnp.ndarray) -> jnp.ndarray:
    """Index of the first row of each row's tile segment (tile_ids sorted).

    cummax of segment-start positions — searchsorted would serialize on TPU.
    """
    idx = jnp.arange(tile_ids.shape[0], dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, dtype=bool),
                                tile_ids[1:] != tile_ids[:-1]])
    return jax.lax.cummax(jnp.where(is_start, idx, 0))


def _segmented_exclusive(x: jnp.ndarray, first_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-segment exclusive cumsum along axis 0 of (B, P)."""
    cum = jnp.cumsum(x, axis=0) - x
    return cum - cum[first_idx]


class _TileGrid(NamedTuple):
    n_tiles_x: int
    n_tiles_y: int
    tile_w: int
    tile_h: int

    @property
    def n_tiles(self) -> int:
        return self.n_tiles_x * self.n_tiles_y

    @property
    def pixels(self) -> int:
        return self.tile_w * self.tile_h


def _local_pixel_coords(grid: _TileGrid):
    P = grid.pixels
    lx = (jnp.arange(P) % grid.tile_w).astype(jnp.float32) + 0.5
    ly = (jnp.arange(P) // grid.tile_w).astype(jnp.float32) + 0.5
    return lx, ly


def _tiles_to_image(tiles: jnp.ndarray, grid: _TileGrid,
                    height: int, width: int) -> jnp.ndarray:
    """(n_tiles, P, C) -> (H, W, C), cropping tile padding."""
    C = tiles.shape[-1]
    img = tiles.reshape(grid.n_tiles_y, grid.n_tiles_x,
                        grid.tile_h, grid.tile_w, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        grid.n_tiles_y * grid.tile_h, grid.n_tiles_x * grid.tile_w, C)
    return img[:height, :width]


def _make_grid(width: int, height: int, tile_w: int, tile_h: int) -> _TileGrid:
    return _TileGrid(n_tiles_x=-(-width // tile_w),
                     n_tiles_y=-(-height // tile_h),
                     tile_w=tile_w, tile_h=tile_h)


def _default_cap(n: int, chunk: int) -> int:
    cap = max(4 * n, chunk)
    return -(-cap // chunk) * chunk


# ---------------------------------------------------------------------------
# 3DGS
# ---------------------------------------------------------------------------

def composite_scan_3dgs(means2d, conics, opac, rgb, depths, inst,
                        grid: _TileGrid, width: int, height: int,
                        background, render_mode: str, chunk: int,
                        tile_w: int, tile_h: int):
    """Field-level 3DGS compositing: the chunked scan over a pre-built
    (tile, depth)-sorted instance list. Factored out of
    `rasterize_tiled_3dgs` so the tile-band-sharded step
    (`parallel/tile_exchange.py`) can composite exchanged splat records
    without re-projecting — the multi-device analog of gsplat's
    tile-local rasterize stage (`gaussian_renderer/render.py:40-54`
    semantics, distributed per SURVEY.md §2.3)."""
    C = rgb.shape[-1]
    cap = inst.gauss_id.shape[0]
    lx, ly = _local_pixel_coords(grid)
    n_tiles = grid.n_tiles
    P = grid.pixels

    def chunk_step(carry, chunk_idx):
        color_acc, alpha_acc, depth_acc, logT = carry
        sl = chunk_idx * chunk
        gid = jax.lax.dynamic_slice_in_dim(inst.gauss_id, sl, chunk)
        tid = jax.lax.dynamic_slice_in_dim(inst.tile_id, sl, chunk)
        vld = jax.lax.dynamic_slice_in_dim(inst.valid, sl, chunk)

        m2d = means2d[gid]                    # (B, 2)
        cn = conics[gid]                      # (B, 3)
        op = opac[gid]                        # (B,)
        col = rgb[gid]                        # (B, C)
        dep = depths[gid]                     # (B,)

        tid_safe = jnp.minimum(tid, n_tiles - 1)
        tox = (tid_safe % grid.n_tiles_x).astype(jnp.float32) * tile_w
        toy = (tid_safe // grid.n_tiles_x).astype(jnp.float32) * tile_h
        px = tox[:, None] + lx[None, :]       # (B, P)
        py = toy[:, None] + ly[None, :]
        dx = px - m2d[:, 0:1]
        dy = py - m2d[:, 1:2]
        sigma = (0.5 * cn[:, 0:1] * dx * dx + 0.5 * cn[:, 2:3] * dy * dy
                 + cn[:, 1:2] * dx * dy)
        alpha = jnp.minimum(op[:, None] * jnp.exp(-sigma), MAX_ALPHA)
        alpha = jnp.where((alpha >= ALPHA_CUTOFF) & vld[:, None], alpha, 0.0)

        lam = jnp.log1p(-alpha)               # (B, P)
        first = _seg_first_idx(tid)
        seg_excl = _segmented_exclusive(lam, first)
        logT_base = logT[tid_safe]            # (B, P)
        logT_tot = logT_base + seg_excl
        w = jnp.where(logT_tot > LOG_T_EPS, alpha * jnp.exp(logT_tot), 0.0)

        seg = partial(jax.ops.segment_sum, segment_ids=tid,
                      num_segments=n_tiles + 1)
        d_color = seg(w[:, :, None] * col[:, None, :])[:n_tiles]
        d_alpha = seg(w)[:n_tiles]
        d_depth = seg(w * dep[:, None])[:n_tiles]
        d_lam = seg(lam)[:n_tiles]

        return (color_acc + d_color, alpha_acc + d_alpha,
                depth_acc + d_depth, logT + d_lam), None

    carry0 = (jnp.zeros((n_tiles, P, C)), jnp.zeros((n_tiles, P)),
              jnp.zeros((n_tiles, P)), jnp.zeros((n_tiles, P)))
    carry, _ = jax.lax.scan(jax.checkpoint(chunk_step), carry0,
                            jnp.arange(cap // chunk))
    color_acc, alpha_acc, depth_acc, logT = carry

    T_final = jnp.exp(logT)
    out_tiles = color_acc + T_final[:, :, None] * background[None, None, :]
    render = _tiles_to_image(out_tiles, grid, height, width)
    alphas = _tiles_to_image(alpha_acc[:, :, None], grid, height, width)

    if render_mode == "RGB+D":
        depth_img = _tiles_to_image(depth_acc[:, :, None], grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    elif render_mode == "RGB+ED":
        ed = depth_acc / jnp.clip(alpha_acc, 1e-10, None)
        depth_img = _tiles_to_image(ed[:, :, None], grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    return render, alphas


def rasterize_tiled_3dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, colors: jnp.ndarray,
    viewmat: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
    background: jnp.ndarray, sh_degree: Optional[int] = None,
    render_mode: str = "RGB", eps2d: float = 0.3,
    means2d_override: Optional[jnp.ndarray] = None,
    tile_w: int = 16, tile_h: int = 16, chunk: int = 1024,
    cap: Optional[int] = None,
):
    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    N = means.shape[0]
    grid = _make_grid(width, height, tile_w, tile_h)
    cap = cap if cap is not None else _default_cap(N, chunk)
    cap = -(-cap // chunk) * chunk

    proj = project_3dgs(means, quats, scales, viewmat, K, width, height,
                        eps2d=eps2d)
    means2d = proj.means2d if means2d_override is None else means2d_override

    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    radii = cull_radius(proj.radii, opacities)
    inst = build_tile_instances(jax.lax.stop_gradient(means2d), radii,
                                proj.depths, grid.n_tiles_x, grid.n_tiles_y,
                                tile_w, tile_h, cap,
                                conics=jax.lax.stop_gradient(proj.conics),
                                opacities=jax.lax.stop_gradient(opacities))

    render, alphas = composite_scan_3dgs(
        means2d, proj.conics, opacities, rgb, proj.depths, inst, grid,
        width, height, background, render_mode, chunk, tile_w, tile_h)

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths,
            "conics": proj.conics, "n_instances": inst.n_instances,
            "n_dropped": inst.n_dropped}
    return render, alphas, info


# ---------------------------------------------------------------------------
# 2DGS
# ---------------------------------------------------------------------------

def composite_scan_2dgs(means2d, transforms, opac, rgb, normals, inst,
                        grid: _TileGrid, width: int, height: int,
                        background, render_mode: str, chunk: int,
                        tile_w: int, tile_h: int):
    """Field-level 2DGS compositing (see `composite_scan_3dgs`). Returns
    (render, alphas, normals_img, distort, median) — `normals_from_depth`
    is the caller's job: it is a spatial derivative of the median-depth
    image, so in band-sharded rendering it must be computed on the
    re-assembled full image, not per band."""
    C = rgb.shape[-1]
    cap = inst.gauss_id.shape[0]
    lx, ly = _local_pixel_coords(grid)
    n_tiles = grid.n_tiles
    P = grid.pixels

    def chunk_step(carry, chunk_idx):
        (color_acc, alpha_acc, depth_acc, logT, normal_acc,
         distA, distD, distL, med, has_med) = carry
        sl = chunk_idx * chunk
        gid = jax.lax.dynamic_slice_in_dim(inst.gauss_id, sl, chunk)
        tid = jax.lax.dynamic_slice_in_dim(inst.tile_id, sl, chunk)
        vld = jax.lax.dynamic_slice_in_dim(inst.valid, sl, chunk)

        M = transforms[gid]                   # (B, 3, 3)
        m2d = means2d[gid]
        op = opac[gid]
        col = rgb[gid]
        nrm = normals[gid]                    # (B, 3)

        tid_safe = jnp.minimum(tid, n_tiles - 1)
        tox = (tid_safe % grid.n_tiles_x).astype(jnp.float32) * tile_w
        toy = (tid_safe // grid.n_tiles_x).astype(jnp.float32) * tile_h
        px = tox[:, None] + lx[None, :]       # (B, P)
        py = toy[:, None] + ly[None, :]

        M1, M2, M3 = M[:, 0, :], M[:, 1, :], M[:, 2, :]
        # h_u = px*M3 - M1, h_v = py*M3 - M2; (u, v, 1) ~ cross(h_u, h_v)
        hu = px[:, :, None] * M3[:, None, :] - M1[:, None, :]  # (B, P, 3)
        hv = py[:, :, None] * M3[:, None, :] - M2[:, None, :]
        kx = hu[..., 1] * hv[..., 2] - hu[..., 2] * hv[..., 1]
        ky = hu[..., 2] * hv[..., 0] - hu[..., 0] * hv[..., 2]
        kz = hu[..., 0] * hv[..., 1] - hu[..., 1] * hv[..., 0]
        kz = jnp.where(jnp.abs(kz) > 1e-9, kz, 1e-9)
        u = kx / kz
        v = ky / kz
        rho3d = u * u + v * v
        dxc = px - m2d[:, 0:1]
        dyc = py - m2d[:, 1:2]
        rho2d = FILTER_INV_SQUARE_2DGS * (dxc * dxc + dyc * dyc)
        rho = jnp.minimum(rho3d, rho2d)
        z_inter = (M3[:, None, 0] * u + M3[:, None, 1] * v + M3[:, None, 2])

        alpha = jnp.minimum(op[:, None] * jnp.exp(-0.5 * rho), MAX_ALPHA)
        alpha = jnp.where((alpha >= ALPHA_CUTOFF) & vld[:, None]
                          & (z_inter > 0.01), alpha, 0.0)

        lam = jnp.log1p(-alpha)
        first = _seg_first_idx(tid)
        seg_excl = _segmented_exclusive(lam, first)
        logT_base = logT[tid_safe]
        logT_tot = logT_base + seg_excl
        gate = logT_tot > LOG_T_EPS
        w = jnp.where(gate, alpha * jnp.exp(logT_tot), 0.0)

        # distortion (running form): needs total prior sum of w and w*m
        m = z_inter
        w_excl = _segmented_exclusive(w, first)
        wm_excl = _segmented_exclusive(w * m, first)
        A_prev = distA[tid_safe] + w_excl
        D_prev = distD[tid_safe] + wm_excl
        L_row = 2.0 * w * (m * A_prev - D_prev)

        # median depth: the row where T crosses 0.5
        T_before = jnp.exp(logT_tot)
        T_after = jnp.exp(logT_tot + lam)
        crossing = (T_before >= 0.5) & (T_after < 0.5) & (w > 0)

        seg = partial(jax.ops.segment_sum, segment_ids=tid,
                      num_segments=n_tiles + 1)
        d_color = seg(w[:, :, None] * col[:, None, :])[:n_tiles]
        d_alpha = seg(w)[:n_tiles]
        d_depth = seg(w * m)[:n_tiles]
        d_lam = seg(lam)[:n_tiles]
        d_norm = seg(w[:, :, None] * nrm[:, None, :])[:n_tiles]
        d_L = seg(L_row)[:n_tiles]
        d_med = seg(jnp.where(crossing, jax.lax.stop_gradient(m), 0.0))[:n_tiles]
        d_has = seg(crossing.astype(jnp.float32))[:n_tiles]

        return ((color_acc + d_color, alpha_acc + d_alpha,
                 depth_acc + d_depth, logT + d_lam, normal_acc + d_norm,
                 distA + d_alpha, distD + d_depth, distL + d_L,
                 med + d_med, has_med + d_has), None)

    z0 = jnp.zeros((n_tiles, P))
    carry0 = (jnp.zeros((n_tiles, P, C)), z0, z0, z0,
              jnp.zeros((n_tiles, P, 3)), z0, z0, z0, z0, z0)
    carry, _ = jax.lax.scan(jax.checkpoint(chunk_step), carry0,
                            jnp.arange(cap // chunk))
    (color_acc, alpha_acc, depth_acc, logT, normal_acc,
     _, _, distL, med, has_med) = carry

    T_final = jnp.exp(logT)
    out_tiles = color_acc + T_final[:, :, None] * background[None, None, :]
    render = _tiles_to_image(out_tiles, grid, height, width)
    alphas = _tiles_to_image(alpha_acc[:, :, None], grid, height, width)
    normals_img = _tiles_to_image(normal_acc, grid, height, width)
    distort = _tiles_to_image(distL[:, :, None], grid, height, width)
    median = _tiles_to_image(med[:, :, None], grid, height, width)

    if render_mode == "RGB+D":
        depth_img = _tiles_to_image(depth_acc[:, :, None], grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    elif render_mode == "RGB+ED":
        ed = depth_acc / jnp.clip(alpha_acc, 1e-10, None)
        depth_img = _tiles_to_image(ed[:, :, None], grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    return render, alphas, normals_img, distort, median


def rasterize_tiled_2dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, colors: jnp.ndarray,
    viewmat: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
    background: jnp.ndarray, sh_degree: Optional[int] = None,
    render_mode: str = "RGB", means2d_override: Optional[jnp.ndarray] = None,
    tile_w: int = 16, tile_h: int = 16, chunk: int = 1024,
    cap: Optional[int] = None,
):
    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    N = means.shape[0]
    grid = _make_grid(width, height, tile_w, tile_h)
    cap = cap if cap is not None else _default_cap(N, chunk)
    cap = -(-cap // chunk) * chunk

    proj = project_2dgs(means, quats, scales, viewmat, K, width, height)
    means2d = proj.means2d if means2d_override is None else means2d_override

    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    radii = cull_radius(proj.radii, opacities, guard_px=2.2)
    inst = build_tile_instances(jax.lax.stop_gradient(means2d), radii,
                                proj.depths, grid.n_tiles_x, grid.n_tiles_y,
                                tile_w, tile_h, cap)

    render, alphas, normals_img, distort, median = composite_scan_2dgs(
        means2d, proj.transforms, opacities, rgb, proj.normals, inst, grid,
        width, height, background, render_mode, chunk, tile_w, tile_h)

    normals_from_depth = depth_to_normals(median[..., 0], K)

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths,
            "n_instances": inst.n_instances, "n_dropped": inst.n_dropped}
    return (render, alphas, normals_img, normals_from_depth, distort,
            median, info)


# ---------------------------------------------------------------------------
# unified entry used by the render layer
# ---------------------------------------------------------------------------

def render_tiled(gs_attr: str, means, quats, scales, opacities, colors,
                 viewmat, K, width, height, background,
                 sh_degree=None, render_mode="RGB", means2d_override=None,
                 **kw):
    if gs_attr == "3D":
        render, alphas, info = rasterize_tiled_3dgs(
            means, quats, scales, opacities, colors, viewmat, K,
            width, height, background, sh_degree=sh_degree,
            render_mode=render_mode, means2d_override=means2d_override, **kw)
        return render, alphas, info, {}
    elif gs_attr == "2D":
        (render, alphas, normals, nfd, distort, median, info) = \
            rasterize_tiled_2dgs(
                means, quats, scales, opacities, colors, viewmat, K,
                width, height, background, sh_degree=sh_degree,
                render_mode=render_mode, means2d_override=means2d_override,
                **kw)
        extras = {"render_normals": normals,
                  "render_normals_from_depth": nfd,
                  "render_distort": distort,
                  "render_median_depth": median}
        return render, alphas, info, extras
    raise ValueError(f"Unknown gs_attr: {gs_attr}")
