"""Dense oracle renderer: per-pixel alpha compositing over ALL gaussians.

This is the testing/verification reference for the tiled Pallas rasterizer
(SURVEY.md §7 M0): a straight-line jnp implementation of the math gsplat's
CUDA kernels perform (`gsplat.rasterization` / `rasterization_2dgs`, called
by the reference at `gaussian_renderer/render.py:40-76`). Differentiable by
construction; O(pixels * gaussians), so only for small scenes / tests.

Compositing semantics (match gsplat tile rasterizer):
  * gaussians sorted by camera depth, front to back
  * sigma = 0.5 * d^T Conic d;   alpha = min(0.999, opa * exp(-sigma))
  * alpha < 1/255 contributes nothing
  * a gaussian contributes iff the running transmittance T > 1e-4
  * color = sum w_i c_i + T_final * background,  w_i = alpha_i * T_i
  * render_mode: "RGB" | "RGB+D" (accumulated depth sum w_i z_i)
    | "RGB+ED" (expected depth, sum w_i z_i / max(alpha, eps))

2DGS adds (per `rasterization_2dgs`'s output tuple): accumulated
camera-space normals, per-pixel distortion accumulator, and median depth
(depth at the gaussian that crosses T < 0.5).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.core.sh import eval_sh
from horizongs_tpu.ops.projection import (
    ProjectedGaussians,
    ProjectedSurfels,
    project_2dgs,
    project_3dgs,
)

ALPHA_CUTOFF = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
_HI = jax.lax.Precision.HIGHEST
MAX_ALPHA = 0.999
# 2DGS screen-space low-pass filter: rho = min(rho_3d, FILTER_INV_SQUARE * d^2)
FILTER_INV_SQUARE_2DGS = 2.0


def _sh_colors(colors: jnp.ndarray, sh_degree: Optional[int],
               means: jnp.ndarray, cam_pos: jnp.ndarray) -> jnp.ndarray:
    """(N, K, 3) SH coeffs -> (N, 3) clamped RGB; passthrough for (N, 3)."""
    if sh_degree is None:
        return colors
    dirs = means - cam_pos[None, :]
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12, None)
    rgb = eval_sh(sh_degree, colors, dirs) + 0.5
    return jnp.clip(rgb, 0.0, None)


def _depth_order(depths: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    keys = jnp.where(radii > 0, depths, jnp.inf)
    return jnp.argsort(keys)


def _composite_chunk_3dgs(px: jnp.ndarray, py: jnp.ndarray,
                          means2d, conics, opacities, colors, depths, valid):
    """Composite a chunk of P pixels against all (sorted) gaussians.

    px, py: (P,) pixel centers. Gaussian arrays are depth-sorted.
    Returns (P, C) weighted color sum, (P,) alpha, (P,) depth sum, T_final.
    """
    dx = px[:, None] - means2d[None, :, 0]          # (P, N)
    dy = py[:, None] - means2d[None, :, 1]
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    sigma = 0.5 * (a[None] * dx * dx + c[None] * dy * dy) + b[None] * dx * dy
    alpha = opacities[None, :] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha, MAX_ALPHA)
    alpha = jnp.where((sigma >= 0) & (alpha >= ALPHA_CUTOFF) & valid[None, :],
                      alpha, 0.0)
    one_minus = 1.0 - alpha
    # exclusive prefix product of (1 - alpha) along the gaussian axis:
    # T_i = prod_{j<i} (1 - alpha_j)
    T = jnp.concatenate([jnp.ones_like(alpha[:, :1]),
                         jnp.cumprod(one_minus, axis=1)[:, :-1]], axis=1)
    w = jnp.where(T > TRANSMITTANCE_EPS, alpha * T, 0.0)     # (P, N)
    # HIGHEST precision: default TPU matmuls round operands to bf16,
    # which would defeat this oracle's purpose as the accuracy reference
    color_sum = jnp.matmul(w, colors, precision=_HI)         # (P, C)
    alpha_sum = jnp.sum(w, axis=1)
    depth_sum = jnp.matmul(w, depths, precision=_HI)
    # final transmittance after the last contributing gaussian
    T_final = jnp.prod(jnp.where(w > 0, one_minus, 1.0), axis=1)
    return color_sum, alpha_sum, depth_sum, T_final


def render_dense_3dgs(
    means: jnp.ndarray,      # (N, 3)
    quats: jnp.ndarray,      # (N, 4)
    scales: jnp.ndarray,     # (N, 3)
    opacities: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,     # (N, 3) RGB or (N, K, 3) SH
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    background: jnp.ndarray,        # (C_color,)
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    eps2d: float = 0.3,
    means2d_override: Optional[jnp.ndarray] = None,
    pixel_chunk: int = 4096,
):
    """Returns (render (H, W, C), alphas (H, W, 1), info dict).

    `means2d_override` lets callers inject a differentiable probe on the
    projected means (for densification screen-gradient statistics, the
    `info["means2d"].retain_grad()` contract of `render.py:91-93`).
    """
    proj = project_3dgs(means, quats, scales, viewmat, K, width, height, eps2d=eps2d)
    means2d = proj.means2d if means2d_override is None else means2d_override

    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    order = _depth_order(proj.depths, proj.radii)
    s_means2d = means2d[order]
    s_conics = proj.conics[order]
    s_opac = opacities[order]
    s_rgb = rgb[order]
    s_depths = proj.depths[order]
    s_valid = proj.radii[order] > 0

    n_pix = height * width
    ys = (jnp.arange(n_pix) // width).astype(jnp.float32) + 0.5
    xs = (jnp.arange(n_pix) % width).astype(jnp.float32) + 0.5
    n_chunks = -(-n_pix // pixel_chunk)
    pad = n_chunks * pixel_chunk - n_pix
    xs = jnp.pad(xs, (0, pad))
    ys = jnp.pad(ys, (0, pad))
    xs = xs.reshape(n_chunks, pixel_chunk)
    ys = ys.reshape(n_chunks, pixel_chunk)

    @jax.checkpoint
    def chunk_fn(xy):
        cx, cy = xy
        return _composite_chunk_3dgs(cx, cy, s_means2d, s_conics, s_opac,
                                     s_rgb, s_depths, s_valid)

    color_sum, alpha_sum, depth_sum, T_final = jax.lax.map(chunk_fn, (xs, ys))
    color_sum = color_sum.reshape(-1, color_sum.shape[-1])[:n_pix]
    alpha_sum = alpha_sum.reshape(-1)[:n_pix]
    depth_sum = depth_sum.reshape(-1)[:n_pix]
    T_final = T_final.reshape(-1)[:n_pix]

    render = color_sum + T_final[:, None] * background[None, :]
    render = render.reshape(height, width, -1)
    alphas = alpha_sum.reshape(height, width, 1)

    if render_mode == "RGB+D":
        depth = depth_sum.reshape(height, width, 1)
        render = jnp.concatenate([render, depth], axis=-1)
    elif render_mode == "RGB+ED":
        depth = (depth_sum / jnp.clip(alpha_sum, 1e-10, None)).reshape(height, width, 1)
        render = jnp.concatenate([render, depth], axis=-1)
    elif render_mode != "RGB":
        raise ValueError(f"Unknown render_mode: {render_mode}")

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths,
            "conics": proj.conics}
    return render, alphas, info


def _composite_chunk_2dgs(px, py, transforms, means2d, opacities, colors,
                          depths, normals, valid):
    """2DGS ray-splat compositing for a chunk of P pixels.

    transforms: (N, 3, 3) sorted M matrices. Returns weighted sums:
    color (P, C), alpha (P,), depth (P,), normal (P, 3), distortion (P,),
    median depth (P,), T_final (P,).
    """
    M1 = transforms[:, 0, :]   # (N, 3)
    M2 = transforms[:, 1, :]
    M3 = transforms[:, 2, :]
    # plane intersection: h_u = px * M3 - M1, h_v = py * M3 - M2,
    # (u, v, 1) ~ cross(h_u, h_v)
    hu = px[:, None, None] * M3[None] - M1[None]      # (P, N, 3)
    hv = py[:, None, None] * M3[None] - M2[None]
    k = jnp.cross(hu, hv)                              # (P, N, 3)
    kz = jnp.where(jnp.abs(k[..., 2]) > 1e-9, k[..., 2], 1e-9)
    u = k[..., 0] / kz
    v = k[..., 1] / kz
    rho3d = u * u + v * v
    # screen-space low-pass: distance to projected center
    dx = px[:, None] - means2d[None, :, 0]
    dy = py[:, None] - means2d[None, :, 1]
    rho2d = FILTER_INV_SQUARE_2DGS * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    # depth at the intersection point: z = u * M[2,0]? no — z from camera-space
    # interp: s = M (u, v, 1); z_cam = third row of un-K'd transform... M3 row is
    # the homogeneous w = z (K leaves the last row as camera z). So:
    z_inter = (M3[None, :, 0] * u + M3[None, :, 1] * v + M3[None, :, 2])
    alpha = opacities[None, :] * jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(alpha, MAX_ALPHA)
    alpha = jnp.where((alpha >= ALPHA_CUTOFF) & valid[None, :] & (z_inter > 0.01),
                      alpha, 0.0)
    one_minus = 1.0 - alpha
    T = jnp.concatenate([jnp.ones_like(alpha[:, :1]),
                         jnp.cumprod(one_minus, axis=1)[:, :-1]], axis=1)
    w = jnp.where(T > TRANSMITTANCE_EPS, alpha * T, 0.0)

    color_sum = jnp.matmul(w, colors, precision=_HI)
    alpha_sum = jnp.sum(w, axis=1)
    depth_sum = jnp.sum(w * z_inter, axis=1)
    normal_sum = jnp.matmul(w, normals, precision=_HI)
    T_final = jnp.prod(jnp.where(w > 0, one_minus, 1.0), axis=1)

    # distortion (2DGS eq. 15, running form over sorted order):
    # L = 2 * sum_i w_i * (m_i * A_{i-1} - D_{i-1}),
    # m = normalized inverse-ish depth mapping; use m = z (near/far-normalized
    # upstream). A = prefix sum of w, D = prefix sum of w*m.
    m = z_inter
    wm = w * m
    A_prev = jnp.cumsum(w, axis=1) - w
    D_prev = jnp.cumsum(wm, axis=1) - wm
    distort = 2.0 * jnp.sum(w * (m * A_prev - D_prev), axis=1)

    # median depth: depth of first gaussian where accumulated T drops < 0.5
    T_after = T * one_minus
    crossed = (T_after < 0.5) & (w > 0)
    first_idx = jnp.argmax(crossed, axis=1)
    any_crossed = jnp.any(crossed, axis=1)
    med = jnp.take_along_axis(z_inter, first_idx[:, None], axis=1)[:, 0]
    median_depth = jnp.where(any_crossed, med, 0.0)
    return color_sum, alpha_sum, depth_sum, normal_sum, distort, median_depth, T_final


def render_dense_2dgs(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    background: jnp.ndarray,
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    means2d_override: Optional[jnp.ndarray] = None,
    pixel_chunk: int = 2048,
):
    """2DGS oracle. Returns (render, alphas, normals, normals_from_depth,
    distort, median_depth, info) mirroring `rasterization_2dgs`'s tuple
    (reference `gaussian_renderer/render.py:55-76`)."""
    proj = project_2dgs(means, quats, scales, viewmat, K, width, height)
    means2d = proj.means2d if means2d_override is None else means2d_override

    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    order = _depth_order(proj.depths, proj.radii)
    s_tf = proj.transforms[order]
    s_means2d = means2d[order]
    s_opac = opacities[order]
    s_rgb = rgb[order]
    s_depths = proj.depths[order]
    s_normals = proj.normals[order]
    s_valid = proj.radii[order] > 0

    n_pix = height * width
    ys = (jnp.arange(n_pix) // width).astype(jnp.float32) + 0.5
    xs = (jnp.arange(n_pix) % width).astype(jnp.float32) + 0.5
    n_chunks = -(-n_pix // pixel_chunk)
    pad = n_chunks * pixel_chunk - n_pix
    xs = jnp.pad(xs, (0, pad)).reshape(n_chunks, pixel_chunk)
    ys = jnp.pad(ys, (0, pad)).reshape(n_chunks, pixel_chunk)

    @jax.checkpoint
    def chunk_fn(xy):
        cx, cy = xy
        return _composite_chunk_2dgs(cx, cy, s_tf, s_means2d, s_opac, s_rgb,
                                     s_depths, s_normals, s_valid)

    (color_sum, alpha_sum, depth_sum, normal_sum, distort, median_depth,
     T_final) = jax.lax.map(chunk_fn, (xs, ys))
    C = color_sum.shape[-1]
    color_sum = color_sum.reshape(-1, C)[:n_pix]
    alpha_sum = alpha_sum.reshape(-1)[:n_pix]
    depth_sum = depth_sum.reshape(-1)[:n_pix]
    normal_sum = normal_sum.reshape(-1, 3)[:n_pix]
    distort = distort.reshape(-1)[:n_pix]
    median_depth = median_depth.reshape(-1)[:n_pix]
    T_final = T_final.reshape(-1)[:n_pix]

    render = color_sum + T_final[:, None] * background[None, :]
    render = render.reshape(height, width, C)
    alphas = alpha_sum.reshape(height, width, 1)
    normals = normal_sum.reshape(height, width, 3)
    distort = distort.reshape(height, width, 1)
    median_depth = median_depth.reshape(height, width, 1)

    if render_mode == "RGB+D":
        depth = depth_sum.reshape(height, width, 1)
        render = jnp.concatenate([render, depth], axis=-1)
    elif render_mode == "RGB+ED":
        depth = (depth_sum / jnp.clip(alpha_sum, 1e-10, None)).reshape(height, width, 1)
        render = jnp.concatenate([render, depth], axis=-1)
    elif render_mode != "RGB":
        raise ValueError(f"Unknown render_mode: {render_mode}")

    normals_from_depth = depth_to_normals(median_depth[..., 0], K)

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths}
    return render, alphas, normals, normals_from_depth, distort, median_depth, info


def depth_to_normals(depth: jnp.ndarray, K: jnp.ndarray,
                     row0=0.0) -> jnp.ndarray:
    """Camera-space normals from a depth map via finite differences.

    Equivalent role to gsplat's `depth_to_normal` used for
    `render_normals_from_depth` (consumed by the reference's normal loss,
    `train.py:180-188`). depth: (H, W) -> (H, W, 3). `row0`: global image
    row of depth's first row (the band-sharded step evaluates on a
    halo-extended band patch, so pixel rays need global coordinates)."""
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xs = jnp.arange(W, dtype=depth.dtype) + 0.5
    ys = jnp.arange(H, dtype=depth.dtype) + 0.5 + row0
    px = (xs[None, :] - cx) / fx
    py = (ys[:, None] - cy) / fy
    pts = jnp.stack([px * depth, py * depth, depth], axis=-1)  # (H, W, 3)
    ddx = jnp.zeros_like(pts)
    ddy = jnp.zeros_like(pts)
    ddx = ddx.at[:, 1:-1].set((pts[:, 2:] - pts[:, :-2]) * 0.5)
    ddy = ddy.at[1:-1, :].set((pts[2:, :] - pts[:-2, :]) * 0.5)
    n = jnp.cross(ddx, ddy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-8, n / jnp.clip(norm, 1e-8, None), 0.0)
    valid = (depth > 0)[..., None]
    return jnp.where(valid, n, 0.0)
