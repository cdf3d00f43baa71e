"""Gaussian projection: world space -> screen space, vectorized jnp.

TPU-native equivalent of gsplat's `fully_fused_projection` /
`fully_fused_projection_2dgs` (consumed by the reference at
`gaussian_renderer/render.py:149-186` and inside `gsplat.rasterization`).
Everything is a fixed-shape map over N gaussians — XLA fuses the whole
pipeline into a handful of vector ops; no kernel is needed for this stage.

Numerics follow gsplat v1.x:
  * perspective EWA with frustum-limited Jacobian (1.3 * tan(fov/2) clamp)
  * eps2d (default 0.3) added to the 2D covariance diagonal ("AA blur"),
    optional det-ratio compensation factor
  * radius = ceil(3 * sqrt(max eigenvalue of cov2d))
  * a gaussian survives iff near < z < far, det(cov2d) > 0, and its
    [-r, +r] box intersects the image.

Invalid gaussians get radius 0 — downstream stages treat radius==0 as
"does not exist" (the static-shape replacement for gsplat's packed mode).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from horizongs_tpu.core.transforms import build_covariance, quat_to_rotmat


class ProjectedGaussians(NamedTuple):
    radii: jnp.ndarray        # (N,) float32, 0 => culled
    means2d: jnp.ndarray      # (N, 2) pixel coords
    depths: jnp.ndarray       # (N,) camera-space z
    conics: jnp.ndarray       # (N, 3) upper-tri of inverse cov2d (a, b, c)
    compensations: jnp.ndarray  # (N,) det-ratio AA compensation


class ProjectedSurfels(NamedTuple):
    """2DGS projection output: splat-to-screen ray transform + bounds."""
    radii: jnp.ndarray        # (N,) float32, 0 => culled
    means2d: jnp.ndarray      # (N, 2) projected splat centers (pixels)
    depths: jnp.ndarray       # (N,) camera-space z of splat center
    transforms: jnp.ndarray   # (N, 3, 3) M: (u, v, 1) -> screen homogeneous
    normals: jnp.ndarray      # (N, 3) camera-space splat normals


_HI = jax.lax.Precision.HIGHEST


def _camera_points(means: jnp.ndarray, viewmat: jnp.ndarray) -> jnp.ndarray:
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    # HIGHEST: TPU default matmul precision rounds operands to bf16
    return jnp.matmul(means, R.T, precision=_HI) + t


def project_3dgs(
    means: jnp.ndarray,    # (N, 3)
    quats: jnp.ndarray,    # (N, 4) wxyz
    scales: jnp.ndarray,   # (N, 3) positive
    viewmat: jnp.ndarray,  # (4, 4)
    K: jnp.ndarray,        # (3, 3)
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
) -> ProjectedGaussians:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    p_cam = _camera_points(means, viewmat)                     # (N, 3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    valid = (z > near_plane) & (z < far_plane)
    zs = jnp.where(valid, z, 1.0)  # avoid div-by-zero on culled rows

    W = viewmat[:3, :3]
    cov_world = build_covariance(scales, quats)                # (N, 3, 3)
    cov_cam = jnp.matmul(jnp.matmul(W[None], cov_world, precision=_HI),
                         W.T[None], precision=_HI)             # (N, 3, 3)

    # EWA Jacobian with frustum clamp (gsplat: lim = 1.3 * tan(fov/2))
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)
    rz = 1.0 / zs
    rz2 = rz * rz
    # J (N, 2, 3)
    zeros = jnp.zeros_like(rz)
    J = jnp.stack([
        jnp.stack([fx * rz, zeros, -fx * tx * rz2], axis=-1),
        jnp.stack([zeros, fy * rz, -fy * ty * rz2], axis=-1),
    ], axis=-2)
    cov2d = jnp.matmul(jnp.matmul(J, cov_cam, precision=_HI),
                       jnp.swapaxes(J, -1, -2), precision=_HI)  # (N, 2, 2)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det_orig = a * c - b * b
    a = a + eps2d
    c = c + eps2d
    det = a * c - b * b
    if calc_compensations:
        compensations = jnp.sqrt(jnp.clip(det_orig / jnp.clip(det, 1e-12, None), 0.0, None))
    else:
        compensations = jnp.ones_like(det)

    valid &= det > 0.0
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # radius from the larger eigenvalue of cov2d (3 sigma)
    mid = 0.5 * (a + c)
    v1 = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.01, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(v1, 0.0, None)))

    mean_x = fx * x * rz + cx
    mean_y = fy * y * rz + cy
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    valid &= radius > radius_clip
    valid &= (mean_x + radius > 0) & (mean_x - radius < width)
    valid &= (mean_y + radius > 0) & (mean_y - radius < height)

    radii = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(radii=radii, means2d=means2d, depths=z,
                              conics=conic, compensations=compensations)


def project_2dgs(
    means: jnp.ndarray,    # (N, 3)
    quats: jnp.ndarray,    # (N, 4) wxyz
    scales: jnp.ndarray,   # (N, 3) — only the first two axes are used
    viewmat: jnp.ndarray,  # (4, 4)
    K: jnp.ndarray,        # (3, 3)
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
) -> ProjectedSurfels:
    """Project 2D (surfel) gaussians: build the (u,v,1)->screen transform.

    A surfel point is x(u, v) = p + u * s0 * r0 + v * s1 * r1 where r0, r1
    are the first two columns of the rotation. In camera space the screen
    homogeneous coordinate is  s = M @ (u, v, 1)  with
      M = K_hom @ [W r0 s0, W r1 s1, W p + t]    (3x3)
    The rasterizer intersects pixel rays with the splat plane via M
    (2DGS "ray-splat" formulation), so no 2D covariance is needed.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    Kh = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                   dtype=means.dtype)
    Kh = Kh.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)

    W = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = jnp.matmul(means, W.T, precision=_HI) + t         # (N, 3)
    z = p_cam[:, 2]
    valid = (z > near_plane) & (z < far_plane)

    R = quat_to_rotmat(quats)                                 # (N, 3, 3)
    r0 = R[..., :, 0] * scales[:, 0:1]                        # (N, 3) tangent u
    r1 = R[..., :, 1] * scales[:, 1:2]                        # (N, 3) tangent v
    r0_cam = jnp.matmul(r0, W.T, precision=_HI)
    r1_cam = jnp.matmul(r1, W.T, precision=_HI)
    normal_cam = jnp.cross(jnp.matmul(R[..., :, 0], W.T, precision=_HI),
                           jnp.matmul(R[..., :, 1], W.T, precision=_HI))
    normal_cam = normal_cam / jnp.clip(
        jnp.linalg.norm(normal_cam, axis=-1, keepdims=True), 1e-12, None)
    # flip normals to face the camera (ray dir ~ p_cam)
    facing = jnp.sum(normal_cam * p_cam, axis=-1)
    normal_cam = jnp.where((facing > 0)[:, None], -normal_cam, normal_cam)

    # M columns: [r0_cam, r1_cam, p_cam], then K applied.
    M = jnp.stack([r0_cam, r1_cam, p_cam], axis=-1)           # (N, 3, 3)
    M = jnp.matmul(Kh[None], M, precision=_HI)

    # Screen-space AABB of the 3-sigma disk (2DGS homogeneous trick):
    # with rows M1, M2, M3 of M scaled by diag(1, 1, -1) test point,
    #   d = M3.M3' ; center = (M1.M3'/d, M2.M3'/d)
    #   half_extent^2 = center^2 - (M1.M1'/d, M2.M2'/d)
    # where v.w' uses the (3sigma, 3sigma, -1) metric.
    metric = jnp.array([9.0, 9.0, -1.0], dtype=means.dtype)
    M1, M2, M3 = M[:, 0, :], M[:, 1, :], M[:, 2, :]
    d = jnp.sum(M3 * M3 * metric, axis=-1)
    valid &= jnp.abs(d) > 1e-10
    d_safe = jnp.where(jnp.abs(d) > 1e-10, d, 1.0)
    center_x = jnp.sum(M1 * M3 * metric, axis=-1) / d_safe
    center_y = jnp.sum(M2 * M3 * metric, axis=-1) / d_safe
    half_x2 = center_x * center_x - jnp.sum(M1 * M1 * metric, axis=-1) / d_safe
    half_y2 = center_y * center_y - jnp.sum(M2 * M2 * metric, axis=-1) / d_safe
    valid &= (half_x2 > 0) & (half_y2 > 0)
    radius = jnp.ceil(jnp.sqrt(jnp.clip(jnp.maximum(half_x2, half_y2), 0.0, None)))

    means2d = jnp.stack([center_x, center_y], axis=-1)
    valid &= radius > radius_clip
    valid &= (center_x + radius > 0) & (center_x - radius < width)
    valid &= (center_y + radius > 0) & (center_y - radius < height)

    radii = jnp.where(valid, radius, 0.0)
    return ProjectedSurfels(radii=radii, means2d=means2d, depths=z,
                            transforms=M, normals=normal_cam)
