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

from horizongs_tpu.core.transforms import quat_to_rotmat


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


def _rot_rows(W: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(3,3) @ (N,3)^T as flat vector math -> (N,3).

    Batched tiny matmuls pad their 3-wide contraction onto the MXU (a
    ~15x slowdown at N=100k); nine scalar-broadcast FMAs stay on the VPU
    and are exact f32."""
    return jnp.stack(
        [W[i, 0] * v[:, 0] + W[i, 1] * v[:, 1] + W[i, 2] * v[:, 2]
         for i in range(3)], axis=-1)


def _camera_points(means: jnp.ndarray, viewmat: jnp.ndarray) -> jnp.ndarray:
    return _rot_rows(viewmat[:3, :3], means) + viewmat[:3, 3]


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
    # cov2d = J W Sigma W^T J^T with Sigma = R S^2 R^T factors as V V^T
    # where V = J @ (W @ R) @ S — all computed as flat (N,) vector math
    # (batched 3x3 matmuls lower terribly on TPU, see _rot_rows).
    R = quat_to_rotmat(quats)                                  # (N, 3, 3)
    WRs = [[(W[i, 0] * R[:, 0, k] + W[i, 1] * R[:, 1, k]
             + W[i, 2] * R[:, 2, k]) * scales[:, k]
            for k in range(3)] for i in range(3)]              # (WR)S

    # EWA Jacobian with frustum clamp (gsplat: lim = 1.3 * tan(fov/2))
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)
    rz = 1.0 / zs
    rz2 = rz * rz
    # J rows: [fx*rz, 0, -fx*tx*rz^2], [0, fy*rz, -fy*ty*rz^2]
    j00, j02 = fx * rz, -fx * tx * rz2
    j11, j12 = fy * rz, -fy * ty * rz2
    v0 = [j00 * WRs[0][k] + j02 * WRs[2][k] for k in range(3)]
    v1 = [j11 * WRs[1][k] + j12 * WRs[2][k] for k in range(3)]
    a = v0[0] * v0[0] + v0[1] * v0[1] + v0[2] * v0[2]
    b = v0[0] * v1[0] + v0[1] * v1[1] + v0[2] * v1[2]
    c = v1[0] * v1[0] + v1[1] * v1[1] + v1[2] * v1[2]
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

    W = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = _camera_points(means, viewmat)                    # (N, 3)
    z = p_cam[:, 2]
    valid = (z > near_plane) & (z < far_plane)

    R = quat_to_rotmat(quats)                                 # (N, 3, 3)
    u0 = _rot_rows(W, R[..., :, 0])                           # unit tangents
    u1 = _rot_rows(W, R[..., :, 1])                           # in camera space
    r0_cam = u0 * scales[:, 0:1]
    r1_cam = u1 * scales[:, 1:2]
    normal_cam = jnp.cross(u0, u1)
    normal_cam = normal_cam / jnp.clip(
        jnp.linalg.norm(normal_cam, axis=-1, keepdims=True), 1e-12, None)
    # flip normals to face the camera (ray dir ~ p_cam)
    facing = jnp.sum(normal_cam * p_cam, axis=-1)
    normal_cam = jnp.where((facing > 0)[:, None], -normal_cam, normal_cam)

    # M columns: [r0_cam, r1_cam, p_cam]; K applied row-wise (flat vector
    # math — see _rot_rows for why not a batched matmul)
    cols = jnp.stack([r0_cam, r1_cam, p_cam], axis=-1)        # (N, 3, 3)
    M = jnp.stack([fx * cols[:, 0, :] + cx * cols[:, 2, :],
                   fy * cols[:, 1, :] + cy * cols[:, 2, :],
                   cols[:, 2, :]], axis=-2)                   # (N, 3, 3)

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
