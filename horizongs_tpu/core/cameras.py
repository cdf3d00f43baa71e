"""Camera model: pinhole intrinsics + world-to-camera extrinsics.

Semantics follow the reference's `utils/graphics_utils.py:31-77` and
`scene/cameras.py:20-123` (Horizon-GS): COLMAP-style R/t convention, where
`R` is stored transposed (camera-to-world rotation) and `t` is the
world-to-camera translation. The rasterizer consumes a standard 4x4
world-to-camera `viewmat` (row-major, applied as `x_cam = viewmat @ x_world`)
and a 3x3 intrinsics matrix `K` — the same interface as the gsplat calls in
the reference's `gaussian_renderer/render.py:32-47`.

Static image dimensions are kept as Python ints so that every jitted render
function specializes on resolution (TPU needs static shapes).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world-to-camera matrix with optional recentering/rescaling.

    Mirrors `getWorld2View2` (reference `utils/graphics_utils.py:38-49`):
    `R` is the transposed (c2w) rotation as stored by the COLMAP readers,
    `t` the w2c translation; the camera center is shifted by `translate`
    and scaled by `scale` in world space.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection (reference `graphics_utils.py:51-71`).

    Only used for parity with the reference's Camera attributes; the
    rasterizer itself works directly from K.
    """
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


class Camera(NamedTuple):
    """A render-ready camera. Array fields are jnp; dims are static ints.

    `viewmat` is world→camera (4,4); `K` is the pinhole intrinsics (3,3)
    at the *render* resolution; `cam_center` is the camera origin in world
    coordinates (used for anchor view directions and LOD distance rules).
    """
    viewmat: jnp.ndarray          # (4, 4) float32, world -> camera
    K: jnp.ndarray                # (3, 3) float32
    width: int
    height: int
    cam_center: jnp.ndarray       # (3,) float32
    # Optional per-image supervision signals (None when absent):
    image: Optional[jnp.ndarray] = None        # (3, H, W) in [0,1]
    alpha_mask: Optional[jnp.ndarray] = None   # (1, H, W)
    invdepth: Optional[jnp.ndarray] = None     # (1, H, W) inverse depth
    depth_mask: Optional[jnp.ndarray] = None   # (1, H, W)
    uid: int = 0                  # camera index (appearance embedding lookup)
    image_type: str = "aerial"    # "aerial" | "street"
    resolution_scale: float = 1.0
    subset: str = ""              # eval subset tag (UCGS robustness splits)

    @property
    def fx(self) -> jnp.ndarray:
        return self.K[0, 0]

    @property
    def fy(self) -> jnp.ndarray:
        return self.K[1, 1]

    @property
    def cx(self) -> jnp.ndarray:
        return self.K[0, 2]

    @property
    def cy(self) -> jnp.ndarray:
        return self.K[1, 2]


def camera_from_matrices(ref: Camera, viewmat: np.ndarray,
                         uid: int = 0) -> Camera:
    """A novel-view camera reusing `ref`'s intrinsics (fly-through paths,
    reference `render_utils.py:160-181` MiniCam construction)."""
    cam_center = np.linalg.inv(viewmat)[:3, 3].astype(np.float32)
    return ref._replace(viewmat=jnp.asarray(viewmat, dtype=jnp.float32),
                        cam_center=jnp.asarray(cam_center),
                        image=None, alpha_mask=None, invdepth=None,
                        depth_mask=None, uid=uid)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                translate: np.ndarray | None = None, scale: float = 1.0,
                image: np.ndarray | None = None,
                alpha_mask: np.ndarray | None = None,
                invdepth: np.ndarray | None = None,
                depth_mask: np.ndarray | None = None,
                uid: int = 0, image_type: str = "aerial",
                resolution_scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-convention extrinsics + fov intrinsics."""
    viewmat = world_to_view(R, t, translate, scale)
    cam_center = np.linalg.inv(viewmat)[:3, 3]
    fx = fov_to_focal(fovx, width)
    fy = fov_to_focal(fovy, height)
    K = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1]],
                 dtype=np.float32)
    return Camera(
        viewmat=jnp.asarray(viewmat),
        K=jnp.asarray(K),
        width=int(width),
        height=int(height),
        cam_center=jnp.asarray(cam_center, dtype=jnp.float32),
        image=None if image is None else jnp.asarray(image, dtype=jnp.float32),
        alpha_mask=None if alpha_mask is None else jnp.asarray(alpha_mask, dtype=jnp.float32),
        invdepth=None if invdepth is None else jnp.asarray(invdepth, dtype=jnp.float32),
        depth_mask=None if depth_mask is None else jnp.asarray(depth_mask, dtype=jnp.float32),
        uid=uid, image_type=image_type, resolution_scale=resolution_scale,
    )
