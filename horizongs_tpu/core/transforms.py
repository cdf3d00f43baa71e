"""Rotation / covariance math, vectorized jnp (batched over leading axis)."""
from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize (..., 4) quaternions (w, x, y, z ordering)."""
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps, None)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches the reference's `build_rotation` (`utils/general_utils.py:113-134`).
    Input need not be normalized.
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """World-space 3D covariance Sigma = R S S^T R^T.

    scales: (..., 3) positive; quats: (..., 4) wxyz.
    Returns (..., 3, 3) symmetric covariance.
    """
    R = quat_to_rotmat(quats)              # (..., 3, 3)
    M = R * scales[..., None, :]           # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)
