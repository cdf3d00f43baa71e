"""Projection op tests: geometry sanity + culling semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.core.transforms import quat_to_rotmat, build_covariance
from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.projection import project_3dgs, project_2dgs


def test_quat_to_rotmat_identity():
    R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_covariance_psd():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    s = rng.uniform(0.01, 1.0, size=(16, 3)).astype(np.float32)
    cov = np.asarray(build_covariance(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-6)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > -1e-6).all()


def test_center_gaussian_projects_to_image_center():
    cam = lookat_camera(width=64, height=64, eye=(0, 0, -4))
    means = jnp.array([[0.0, 0.0, 0.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    proj = project_3dgs(means, quats, scales, cam.viewmat, cam.K, 64, 64)
    assert float(proj.radii[0]) > 0
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32.0, 32.0], atol=1e-3)
    np.testing.assert_allclose(float(proj.depths[0]), 4.0, atol=1e-5)


def test_behind_camera_culled():
    cam = lookat_camera(width=64, height=64, eye=(0, 0, -4))
    means = jnp.array([[0.0, 0.0, -8.0]])  # behind the camera
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.1, 0.1, 0.1]])
    proj = project_3dgs(means, quats, scales, cam.viewmat, cam.K, 64, 64)
    assert float(proj.radii[0]) == 0.0


def test_offscreen_culled():
    cam = lookat_camera(width=64, height=64, eye=(0, 0, -4))
    means = jnp.array([[100.0, 0.0, 0.0]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.array([[0.01, 0.01, 0.01]])
    proj = project_3dgs(means, quats, scales, cam.viewmat, cam.K, 64, 64)
    assert float(proj.radii[0]) == 0.0


def test_isotropic_radius_matches_analytic():
    # isotropic gaussian: cov2d = (s * f / z)^2 I + eps2d I
    cam = lookat_camera(width=256, height=256, eye=(0, 0, -4))
    s = 0.2
    proj = project_3dgs(jnp.array([[0.0, 0.0, 0.0]]),
                        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
                        jnp.array([[s, s, s]]),
                        cam.viewmat, cam.K, 256, 256)
    fx = float(cam.K[0, 0])
    expected = np.ceil(3.0 * np.sqrt((s * fx / 4.0) ** 2 + 0.3))
    np.testing.assert_allclose(float(proj.radii[0]), expected, atol=1.0)


def test_conic_is_inverse_cov():
    cam = lookat_camera(width=128, height=128, eye=(0, 0, -4))
    g = random_gaussians(64, seed=3)
    proj = project_3dgs(jnp.asarray(g["means"]), jnp.asarray(g["quats"]),
                        jnp.asarray(g["scales"]), cam.viewmat, cam.K, 128, 128)
    conics = np.asarray(proj.conics)
    valid = np.asarray(proj.radii) > 0
    assert valid.sum() > 0
    # reconstruct cov2d from conic and verify det consistency
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    det_inv = a * c - b * b
    assert (det_inv[valid] > 0).all()


def test_2dgs_projection_center():
    cam = lookat_camera(width=64, height=64, eye=(0, 0, -4))
    proj = project_2dgs(jnp.array([[0.0, 0.0, 0.0]]),
                        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
                        jnp.array([[0.2, 0.2, 1.0]]),
                        cam.viewmat, cam.K, 64, 64)
    assert float(proj.radii[0]) > 0
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32.0, 32.0], atol=1e-2)
    # normal faces the camera: in camera space the z component is negative
    assert float(proj.normals[0, 2]) < 0


def test_2dgs_transform_maps_center():
    cam = lookat_camera(width=64, height=64, eye=(0.5, -0.3, -4))
    proj = project_2dgs(jnp.array([[0.0, 0.0, 0.0]]),
                        jnp.array([[1.0, 0.0, 0.0, 0.0]]),
                        jnp.array([[0.2, 0.3, 1.0]]),
                        cam.viewmat, cam.K, 64, 64)
    M = np.asarray(proj.transforms[0])
    s = M @ np.array([0.0, 0.0, 1.0])  # u=v=0 -> splat center
    px = s[:2] / s[2]
    np.testing.assert_allclose(px, np.asarray(proj.means2d[0]), atol=0.5)
