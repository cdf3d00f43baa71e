"""Dense oracle renderer tests: compositing semantics + gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.reference import (
    render_dense_3dgs, render_dense_2dgs, depth_to_normals)


def _scene(n=64, seed=0, w=64, h=64):
    cam = lookat_camera(width=w, height=h, eye=(0, 0, -4))
    g = random_gaussians(n, seed=seed, extent=0.8, scale_range=(0.05, 0.15))
    arrs = {k: jnp.asarray(v) for k, v in g.items()}
    return cam, arrs


def test_empty_scene_renders_background():
    cam, g = _scene(4)
    bg = jnp.array([0.2, 0.5, 0.9])
    render, alphas, _ = render_dense_3dgs(
        g["means"], g["quats"], g["scales"], jnp.zeros(4), g["colors"],
        cam.viewmat, cam.K, 64, 64, bg)
    np.testing.assert_allclose(np.asarray(render),
                               np.broadcast_to(bg, (64, 64, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alphas), 0.0, atol=1e-6)


def test_single_gaussian_center_alpha():
    cam = lookat_camera(width=65, height=65, eye=(0, 0, -4))
    op = 0.8
    render, alphas, _ = render_dense_3dgs(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([[0.3, 0.3, 0.3]]), jnp.array([op]),
        jnp.array([[1.0, 0.0, 0.0]]),
        cam.viewmat, cam.K, 65, 65, jnp.zeros(3))
    # center pixel (32.5, 32.5) equals the projected mean -> alpha ~= opacity
    a = float(alphas[32, 32, 0])
    assert abs(a - op) < 0.01
    assert float(render[32, 32, 0]) == pytest.approx(a, abs=1e-5)


def test_front_to_back_ordering():
    cam = lookat_camera(width=33, height=33, eye=(0, 0, -4))
    # red gaussian in front (z=-1 world is closer to eye at z=-4), green behind
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.5)
    ops = jnp.array([0.9, 0.9])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    render, _, _ = render_dense_3dgs(means, quats, scales, ops, colors,
                                     cam.viewmat, cam.K, 33, 33, jnp.zeros(3))
    center = np.asarray(render[16, 16])
    assert center[0] > 0.8          # front red dominates
    assert center[1] < 0.15         # back green mostly occluded
    assert center[1] > 0.0          # but visible through (1 - 0.9)


def test_alpha_bounded():
    cam, g = _scene(128, seed=7)
    render, alphas, _ = render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        cam.viewmat, cam.K, 64, 64, jnp.zeros(3))
    a = np.asarray(alphas)
    assert (a >= 0).all() and (a <= 1.0 + 1e-5).all()
    assert np.isfinite(np.asarray(render)).all()


def test_depth_modes():
    cam = lookat_camera(width=33, height=33, eye=(0, 0, -4))
    render_ed, alphas, _ = render_dense_3dgs(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([[0.3, 0.3, 0.3]]), jnp.array([0.9]),
        jnp.array([[1.0, 1.0, 1.0]]),
        cam.viewmat, cam.K, 33, 33, jnp.zeros(3), render_mode="RGB+ED")
    assert render_ed.shape == (33, 33, 4)
    # expected depth at center ~= distance to the gaussian (4.0)
    assert float(render_ed[16, 16, 3]) == pytest.approx(4.0, abs=0.05)

    render_d, alphas, _ = render_dense_3dgs(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([[0.3, 0.3, 0.3]]), jnp.array([0.9]),
        jnp.array([[1.0, 1.0, 1.0]]),
        cam.viewmat, cam.K, 33, 33, jnp.zeros(3), render_mode="RGB+D")
    # accumulated depth = alpha * z
    a = float(alphas[16, 16, 0])
    assert float(render_d[16, 16, 3]) == pytest.approx(4.0 * a, abs=0.05)


def test_sh_degree0_matches_rgb():
    from horizongs_tpu.core.sh import rgb_to_sh
    cam, g = _scene(32, seed=2)
    rgb = g["colors"]
    sh = rgb_to_sh(rgb)[:, None, :]   # (N, 1, 3)
    r_rgb, _, _ = render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], rgb,
        cam.viewmat, cam.K, 64, 64, jnp.zeros(3))
    r_sh, _, _ = render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], sh,
        cam.viewmat, cam.K, 64, 64, jnp.zeros(3), sh_degree=0)
    np.testing.assert_allclose(np.asarray(r_rgb), np.asarray(r_sh), atol=1e-4)


def test_gradients_flow_and_are_finite():
    cam, g = _scene(24, seed=5, w=32, h=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(means, scales, opacities, colors):
        render, _, _ = render_dense_3dgs(
            means, g["quats"], scales, opacities, colors,
            cam.viewmat, cam.K, 32, 32, jnp.zeros(3))
        return jnp.mean((render - target) ** 2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        g["means"], g["scales"], g["opacities"], g["colors"])
    total = 0.0
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        total += float(jnp.sum(jnp.abs(gr)))
    assert total > 0.0


def test_gradient_finite_differences():
    cam = lookat_camera(width=16, height=16, eye=(0, 0, -4))
    means = jnp.array([[0.05, -0.02, 0.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.array([[0.4, 0.4, 0.4]])
    colors = jnp.array([[0.7, 0.3, 0.5]])

    def loss(op):
        render, _, _ = render_dense_3dgs(
            means, quats, scales, op, colors,
            cam.viewmat, cam.K, 16, 16, jnp.zeros(3))
        return jnp.sum(render)

    op0 = jnp.array([0.5])
    g_auto = float(jax.grad(loss)(op0)[0])
    eps = 1e-3
    g_fd = (float(loss(op0 + eps)) - float(loss(op0 - eps))) / (2 * eps)
    assert g_auto == pytest.approx(g_fd, rel=1e-2)


def test_2dgs_renders_and_outputs_shapes():
    cam, g = _scene(48, seed=9)
    out = render_dense_2dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        cam.viewmat, cam.K, 64, 64, jnp.zeros(3), render_mode="RGB+ED")
    render, alphas, normals, normals_fd, distort, median, info = out
    assert render.shape == (64, 64, 4)
    assert alphas.shape == (64, 64, 1)
    assert normals.shape == (64, 64, 3)
    assert normals_fd.shape == (64, 64, 3)
    assert distort.shape == (64, 64, 1)
    assert median.shape == (64, 64, 1)
    for arr in (render, alphas, normals, distort, median):
        assert np.isfinite(np.asarray(arr)).all()
    assert float(jnp.max(alphas)) > 0.1


def test_2dgs_flat_disk_normal():
    # a single axis-aligned disk facing the camera -> normal ~ (0, 0, -1) cam
    cam = lookat_camera(width=33, height=33, eye=(0, 0, -4))
    out = render_dense_2dgs(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([[0.5, 0.5, 1.0]]), jnp.array([0.95]),
        jnp.array([[1.0, 1.0, 1.0]]),
        cam.viewmat, cam.K, 33, 33, jnp.zeros(3), render_mode="RGB+ED")
    render, alphas, normals, _, _, median, _ = out
    a = float(alphas[16, 16, 0])
    assert a > 0.9
    n = np.asarray(normals[16, 16]) / a
    np.testing.assert_allclose(n, [0, 0, -1], atol=0.05)
    # median depth at center ~ 4
    assert float(median[16, 16, 0]) == pytest.approx(4.0, abs=0.1)


def test_depth_to_normals_plane():
    # constant-depth plane -> normals point along -z
    K = jnp.array([[50.0, 0, 16.0], [0, 50.0, 16.0], [0, 0, 1]])
    depth = jnp.full((32, 32), 2.0)
    n = depth_to_normals(depth, K)
    inner = np.asarray(n[8:-8, 8:-8])
    norms = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.abs(inner[..., 2]).min() > 0.99
