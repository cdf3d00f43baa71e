"""Tiled rasterizer vs dense oracle: forward and gradient agreement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.raster import rasterize_tiled_3dgs, rasterize_tiled_2dgs
from horizongs_tpu.ops.reference import render_dense_3dgs, render_dense_2dgs


def _scene(n=128, seed=0, w=64, h=64, scale=(0.03, 0.12)):
    cam = lookat_camera(width=w, height=h, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=seed, extent=0.8, scale_range=scale).items()}
    return cam, g


@pytest.mark.parametrize("mode", ["RGB", "RGB+D", "RGB+ED"])
def test_tiled_matches_dense_3dgs(mode):
    cam, g = _scene(96, seed=1)
    bg = jnp.array([0.2, 0.3, 0.4])
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 64, 64, bg)
    r_d, a_d, _ = render_dense_3dgs(*args, render_mode=mode)
    r_t, a_t, info = rasterize_tiled_3dgs(*args, render_mode=mode, chunk=256)
    assert int(info["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_d), atol=1e-4)


def test_tiled_matches_dense_nonmultiple_size():
    # width/height not multiples of the tile: cropping path
    cam, g = _scene(64, seed=2, w=50, h=38)
    bg = jnp.zeros(3)
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 50, 38, bg)
    r_d, a_d, _ = render_dense_3dgs(*args)
    r_t, a_t, _ = rasterize_tiled_3dgs(*args, chunk=256)
    assert r_t.shape == (38, 50, 3)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_d), atol=1e-4)


def test_tiled_sh_colors():
    from horizongs_tpu.core.sh import rgb_to_sh
    cam, g = _scene(48, seed=3)
    sh = jnp.concatenate([rgb_to_sh(g["colors"])[:, None, :],
                          0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                                  (48, 3, 3))], axis=1)
    bg = jnp.zeros(3)
    args = (g["means"], g["quats"], g["scales"], g["opacities"], sh,
            cam.viewmat, cam.K, 64, 64, bg)
    r_d, _, _ = render_dense_3dgs(*args, sh_degree=1)
    r_t, _, _ = rasterize_tiled_3dgs(*args, sh_degree=1, chunk=256)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_d), atol=1e-4)


def test_tiled_gradients_match_dense():
    cam, g = _scene(32, seed=4, w=32, h=32)
    bg = jnp.zeros(3)
    target = jnp.zeros((32, 32, 3))

    def loss_dense(means, scales, op, col):
        r, _, _ = render_dense_3dgs(means, g["quats"], scales, op, col,
                                    cam.viewmat, cam.K, 32, 32, bg)
        return jnp.mean((r - target) ** 2)

    def loss_tiled(means, scales, op, col):
        r, _, _ = rasterize_tiled_3dgs(means, g["quats"], scales, op, col,
                                       cam.viewmat, cam.K, 32, 32, bg,
                                       chunk=128)
        return jnp.mean((r - target) ** 2)

    args = (g["means"], g["scales"], g["opacities"], g["colors"])
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    gt = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gd, gt):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-3)


def test_tiled_means2d_probe_grads():
    cam, g = _scene(32, seed=5, w=32, h=32)
    bg = jnp.zeros(3)
    from horizongs_tpu.ops.projection import project_3dgs

    def loss(probe):
        proj = project_3dgs(g["means"], g["quats"], g["scales"],
                            cam.viewmat, cam.K, 32, 32)
        r, _, _ = rasterize_tiled_3dgs(
            g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 32, 32, bg,
            means2d_override=proj.means2d + probe, chunk=128)
        return jnp.sum(r)

    grad = jax.grad(loss)(jnp.zeros((32, 2)))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.sum(jnp.abs(grad))) > 0


def test_overflow_counted_and_bounded():
    cam, g = _scene(256, seed=6)
    bg = jnp.zeros(3)
    r, a, info = rasterize_tiled_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        cam.viewmat, cam.K, 64, 64, bg, chunk=128, cap=128)
    assert int(info["n_dropped"]) > 0     # cap intentionally tiny
    assert np.isfinite(np.asarray(r)).all()


def test_tiled_2dgs_matches_dense():
    cam, g = _scene(64, seed=7)
    bg = jnp.array([0.1, 0.2, 0.3])
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 64, 64, bg)
    out_d = render_dense_2dgs(*args, render_mode="RGB+ED")
    out_t = rasterize_tiled_2dgs(*args, render_mode="RGB+ED", chunk=256)
    r_d, a_d, n_d, nfd_d, dist_d, med_d, _ = out_d
    r_t, a_t, n_t, nfd_t, dist_t, med_t, info = out_t
    np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(n_t), np.asarray(n_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(med_t), np.asarray(med_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dist_t), np.asarray(dist_d),
                               atol=1e-3)


def test_tiled_2dgs_gradients_finite():
    cam, g = _scene(24, seed=8, w=32, h=32)
    bg = jnp.zeros(3)

    def loss(means, scales, op):
        out = rasterize_tiled_2dgs(means, g["quats"], scales, op, g["colors"],
                                   cam.viewmat, cam.K, 32, 32, bg,
                                   render_mode="RGB+ED", chunk=128)
        r, a, n, _, dist, _, _ = out
        return jnp.mean(r ** 2) + jnp.mean(dist) + jnp.mean(n ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(
        g["means"], g["scales"], g["opacities"])
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
