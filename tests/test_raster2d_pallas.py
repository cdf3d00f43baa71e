"""Pallas 2DGS rasterizer (interpret mode on CPU) vs dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.raster_pallas import rasterize_pallas_2dgs
from horizongs_tpu.ops.reference import render_dense_2dgs


def _scene(n=96, seed=3, w=64, h=64):
    cam = lookat_camera(width=w, height=h, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=seed, extent=0.8,
                          scale_range=(0.03, 0.12)).items()}
    return cam, g


@pytest.mark.parametrize("mode", ["RGB", "RGB+ED"])
def test_pallas2d_matches_dense(mode):
    cam, g = _scene()
    bg = jnp.array([0.2, 0.3, 0.4])
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 64, 64, bg)
    r_d, a_d, n_d, nfd_d, dist_d, med_d, _ = render_dense_2dgs(
        *args, render_mode=mode)
    r_p, a_p, n_p, nfd_p, dist_p, med_p, info = rasterize_pallas_2dgs(
        *args, render_mode=mode, interpret=True)
    assert int(info["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dist_p), np.asarray(dist_d),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(med_p), np.asarray(med_d),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(nfd_p), np.asarray(nfd_d),
                               atol=5e-4)


def test_pallas2d_gradients_match_dense():
    cam, g = _scene(n=48)
    bg = jnp.zeros(3)

    def mkloss(fn, tuple_out):
        def loss(means, quats, scales, op, col):
            out = fn(means, quats, scales, op, col,
                     cam.viewmat, cam.K, 64, 64, bg, render_mode="RGB+ED")
            r, a, n, nfd, dist, med = out[:6]
            # touch every differentiable output the trainer uses
            return (jnp.mean((r - 0.5) ** 2) + 0.1 * jnp.mean(a)
                    + 0.05 * jnp.mean(n) + 0.02 * jnp.mean(dist)
                    + 0.03 * jnp.mean(med))
        return loss

    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"])
    gd = jax.grad(mkloss(render_dense_2dgs, 7), argnums=(0, 1, 2, 3, 4))(*args)
    loss_p = mkloss(
        lambda *a, **k: rasterize_pallas_2dgs(*a, interpret=True, **k), 7)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("means", "quats", "scales", "op", "col"), gd, gp):
        # atol 1e-4: prefix scans run as triangular matmuls in the kernel
        # vs cumprod in the oracle — f32 association noise, amplified by
        # instances sitting near branch ties (use3d / alpha cutoff)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_pallas2d_nonmultiple_size():
    cam, g = _scene(n=64, w=50, h=38)
    bg = jnp.zeros(3)
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 50, 38, bg)
    r_d, *_ = render_dense_2dgs(*args)
    r_p, *_ = rasterize_pallas_2dgs(*args, interpret=True)
    assert r_p.shape == (38, 50, 3)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_d), atol=2e-4)


def test_pallas2d_render_path():
    """render() dispatches 2DGS to the pallas backend."""
    from horizongs_tpu.models import (ModelConfig, init_mlps,
                                      init_anchor_state_from_points)
    from horizongs_tpu.render import render
    cfg = ModelConfig(name="GaussianLoDModel", feat_dim=8, n_offsets=4,
                      gs_attr="2D", color_attr="RGB", render_mode="RGB+ED",
                      view_dim=0, voxel_size=0.3, fork=2, aerial_levels=2,
                      street_levels=4, standard_dist=8.0)
    g = random_gaussians(40, seed=0, extent=0.8, scale_range=(0.05, 0.2))
    state = init_anchor_state_from_points(cfg, g["means"], capacity=128)
    mlps = init_mlps(jax.random.PRNGKey(0), cfg.feat_dim, cfg.view_dim,
                     cfg.appearance_dim, cfg.n_offsets, cfg.color_dim)
    cam = lookat_camera(width=48, height=48, eye=(0, 0, -4))
    pkg = render(cam, cfg, mlps, state, jnp.zeros(3), add_prefilter=False,
                 rasterizer="pallas_interpret")
    assert pkg["render"].shape == (48, 48, 3)
    assert np.isfinite(np.asarray(pkg["render"])).all()
    assert "render_normals" in pkg and "render_distort" in pkg
