"""Pallas rasterizer (interpret mode on CPU) vs dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.raster_pallas import rasterize_pallas_3dgs
from horizongs_tpu.ops.reference import render_dense_3dgs


def _scene(n=96, seed=1, w=64, h=64):
    cam = lookat_camera(width=w, height=h, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=seed, extent=0.8,
                          scale_range=(0.03, 0.12)).items()}
    return cam, g


@pytest.mark.parametrize("mode", ["RGB", "RGB+ED"])
def test_pallas_matches_dense(mode):
    cam, g = _scene()
    bg = jnp.array([0.2, 0.3, 0.4])
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 64, 64, bg)
    r_d, a_d, _ = render_dense_3dgs(*args, render_mode=mode)
    r_p, a_p, info = rasterize_pallas_3dgs(*args, render_mode=mode,
                                           interpret=True)
    assert int(info["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_d), atol=2e-5)
    # rtol term for the ED depth channel (values ~scene depth, so pure
    # f32 summation-order noise exceeds a bare 1e-4 atol)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_d), atol=1e-4,
                               rtol=2e-4)


def test_pallas_gradients_match_dense():
    cam, g = _scene(n=48, w=64, h=64)
    bg = jnp.zeros(3)

    def loss_d(means, scales, op, col):
        r, _, _ = render_dense_3dgs(means, g["quats"], scales, op, col,
                                    cam.viewmat, cam.K, 64, 64, bg)
        return jnp.mean((r - 0.5) ** 2)

    def loss_p(means, scales, op, col):
        r, _, _ = rasterize_pallas_3dgs(means, g["quats"], scales, op, col,
                                        cam.viewmat, cam.K, 64, 64, bg,
                                        interpret=True)
        return jnp.mean((r - 0.5) ** 2)

    args = (g["means"], g["scales"], g["opacities"], g["colors"])
    gd = jax.grad(loss_d, argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-7, rtol=1e-4)


def test_pallas_means2d_probe():
    cam, g = _scene(n=32, w=64, h=64)
    bg = jnp.zeros(3)
    from horizongs_tpu.ops.projection import project_3dgs

    def loss(probe):
        proj = project_3dgs(g["means"], g["quats"], g["scales"],
                            cam.viewmat, cam.K, 64, 64)
        r, _, _ = rasterize_pallas_3dgs(
            g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 64, 64, bg,
            means2d_override=proj.means2d + probe, interpret=True)
        return jnp.sum(r)

    grad = jax.grad(loss)(jnp.zeros((32, 2)))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.sum(jnp.abs(grad))) > 0


def test_pallas_nonmultiple_size():
    cam, g = _scene(n=64, w=50, h=38)
    bg = jnp.zeros(3)
    args = (g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
            cam.viewmat, cam.K, 50, 38, bg)
    r_d, _, _ = render_dense_3dgs(*args)
    r_p, _, _ = rasterize_pallas_3dgs(*args, interpret=True)
    assert r_p.shape == (38, 50, 3)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_d), atol=1e-4)


def test_pallas_opacity_cull_consistent():
    # half the gaussians below the alpha cutoff: culled pre-binning, but
    # the render must match the oracle exactly
    cam, g = _scene(n=64)
    op = g["opacities"].at[::2].set(1e-4)
    bg = jnp.zeros(3)
    args = (g["means"], g["quats"], g["scales"], op, g["colors"],
            cam.viewmat, cam.K, 64, 64, bg)
    r_d, _, _ = render_dense_3dgs(*args)
    r_p, _, _ = rasterize_pallas_3dgs(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_d), atol=1e-4)


def test_pallas_saturated_tile_gradients():
    """Early-exit regression: when a tile saturates (T < 1e-4) before its
    instance segment ends, the forward stops early and the backward must
    start its reverse walk at the same chunk — gradients of the visible
    front gaussians must still match the dense oracle, and the occluded
    tail must contribute exactly zero."""
    cam, _ = _scene(n=4, w=64, h=64)
    n = 400  # ~3 chunks stacked in depth over the same few tiles
    rng = np.random.default_rng(7)
    means = np.stack([
        rng.uniform(-0.15, 0.15, n),
        rng.uniform(-0.15, 0.15, n),
        np.linspace(-0.5, 0.5, n)], axis=1).astype(np.float32)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    g = dict(
        means=jnp.asarray(means), quats=jnp.asarray(quats),
        scales=jnp.full((n, 3), 0.08, jnp.float32),
        opacities=jnp.full((n,), 0.95, jnp.float32),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))
    bg = jnp.zeros(3)

    def loss(fn, means, op):
        r, _, _ = fn(means, g["quats"], g["scales"], op, g["colors"],
                     cam.viewmat, cam.K, 64, 64, bg)
        return jnp.mean((r - 0.25) ** 2)

    import functools
    gd = jax.grad(functools.partial(loss, render_dense_3dgs),
                  argnums=(0, 1))(g["means"], g["opacities"])
    gp = jax.grad(functools.partial(
        loss, functools.partial(rasterize_pallas_3dgs, interpret=True)),
        argnums=(0, 1))(g["means"], g["opacities"])
    for a, b in zip(gd, gp):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4)
    # the deep tail is almost fully occluded -> negligible grads
    tail = np.asarray(gp[1][-40:])
    assert np.abs(tail).max() < 1e-5


def test_pallas_overflow_cap_gradients_finite():
    """Instance-cap overflow: dropped slots route to the sentinel zero
    block (binning.grad_slot), so gradients stay finite and the
    rendered/backward outputs only lose the dropped instances — no
    garbage columns leak through the un-sorted gather."""
    import functools
    cam, g = _scene(n=200, w=64, h=64)
    bg = jnp.zeros(3)

    def loss(means, op, cap):
        r, _, info = rasterize_pallas_3dgs(
            means, g["quats"], g["scales"], op, g["colors"],
            cam.viewmat, cam.K, 64, 64, bg, cap=cap, interpret=True)
        return jnp.mean(r ** 2), info["n_dropped"]

    (l_full, d0), grads_full = jax.value_and_grad(
        functools.partial(loss, cap=8192), argnums=(0, 1),
        has_aux=True)(g["means"], g["opacities"])
    assert int(d0) == 0
    # cap far below the real instance count: drops MUST be counted and
    # every gradient must stay finite
    (l_of, dropped), grads_of = jax.value_and_grad(
        functools.partial(loss, cap=256), argnums=(0, 1),
        has_aux=True)(g["means"], g["opacities"])
    assert int(dropped) > 0
    for t in grads_of:
        assert bool(jnp.all(jnp.isfinite(t)))
    assert bool(jnp.isfinite(l_of))
