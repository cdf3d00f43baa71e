"""Parity goldens: closed-form analytic renders + a committed pinned-scene
golden file, asserted against every rasterization backend.

The round-1 review noted parity was argued only against the repo's own
f32 oracle. These tests add two *external* anchors (BASELINE.md quality
bar "renders/grads allclose to the gsplat reference", which cannot run
in this environment):

1. Analytic goldens — scenes simple enough that the exact gsplat-v1.x
   rendering equations (perspective EWA + eps2d low-pass, alpha
   compositing with the 1/255 cutoff and 0.999 clamp; 2DGS ray-splat
   intersection with the min(rho3d, 2*d^2) filter) have a closed form,
   evaluated here independently in float64 numpy. Any backend or oracle
   deviation from the published math fails immediately.
2. A pinned-scene golden npz committed to the repo
   (`tests/goldens/scene32.npz`, generated once by
   `tools/make_goldens.py`) — freezes today's verified numerics so any
   future refactor that silently shifts renders or input gradients
   fails against the committed file.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.raster import rasterize_tiled_2dgs, rasterize_tiled_3dgs
from horizongs_tpu.ops.raster_pallas import (
    rasterize_pallas_2dgs, rasterize_pallas_3dgs)
from horizongs_tpu.ops.reference import render_dense_2dgs, render_dense_3dgs

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "scene32.npz")
W = H = 64


def _center_cam():
    return lookat_camera(width=W, height=H, eye=(0.0, 0.0, -4.0))


def _analytic_isotropic(cam, zs, scales, opacities, colors, bg,
                        eps2d=0.3):
    """Exact render of gaussians on the optical axis (project to the
    image center with isotropic screen covariance (f*s/z)^2 + eps2d),
    composited front-to-back in float64."""
    fx = float(cam.K[0, 0])
    cx, cy = float(cam.K[0, 2]), float(cam.K[1, 2])
    px = np.arange(W, dtype=np.float64) + 0.5
    py = np.arange(H, dtype=np.float64) + 0.5
    d2 = ((px[None, :] - cx) ** 2 + (py[:, None] - cy) ** 2)  # (H, W)

    order = np.argsort(zs)
    T = np.ones((H, W))
    color = np.zeros((H, W, 3))
    alpha_sum = np.zeros((H, W))
    for i in order:
        var = (fx * scales[i] / zs[i]) ** 2 + eps2d
        a = opacities[i] * np.exp(-0.5 * d2 / var)
        a = np.minimum(a, 0.999)
        a = np.where(a >= 1.0 / 255.0, a, 0.0)
        w = np.where(T > 1e-4, a * T, 0.0)
        color += w[..., None] * np.asarray(colors[i])[None, None, :]
        alpha_sum += w
        T = T * np.where(w > 0, 1.0 - a, 1.0)
    render = color + T[..., None] * np.asarray(bg)[None, None, :]
    return render, alpha_sum


def _axis_scene(n, base_z=4.0, dz=0.5, s=0.25):
    """n isotropic gaussians strung along the optical axis (world z:
    cam at -4 looking +z, so world z=t sits at depth 4+t)."""
    zs = np.array([base_z + dz * (i - (n - 1) / 2) for i in range(n)])
    means = np.stack([np.zeros(n), np.zeros(n), zs - 4.0], axis=-1)
    quats = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    scales = np.full((n, 3), s)
    opac = np.linspace(0.6, 0.9, n)
    colors = np.linspace([0.9, 0.2, 0.1], [0.1, 0.4, 0.9], n)
    return zs, means, quats, scales, opac, colors


@pytest.mark.parametrize("backend", ["oracle", "scan", "pallas"])
@pytest.mark.parametrize("n", [1, 3])
def test_analytic_3dgs(backend, n):
    """Every 3DGS backend reproduces the float64 closed form of the
    gsplat rendering equations on axis-aligned scenes (single splat and
    a 3-splat compositing stack)."""
    cam = _center_cam()
    zs, means, quats, scales, opac, colors = _axis_scene(n)
    bg = np.array([0.15, 0.25, 0.35])
    golden, golden_alpha = _analytic_isotropic(
        cam, zs, scales[:, 0], opac, colors, bg)

    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors), cam.viewmat, cam.K,
            W, H, jnp.asarray(bg))
    if backend == "oracle":
        render, alphas, _ = render_dense_3dgs(*args)
    elif backend == "scan":
        render, alphas, _ = rasterize_tiled_3dgs(*args)
    else:
        render, alphas, info = rasterize_pallas_3dgs(*args, interpret=True)
        assert int(info["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(render), golden, atol=1e-4)
    np.testing.assert_allclose(np.asarray(alphas)[..., 0], golden_alpha,
                               atol=1e-4)


def _analytic_2dgs_surfel(cam, z, s0, s1, opacity, color, bg):
    """Exact render of one camera-facing surfel at depth z: ray-splat
    intersection uv = ((px-cx) z / fx / s0, (py-cy) z / fy / s1) up to
    tangent-axis sign (rho only needs u^2+v^2), with the screen-space
    low-pass rho = min(rho3d, 2 * d^2)."""
    fx, fy = float(cam.K[0, 0]), float(cam.K[1, 1])
    cx, cy = float(cam.K[0, 2]), float(cam.K[1, 2])
    px = np.arange(W, dtype=np.float64) + 0.5
    py = np.arange(H, dtype=np.float64) + 0.5
    dx = px[None, :] - cx
    dy = py[:, None] - cy
    u = dx * z / fx / s0
    v = dy * z / fy / s1
    rho3d = u * u + v * v
    rho2d = 2.0 * (dx * dx + dy * dy)
    rho = np.minimum(rho3d, rho2d)
    a = np.minimum(opacity * np.exp(-0.5 * rho), 0.999)
    a = np.where(a >= 1.0 / 255.0, a, 0.0)
    render = (a[..., None] * np.asarray(color)[None, None, :]
              + (1.0 - a)[..., None] * np.asarray(bg)[None, None, :])
    return render, a


@pytest.mark.parametrize("backend", ["oracle", "scan", "pallas"])
def test_analytic_2dgs(backend):
    cam = _center_cam()
    s0, s1, z, op = 0.35, 0.2, 4.0, 0.85
    color = np.array([0.7, 0.3, 0.5])
    bg = np.array([0.1, 0.2, 0.3])
    golden, golden_alpha = _analytic_2dgs_surfel(cam, z, s0, s1, op,
                                                 color, bg)
    means = jnp.zeros((1, 3))
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    scales = jnp.asarray([[s0, s1, 1.0]])
    args = (means, quats, scales, jnp.asarray([op]),
            jnp.asarray(color)[None], cam.viewmat, cam.K, W, H,
            jnp.asarray(bg))
    if backend == "oracle":
        out = render_dense_2dgs(*args)
    elif backend == "scan":
        out = rasterize_tiled_2dgs(*args)
    else:
        out = rasterize_pallas_2dgs(*args, interpret=True)
    render, alphas = out[0], out[1]
    np.testing.assert_allclose(np.asarray(render), golden, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alphas)[..., 0], golden_alpha,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# committed pinned-scene golden
# ---------------------------------------------------------------------------

def _pinned_scene():
    cam = lookat_camera(width=32, height=32, eye=(0.4, -0.3, -3.6))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(64, seed=7, extent=0.8,
                          scale_range=(0.04, 0.15)).items()}
    bg = jnp.array([0.2, 0.3, 0.4])
    return cam, g, bg


def _grads_3dgs(rasterize, cam, g, bg, **kw):
    def loss(means, scales, op, col):
        r = rasterize(means, g["quats"], scales, op, col, cam.viewmat,
                      cam.K, 32, 32, bg, **kw)[0]
        return jnp.mean((r - 0.5) ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        g["means"], g["scales"], g["opacities"], g["colors"])


@pytest.mark.parametrize("backend", ["oracle", "scan", "pallas"])
def test_pinned_scene_golden(backend):
    """Renders and input gradients of the pinned 32x32 scene match the
    committed golden file (regenerate deliberately with
    `python tools/make_goldens.py` and justify the diff)."""
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file not generated yet")
    gold = np.load(GOLDEN_PATH)
    cam, g, bg = _pinned_scene()
    fns = {"oracle": render_dense_3dgs, "scan": rasterize_tiled_3dgs,
           "pallas": rasterize_pallas_3dgs}
    kw = {"interpret": True} if backend == "pallas" else {}
    render, alphas, _ = fns[backend](
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        cam.viewmat, cam.K, 32, 32, bg, **kw)
    np.testing.assert_allclose(np.asarray(render), gold["render"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(alphas), gold["alphas"],
                               atol=2e-4)
    grads = _grads_3dgs(fns[backend], cam, g, bg, **kw)
    for name, got in zip(["means", "scales", "opacities", "colors"], grads):
        want = gold[f"grad_{name}"]
        scale = np.abs(want).max() or 1.0
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=2e-4 * scale)
