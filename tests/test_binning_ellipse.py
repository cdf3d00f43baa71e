"""Ellipse-mode tile binning: lossless w.r.t. the alpha cutoff, tighter
than the circle mode, and consistent with the capacity counter.

The ellipse test (`binning.build_tile_instances(conics=..., opacities=...)`)
must keep every (gaussian, tile) pair where any pixel center evaluates to
alpha >= 1/255 (otherwise the compositor would drop a real contribution),
while enumerating no more instances than the rect-circle mode.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.ops.binning import (
    build_tile_instances,
    count_tile_instances,
    cull_radius,
    ellipse_extents,
)
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians

W, H = 128, 96
TILE = 16
NTX, NTY = W // TILE, H // TILE


@pytest.fixture(scope="module")
def scene():
    cam = lookat_camera(width=W, height=H, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(120, seed=7, extent=0.9,
                          scale_range=(0.01, 0.4)).items()}  # anisotropic
    proj = project_3dgs(g["means"], g["quats"], g["scales"], cam.viewmat,
                        cam.K, W, H)
    radii = jnp.where(g["opacities"] >= 1 / 255.0,
                      cull_radius(proj.radii, g["opacities"]), 0.0)
    return g, proj, radii


def _hit_tiles(inst, n_tiles):
    """Set of (gauss, tile) pairs the binning kept."""
    gid = np.asarray(inst.gauss_id)
    tid = np.asarray(inst.tile_id)
    keep = tid < n_tiles
    return set(zip(gid[keep].tolist(), tid[keep].tolist()))


def test_ellipse_lossless_and_tighter(scene):
    g, proj, radii = scene
    cap = 4096
    circle = build_tile_instances(proj.means2d, radii, proj.depths,
                                  NTX, NTY, TILE, TILE, cap)
    ellipse = build_tile_instances(proj.means2d, radii, proj.depths,
                                   NTX, NTY, TILE, TILE, cap,
                                   conics=proj.conics,
                                   opacities=g["opacities"])
    assert int(circle.n_dropped) == 0 and int(ellipse.n_dropped) == 0
    hits_c = _hit_tiles(circle, NTX * NTY)
    hits_e = _hit_tiles(ellipse, NTX * NTY)
    # tighter: the ellipse never keeps a pair the circle culled
    assert hits_e <= hits_c
    assert len(hits_e) < len(hits_c)   # anisotropic scene: strictly fewer

    # lossless: every pixel-center with alpha >= cutoff lies in a kept tile
    means2d = np.asarray(proj.means2d)
    conics = np.asarray(proj.conics)
    ops = np.asarray(g["opacities"])
    xs = (np.arange(W) + 0.5)[None, :]
    ys = (np.arange(H) + 0.5)[:, None]
    for i in range(means2d.shape[0]):
        if float(radii[i]) <= 0:
            continue
        a, b, c = conics[i]
        dx = xs - means2d[i, 0]
        dy = ys - means2d[i, 1]
        sigma = 0.5 * a * dx * dx + b * dx * dy + 0.5 * c * dy * dy
        alpha = ops[i] * np.exp(-sigma)
        py, px = np.nonzero(alpha >= 1 / 255.0)
        for t in set(zip((py // TILE).tolist(), (px // TILE).tolist())):
            tile = t[0] * NTX + t[1]
            assert (i, tile) in hits_e, (i, tile)


def test_count_matches_build(scene):
    g, proj, radii = scene
    n = count_tile_instances(proj.means2d, radii, NTX, NTY, TILE, TILE,
                             conics=proj.conics, opacities=g["opacities"])
    inst = build_tile_instances(proj.means2d, radii, proj.depths,
                                NTX, NTY, TILE, TILE, 4096,
                                conics=proj.conics,
                                opacities=g["opacities"])
    assert int(n) == int(inst.n_instances)


def test_ellipse_extents_bounded_by_circle(scene):
    g, proj, radii = scene
    rx, ry, tau = ellipse_extents(proj.conics, g["opacities"])
    r = np.asarray(cull_radius(proj.radii, g["opacities"]))
    keep = np.asarray(radii) > 0
    assert np.all(np.asarray(rx)[keep] <= r[keep] * (1 + 1e-4))
    assert np.all(np.asarray(ry)[keep] <= r[keep] * (1 + 1e-4))
    assert np.all(np.asarray(tau)[keep] >= 0)


def test_suggest_instance_cap_buckets():
    from horizongs_tpu.ops.raster_pallas import G, suggest_instance_cap
    # G-aligned, >= margin * n, bounded overhead, monotone
    prev = 0
    for n in (1, 100, 5_000, 123_456, 1_000_000, 7_777_777):
        cap = suggest_instance_cap(n, margin=1.25)
        assert cap % G == 0
        assert cap >= 1.25 * n
        assert cap <= 1.25 * n * 1.095 + G  # <=~9% bucket spacing + align
        assert cap >= prev
        prev = cap
    # bucketing: nearby counts share a capacity (bounds recompiles)
    assert (suggest_instance_cap(100_000) == suggest_instance_cap(101_000))
