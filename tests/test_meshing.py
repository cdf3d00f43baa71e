"""TSDF fusion + marching tetrahedra on an analytic sphere."""
import math
import os

import numpy as np
import pytest

from horizongs_tpu.data.synthetic import orbit_cameras
from horizongs_tpu.utils.meshing import (
    fuse_tsdf, largest_component, marching_tetrahedra, read_mesh_ply,
    write_mesh_ply)


def _sphere_depth(cam, radius=0.8):
    """Exact depth map of a sphere at the origin for a camera."""
    H, W = cam.height, cam.width
    K = np.asarray(cam.K)
    viewmat = np.asarray(cam.viewmat)
    R, t = viewmat[:3, :3], viewmat[:3, 3]
    origin = -R.T @ t                      # camera center world
    xs = (np.arange(W) + 0.5 - K[0, 2]) / K[0, 0]
    ys = (np.arange(H) + 0.5 - K[1, 2]) / K[1, 1]
    gx, gy = np.meshgrid(xs, ys)
    dirs_cam = np.stack([gx, gy, np.ones_like(gx)], axis=-1)
    dirs = dirs_cam @ R                    # world rays (R^T applied)
    dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = origin
    b = (dn @ oc)
    c = oc @ oc - radius ** 2
    disc = b * b - c
    hit = disc > 0
    tdist = -b - np.sqrt(np.maximum(disc, 0))
    # depth = z-coordinate in camera space of hit point
    pts = oc[None, None] + tdist[..., None] * dn
    z = (pts @ R.T)[..., 2] + t[2]
    return np.where(hit & (tdist > 0), z, 0.0), hit.astype(np.float64)


def test_tsdf_sphere_reconstruction():
    radius = 0.8
    cams = (orbit_cameras(8, radius=3.0, height_z=0.0, width=96, height=96)
            + orbit_cameras(4, radius=3.0, height_z=-2.0, width=96, height=96)
            + orbit_cameras(4, radius=3.0, height_z=2.0, width=96, height=96))
    depths, alphas, viewmats, Ks = [], [], [], []
    for cam in cams:
        d, a = _sphere_depth(cam, radius)
        depths.append(d)
        alphas.append(a)
        viewmats.append(np.asarray(cam.viewmat))
        Ks.append(np.asarray(cam.K))

    voxel = 0.05
    half = 1.2
    origin = np.array([-half, -half, -half])
    dims = (int(2 * half / voxel),) * 3
    tsdf, weight = fuse_tsdf(depths, alphas, viewmats, Ks, origin, voxel,
                             dims, sdf_trunc=5 * voxel, depth_trunc=10.0)
    assert (weight > 0).any()
    verts, faces = marching_tetrahedra(tsdf, weight, origin, voxel)
    assert verts.shape[0] > 100
    assert faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    # surface vertices lie near the sphere radius
    assert abs(np.median(r) - radius) < 2.5 * voxel
    assert np.quantile(np.abs(r - radius), 0.9) < 4 * voxel

    verts2, faces2 = largest_component(verts, faces)
    assert faces2.shape[0] <= faces.shape[0]
    assert verts2.shape[0] > 50


def test_unbounded_contract_roundtrip():
    from horizongs_tpu.utils.meshing import contract, uncontract
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 3)) * 3.0          # points well outside unit
    y = contract(x)
    assert np.linalg.norm(y, axis=-1).max() < 2.0
    np.testing.assert_allclose(uncontract(y), x, rtol=1e-5, atol=1e-5)
    # identity inside the unit ball
    xin = rng.normal(size=(100, 3)) * 0.3
    np.testing.assert_allclose(contract(xin), xin, atol=1e-12)


def test_unbounded_tsdf_sphere_reconstruction():
    """extract_mesh_unbounded recovers the analytic sphere: the
    contracted-grid fusion + uncontracted vertices land on |x| = r.
    (Reference's extract_mesh_unbounded ships truncated mid-function
    upstream — utils/mesh_utils.py ends at its per-frame SDF helper —
    so this pins OUR complete implementation.)"""
    from horizongs_tpu.utils.meshing import extract_mesh_unbounded
    radius = 0.8
    cams = (orbit_cameras(8, radius=3.0, height_z=0.0, width=96, height=96)
            + orbit_cameras(4, radius=3.0, height_z=-2.0, width=96,
                            height=96)
            + orbit_cameras(4, radius=3.0, height_z=2.0, width=96,
                            height=96))
    depths, alphas, viewmats, Ks, centers = [], [], [], [], []
    for cam in cams:
        d, a = _sphere_depth(cam, radius)
        depths.append(d)
        alphas.append(a)
        viewmats.append(np.asarray(cam.viewmat))
        Ks.append(np.asarray(cam.K))
        centers.append(np.asarray(cam.cam_center))
    verts, faces = extract_mesh_unbounded(depths, alphas, viewmats, Ks,
                                          np.array(centers),
                                          resolution=96)
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts, axis=1)
    # bounding sphere ~ orbit radius 3 with camera-center normalization;
    # contracted voxel near the center ~ (4/96)*r_scene — allow a few
    assert abs(np.median(r) - radius) < 0.12
    assert np.quantile(np.abs(r - radius), 0.9) < 0.2


def test_mesh_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    p = str(tmp_path / "m.ply")
    write_mesh_ply(p, verts, faces)
    v2, f2 = read_mesh_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_marching_tets_analytic_sphere_sdf():
    # direct SDF (no fusion): verts on |x| = r
    n = 40
    xs = np.linspace(-1, 1, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    r = 0.6
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - r
    voxel = xs[1] - xs[0]
    origin = np.array([-1 - voxel / 2, -1 - voxel / 2, -1 - voxel / 2])
    verts, faces = marching_tetrahedra(sdf.astype(np.float32), None,
                                       origin, voxel)
    assert verts.shape[0] > 200
    rr = np.linalg.norm(verts, axis=1)
    assert np.abs(rr - r).max() < voxel
