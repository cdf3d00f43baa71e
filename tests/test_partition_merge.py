"""Chunk partitioning + merge pipeline tests."""
import json
import os

import numpy as np
import pytest

from horizongs_tpu.data.partition import (
    CamGeom, bbox_corners, estimate_lod_params, hull_coverage,
    point_in_image, run_partition)
from horizongs_tpu.data.readers import BasicPointCloud
from horizongs_tpu.data.synthetic import write_synthetic_blender_dataset


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part_data"))
    write_synthetic_blender_dataset(path, n_train=8, n_test=2,
                                    width=48, height=48)
    from horizongs_tpu.data.readers import read_blender_scene
    info = read_blender_scene(path, eval=False)
    return path, info


def test_point_in_image_and_hull(scene):
    path, info = scene
    cam = CamGeom(info.train_cameras[0], 0)
    pts = info.point_cloud.points
    proj, depths, mask = point_in_image(cam, pts)
    assert mask.sum() > 0
    assert (depths > 0).all()
    assert (proj[:, 0] >= 0).all() and (proj[:, 0] < cam.width).all()
    # hull of the cloud's bbox corners covers a substantial image fraction
    corners = bbox_corners(pts)
    cproj, _, _ = point_in_image(cam, corners)
    assert cproj.shape[0] > 3
    rate = hull_coverage(list(cproj), cam.width, cam.height)
    assert 0.0 < rate <= 1.0


def test_hull_coverage_full_frame():
    # hull covering the whole image -> rate 1
    pts = [(-10, -10), (100, -10), (100, 100), (-10, 100)]
    assert hull_coverage(pts, 48, 48) == pytest.approx(1.0)
    # degenerate tiny hull
    assert hull_coverage([(1, 1), (2, 1), (1, 2)], 48, 48) < 0.01


def _city_like_scene(n_cams_x=6, extent=4.0, n_pts=400, seed=0):
    """Aerial cameras on a grid above a spread-out cloud, looking down —
    the geometry the VastGaussian partitioner expects."""
    from horizongs_tpu.data.readers import CameraInfo
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-extent, -extent / 2, -0.5],
                      [extent, extent / 2, 0.5], size=(n_pts, 3))
    pcd = BasicPointCloud(pts.astype(np.float32),
                          rng.random((n_pts, 3)).astype(np.float32),
                          np.zeros((n_pts, 3), np.float32))
    infos = []
    fov = np.radians(70.0)
    for i in range(n_cams_x):
        for j in range(3):
            eye = np.array([-extent * 0.9 + 2 * extent * 0.9 * i / (n_cams_x - 1),
                            -extent / 2 * 0.8 + extent * 0.8 * j / 2,
                            -3.0])
            fwd = np.array([0.0, 0.0, 1.0])
            right = np.array([1.0, 0.0, 0.0])
            down = np.cross(fwd, right)
            R_c2w = np.stack([right, down, fwd], axis=1)
            T = -R_c2w.T @ eye
            infos.append(CameraInfo(
                uid=len(infos), R=R_c2w, T=T, fovx=fov, fovy=fov,
                cx=24, cy=24, width=48, height=48,
                image_path=f"/fake/aerial/img_{i}_{j}.png",
                image_name=f"img_{i}_{j}"))
    return pcd, infos


def test_run_partition_outputs(tmp_path):
    pcd, infos = _city_like_scene()
    out = str(tmp_path / "chunks")
    parts = run_partition(pcd, infos, 2, 1, out, source_path="/fake",
                          overlap_area=0.2, visible_rate=0.05)
    assert set(parts.keys()) == {"0_0", "1_0"}
    meta_path = os.path.join(out, "partitions.json")
    with open(meta_path) as f:
        meta = json.load(f)
    total_cams = 0
    for cid in ("0_0", "1_0"):
        cdir = os.path.join(out, cid)
        assert os.path.exists(os.path.join(cdir, "points3d.ply"))
        total_cams += meta["chunks"][cid]["n_cameras"]
        assert meta["chunks"][cid]["n_points"] > 0
        assert meta["chunks"][cid]["n_cameras"] > 0
    # overlap + visibility borrowing may duplicate cameras across chunks
    assert total_cams >= len(infos)
    # true bounds tile the point bbox without overlap on the split axis
    tb0 = meta["chunks"]["0_0"]["true_bounds"][0]
    tb1 = meta["chunks"]["1_0"]["true_bounds"][0]
    assert tb0[1] <= tb1[0] + 1e-6


def test_estimate_lod_params(scene):
    path, info = scene
    cams = [CamGeom(c, i) for i, c in enumerate(info.train_cameras)]
    pts = info.point_cloud.points
    lod = estimate_lod_params(pts, cams, fork=2)
    assert lod["standard_dist"] > 0
    assert lod["aerial_levels"] >= 1
    assert lod["street_levels"] > lod["aerial_levels"] - 1


def test_consolidate_chunks(tmp_path):
    """Two fake trained chunks -> merged explicit PLY cropped to true
    bounds."""
    import jax
    from horizongs_tpu.models import ModelConfig, init_anchor_state_from_points
    from horizongs_tpu.models.factory import new_mlps
    from horizongs_tpu.models.explicit import bake_explicit
    from horizongs_tpu.io.checkpoints import (
        save_explicit_ply, load_explicit_ply)
    from horizongs_tpu.parallel.chunks import consolidate_chunks

    cfg = ModelConfig(name="GaussianLoDModel", feat_dim=8, n_offsets=4,
                      view_dim=0, color_attr="SH1", voxel_size=0.2,
                      fork=2, aerial_levels=2, street_levels=3,
                      standard_dist=8.0)
    rng = np.random.default_rng(0)
    chunk_dirs = {}
    meta = {"chunks": {}}
    for i, cid in enumerate(("0_0", "1_0")):
        # chunk i owns x in [i-1, i)
        pts = rng.uniform([-1 + i - 0.2, -1, -1], [i + 0.2, 1, 1],
                          size=(60, 3)).astype(np.float32)
        state = init_anchor_state_from_points(cfg, pts, capacity=512)
        state = state._replace(feat=0.3 * jax.random.normal(
            jax.random.PRNGKey(i), state.feat.shape))
        arrays = bake_explicit(cfg, new_mlps(cfg, seed=i), state)
        mdir = str(tmp_path / cid)
        it_dir = os.path.join(mdir, "point_cloud", "iteration_30")
        os.makedirs(it_dir)
        save_explicit_ply(os.path.join(it_dir, "point_cloud_explicit.ply"),
                          cfg, arrays)
        chunk_dirs[cid] = mdir
        meta["chunks"][cid] = {
            "true_bounds": [[i - 1.0, float(i)], [-1.0, 1.0]],
            "bounds": [[i - 1.2, i + 0.2], [-1.0, 1.0]]}

    merged_dir = str(tmp_path / "merged")
    path = consolidate_chunks(chunk_dirs, meta, merged_dir, cfg)
    arrays, info = load_explicit_ply(path)
    xyz = arrays["xyz"]
    assert xyz.shape[0] > 0
    # everything within the union of true bounds
    assert (xyz[:, 0] >= -1.0 - 1e-5).all() and (xyz[:, 0] <= 1.0 + 1e-5).all()
    assert info["standard_dist"] == pytest.approx(8.0)
    # no gaussian from chunk 0 beyond x=0 boundary + none from chunk 1 below
    # (crop to true bounds removes the overlap duplicates)
    # renderable end-to-end:
    from horizongs_tpu.models.explicit import (
        explicit_state_from_arrays, render_explicit)
    from horizongs_tpu.data.synthetic import lookat_camera
    import jax.numpy as jnp
    est = explicit_state_from_arrays(arrays)
    cam = lookat_camera(width=32, height=32, eye=(0, 0, -4))
    pkg = render_explicit(cam, cfg, est, jnp.zeros(3), rasterizer="tiled")
    assert np.isfinite(np.asarray(pkg["render"])).all()


def test_consolidate_chunks_streaming_many(tmp_path):
    """12 chunks through the streaming merger (peak memory = one chunk):
    exact row conservation — every in-bounds row appears exactly once,
    overlap rows are cropped, and the streamed header count matches."""
    from horizongs_tpu.models import ModelConfig
    from horizongs_tpu.io.checkpoints import (
        save_explicit_ply, load_explicit_ply)
    from horizongs_tpu.parallel.chunks import consolidate_chunks

    cfg = ModelConfig(name="GaussianModel", feat_dim=8, n_offsets=4,
                      view_dim=0, color_attr="SH1", voxel_size=0.2)
    rng = np.random.default_rng(1)
    chunk_dirs = {}
    meta = {"chunks": {}}
    n_in, n_out = 50, 20
    for i in range(12):
        cid = f"{i}_0"
        x_in = rng.uniform(i, i + 1, size=(n_in,))
        x_out = rng.uniform(i + 1, i + 1.3, size=(n_out,))  # overlap spill
        x = np.concatenate([x_in, x_out])
        n = x.shape[0]
        xyz = np.stack([x, rng.uniform(-1, 1, n),
                        rng.uniform(-1, 1, n)], axis=1).astype(np.float32)
        arrays = {
            "xyz": xyz,
            "features": rng.normal(size=(n, 4, 3)).astype(np.float32),
            "opacity": rng.uniform(0, 1, n).astype(np.float32),
            "scaling": rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32),
            "rotation": np.tile([1.0, 0, 0, 0],
                                (n, 1)).astype(np.float32),
            "level": np.zeros(n, np.int32),
            "extra_level": np.zeros(n, np.float32)}
        mdir = str(tmp_path / cid)
        it_dir = os.path.join(mdir, "point_cloud", "iteration_10")
        os.makedirs(it_dir)
        save_explicit_ply(os.path.join(it_dir, "point_cloud_explicit.ply"),
                          cfg, arrays)
        chunk_dirs[cid] = mdir
        meta["chunks"][cid] = {
            "true_bounds": [[float(i), float(i + 1)], [-1.0, 1.0]],
            "bounds": [[i - 0.3, i + 1.3], [-1.0, 1.0]]}

    path = consolidate_chunks(chunk_dirs, meta, str(tmp_path / "merged"),
                              cfg)
    merged, _ = load_explicit_ply(path)
    # each chunk is cropped to its OWN true bounds: the 50 in-bounds
    # rows survive exactly once, the 20 spill rows (owned by the next
    # chunk, which trains its own copies) are dropped
    assert merged["xyz"].shape[0] == 12 * n_in
    xs = merged["xyz"][:, 0]
    assert xs.min() >= 0.0 and xs.max() <= 12.0 + 1e-5
