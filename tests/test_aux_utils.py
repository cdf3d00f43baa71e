"""Aux subsystems: viz, fly-through paths, depth tools, viewer protocol,
COLMAP write round-trip, checkpoint resume."""
import json
import os
import socket
import threading

import numpy as np
import pytest


def test_turbo_and_vis():
    from horizongs_tpu.utils.viz import (image_grid, turbo_colormap,
                                         vis_depth, vis_normal)
    t = np.linspace(0, 1, 64)
    rgb = turbo_colormap(t)
    assert rgb.shape == (64, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # turbo ramp: blue-dominant low end -> red-dominant high end
    lo, hi = rgb[len(t) // 10], rgb[-len(t) // 10]
    assert lo[2] > lo[0]
    assert hi[0] > hi[2]

    depth = np.zeros((8, 8))
    depth[2:6, 2:6] = np.linspace(1, 5, 16).reshape(4, 4)
    dv = vis_depth(depth)
    assert dv.shape == (8, 8, 3)
    assert (dv[0, 0] == 0).all()         # invalid pixels black
    nv = vis_normal(np.full((4, 4, 3), -1.0))
    assert np.allclose(nv, 0.0)
    grid = image_grid([np.ones((4, 4, 3)), np.zeros((4, 4, 3))], cols=2)
    assert grid.shape[0] == 4 and grid.shape[1] == 10


def test_flythrough_path():
    from horizongs_tpu.data.synthetic import orbit_cameras
    from horizongs_tpu.utils.render_paths import (
        focus_point, generate_path_cameras, transform_poses_pca)
    cams = orbit_cameras(8, radius=3.0, height_z=-1.0, width=32, height=32)
    c2ws = np.array([np.linalg.inv(np.asarray(c.viewmat)) for c in cams])
    fp = focus_point(c2ws[:, :3, :])
    assert np.linalg.norm(fp) < 1.0       # orbit looks at the origin
    aligned, tf = transform_poses_pca(c2ws[:, :3, :])
    assert np.abs(aligned[:, :3, 3]).max() <= 1.0 + 1e-6

    path = generate_path_cameras(cams, n_frames=12)
    assert len(path) == 12
    for pc in path:
        c2w = np.linalg.inv(np.asarray(pc.viewmat))
        # path cameras look toward the scene: origin projects in front
        fwd = c2w[:3, 2]
        to_origin = -c2w[:3, 3]
        assert fwd @ to_origin > 0


def test_depth_backprojection_roundtrip():
    from horizongs_tpu.data.depth_tools import depth_to_points
    from horizongs_tpu.data.synthetic import lookat_camera
    cam = lookat_camera(width=32, height=32, eye=(0, 0, -4))
    viewmat = np.asarray(cam.viewmat)
    # constant-depth plane at z=4 in camera space
    depth = np.full((32, 32), 4.0)
    pts, _ = depth_to_points(depth, np.asarray(cam.K),
                             np.linalg.inv(viewmat))
    # reproject: all points must land at camera depth 4
    p_cam = pts @ viewmat[:3, :3].T + viewmat[:3, 3]
    np.testing.assert_allclose(p_cam[:, 2], 4.0, atol=1e-4)
    assert pts.shape[0] == 32 * 32


def test_fit_invdepth_scale():
    from horizongs_tpu.data.depth_tools import fit_invdepth_scale
    rng = np.random.default_rng(0)
    H = W = 32
    true_inv = rng.uniform(0.2, 1.0, (H, W))
    scale_true, offset_true = 2.5, 0.1
    mono = (true_inv - offset_true) / scale_true
    pts2d = rng.uniform(0, W - 1, (50, 2))
    u = np.round(pts2d[:, 0]).astype(int)
    v = np.round(pts2d[:, 1]).astype(int)
    sparse_depth = 1.0 / true_inv[v, u]
    out = fit_invdepth_scale(mono, pts2d, sparse_depth)
    fitted = mono * out["scale"] + out["offset"]
    np.testing.assert_allclose(fitted[v, u], true_inv[v, u], rtol=0.15,
                               atol=0.05)


def test_colmap_write_read_roundtrip(tmp_path):
    from horizongs_tpu.data.colmap import (
        ColmapCamera, ColmapImage, read_cameras_binary, read_images_binary,
        read_points3D_binary, write_model)
    cams = {1: ColmapCamera(id=1, model="PINHOLE", width=64, height=48,
                            params=np.array([60.0, 60.0, 32.0, 24.0]))}
    images = {1: ColmapImage(id=1, qvec=np.array([1.0, 0, 0, 0]),
                             tvec=np.array([0.0, 0, 2]), camera_id=1,
                             name="a.png",
                             xys=np.array([[1.0, 2.0]]),
                             point3D_ids=np.array([7], dtype=np.int64))}
    xyz = np.array([[0.0, 0, 1], [1, 2, 3]])
    rgb = np.array([[0.5, 0.2, 0.1], [1.0, 0.0, 0.0]])
    err = np.array([0.1, 0.2])
    out = str(tmp_path / "sparse")
    write_model(cams, images, xyz, rgb, err, out)
    c2 = read_cameras_binary(os.path.join(out, "cameras.bin"))
    i2 = read_images_binary(os.path.join(out, "images.bin"))
    x2, r2, e2 = read_points3D_binary(os.path.join(out, "points3D.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 64
    assert i2[1].name == "a.png"
    np.testing.assert_allclose(i2[1].tvec, [0, 0, 2])
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_allclose(e2, err)


def test_viewer_protocol_roundtrip():
    from horizongs_tpu.viewer.server import ViewerServer
    srv = ViewerServer(port=0)
    port = srv.bound_port

    W = H = 16
    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        view = np.eye(4)
        view[3, 2] = 4.0   # row-vector convention translation
        msg = {"resolution_x": W, "resolution_y": H, "train": False,
               "fov_y": 0.8, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
               "rot_scale_python": False, "keep_alive": True,
               "scaling_modifier": 1.0,
               "view_matrix": list(view.flatten()),
               "view_projection_matrix": list(np.eye(4).flatten())}
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        verify = s.recv(n).decode()
        result["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        result["verify"] = verify
        s.close()

    th = threading.Thread(target=client)
    th.start()
    got = {}
    for _ in range(2000):
        if srv.try_connect():
            cam = srv.receive()
            got.update(cam)
            srv.send_image(np.full((H, W, 3), 0.5), "model_x")
            break
    th.join(timeout=5)
    srv.close()
    assert result["verify"] == "model_x"
    assert (result["img"] == 127).all()
    assert got["width"] == W
    # y/z columns flipped, transposed: translation ends up in viewmat[:3,3]
    assert abs(got["viewmat"][2, 3]) == pytest.approx(4.0)


def test_viewer_poll():
    """In-train poll path: no client -> no-op; client -> one answer."""
    from horizongs_tpu.viewer.server import ViewerServer
    srv = ViewerServer(port=0)
    port = srv.bound_port
    srv.poll(lambda cam: np.zeros((4, 4, 3)), "m")   # no client: no-op

    W = H = 8
    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        msg = {"resolution_x": W, "resolution_y": H, "train": True,
               "fov_y": 0.8, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
               "rot_scale_python": False, "keep_alive": True,
               "scaling_modifier": 1.0,
               "view_matrix": list(np.eye(4).flatten()),
               "view_projection_matrix": list(np.eye(4).flatten())}
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        result["verify"] = s.recv(n).decode()
        s.close()

    th = threading.Thread(target=client)
    th.start()
    import time
    for _ in range(500):
        srv.poll(lambda cam: np.full((cam["height"], cam["width"], 3), 1.0),
                 "mp")
        if result.get("verify"):
            break
        time.sleep(0.01)
    th.join(timeout=5)
    srv.close()
    assert result["verify"] == "mp"


def test_checkpoint_resume_cli(tmp_path):
    """Train 10 iters + checkpoint, resume to 20; state round-trips
    (the reference's capture/restore is broken — SURVEY §4)."""
    import yaml
    from horizongs_tpu.cli.train import main as train_main
    from horizongs_tpu.data.synthetic import write_synthetic_blender_dataset

    data = str(tmp_path / "d")
    write_synthetic_blender_dataset(data, n_train=4, n_test=1,
                                    width=32, height=32)
    cfg = {
        "model_params": {
            "model_config": {"name": "GaussianLoDModel", "kwargs": {
                "fork": 2, "feat_dim": 8, "view_dim": 0, "n_offsets": 4,
                "color_attr": "RGB", "voxel_size": 0.3,
                "render_mode": "RGB+ED", "standard_dist": 8.0,
                "aerial_levels": 2, "street_levels": 3}},
            "dataset_name": "synth", "scene_name": "ckpt",
            "data_format": "blender", "source_path": data, "eval": True,
            "resolution": 1},
        "pipeline_params": {"add_prefilter": False, "weed_ratio": 0.0},
        "optim_params": dict(iterations=20, start_stat=100, update_from=200,
                             update_interval=50, update_until=150),
    }
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    out = str(tmp_path / "out")
    rc = train_main(["--config", cfg_path, "--model_path", out,
                     "--iterations", "10", "--checkpoint_iterations", "10",
                     "--rasterizer", "tiled", "--skip_eval"])
    assert rc == 0
    ckpt = os.path.join(out, "chkpnt10.npz")
    assert os.path.exists(ckpt)
    rc = train_main(["--config", cfg_path, "--model_path", out,
                     "--iterations", "20", "--start_checkpoint", ckpt,
                     "--rasterizer", "tiled", "--skip_eval"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_20",
                                       "point_cloud.ply"))


def test_evaluate_sets_robustness_subsets(tmp_path):
    """UCGS robustness splits are reported as their own result groups
    (reference slices them by camera index at `train.py:542-591`)."""
    import numpy as np
    from horizongs_tpu.train.evaluate import evaluate_sets
    rng = np.random.default_rng(0)
    renders = [rng.random((8, 8, 3), dtype=np.float32) for _ in range(6)]
    gts = [r + rng.normal(0, 0.01 * (1 + i), (8, 8, 3)).astype(np.float32)
           for i, r in enumerate(renders)]
    types = ["aerial", "street"] * 3
    subsets = ["heldout", "heldout", "shift_0.1m", "shift_0.1m",
               "shift_0.1m_rot_5deg", "shift_0.1m_rot_5deg"]
    results = evaluate_sets(str(tmp_path), 10, renders, gts, types,
                            subsets=subsets)
    for key in ("all", "aerial", "street", "heldout", "shift_0.1m",
                "shift_0.1m_rot_5deg"):
        assert key in results and results[key]["n_views"] == (
            6 if key == "all" else 2 if key != "aerial" and key != "street"
            else 3)
    # noisier subsets score lower PSNR, preserving the robustness ordering
    assert results["heldout"]["PSNR"] > results["shift_0.1m_rot_5deg"]["PSNR"]
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "results_test.json"))


def test_lpips_jax_pipeline():
    """JAX LPIPS: zero self-distance, positive cross-distance, symmetry
    (pipeline check with random-initialized weights; real scores need the
    converted pretrained npz, tools/convert_lpips_weights.py)."""
    import numpy as np
    from horizongs_tpu.train.lpips_jax import (
        init_random_weights, lpips_fn, load_weights)
    assert load_weights("/nonexistent/path.npz") is None
    params = init_random_weights(0)
    assert params["conv0_w"].shape == (3, 3, 3, 64)
    assert params["conv12_w"].shape == (3, 3, 512, 512)
    assert params["lin4_w"].shape == (512,)
    fn = lpips_fn(params=params)
    rng = np.random.default_rng(1)
    a = rng.random((64, 64, 3), dtype=np.float32)
    b = rng.random((64, 64, 3), dtype=np.float32)
    daa = float(fn(a, a))
    dab = float(fn(a, b))
    dba = float(fn(b, a))
    assert abs(daa) < 1e-6
    assert dab > 1e-6
    assert abs(dab - dba) < 1e-5
