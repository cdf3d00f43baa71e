"""2DGS end-to-end: training with normal/distortion losses + mesh export."""
import os

import numpy as np
import pytest
import yaml

from horizongs_tpu.data.synthetic import write_synthetic_blender_dataset

W = H = 48


def test_2dgs_train_and_mesh_export(tmp_path):
    from horizongs_tpu.cli.train import main as train_main
    from horizongs_tpu.cli.export_mesh import main as mesh_main
    from horizongs_tpu.utils.meshing import read_mesh_ply

    data = str(tmp_path / "data")
    write_synthetic_blender_dataset(data, n_train=6, n_test=1,
                                    width=W, height=H)
    out = str(tmp_path / "out")
    cfg = {
        "model_params": {
            "model_config": {"name": "GaussianLoDModel", "kwargs": {
                "fork": 2, "gs_attr": "2D", "color_attr": "RGB",
                "feat_dim": 16, "view_dim": 3, "appearance_dim": 0,
                "n_offsets": 4, "voxel_size": 0.3, "render_mode": "RGB+ED",
                "standard_dist": 8.0, "aerial_levels": 2,
                "street_levels": 4}},
            "dataset_name": "synth", "scene_name": "tiny2d",
            "data_format": "blender", "source_path": data,
            "add_mask": False, "add_depth": False, "eval": True,
            "resolution": 1, "scale": 1.0, "center": [0, 0, 0]},
        "pipeline_params": {
            "camera_balance": True, "camera_proportion": "2-1",
            "aerial_densify": True, "street_densify": False,
            "weed_ratio": 0.0, "add_prefilter": False,
            "vis_step": 5000, "no_prefilter_step": 0},
        "optim_params": dict(
            iterations=40, start_stat=5, update_from=15, update_interval=10,
            update_until=35, feature_lr=0.03, mlp_color_lr_init=0.02,
            lambda_dreg=0.0, lambda_sky_opa=0.0, lambda_opacity_entropy=0.0,
            lambda_normal=0.05, normal_start_iter=10,
            lambda_dist=0.01, dist_start_iter=10),
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    rc = train_main(["--config", cfg_path, "--model_path", out,
                     "--rasterizer", "tiled", "--skip_eval"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_40",
                                       "point_cloud.ply"))

    rc = mesh_main(["-m", out, "--rasterizer", "tiled", "--resolution", "48",
                    "--use_median_depth"])
    assert rc == 0
    mesh_path = os.path.join(out, "mesh_iteration_40.ply")
    assert os.path.exists(mesh_path)
    verts, faces = read_mesh_ply(mesh_path)
    assert np.isfinite(verts).all()
