"""Shipped config templates: parse-clean, reference-parity values, and the
quick-start config trains out of the box through the CLI."""
import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "configs")


def _load(rel):
    with open(os.path.join(CONFIGS, rel)) as f:
        return yaml.safe_load(f)


def test_base_templates_parse_with_reference_values():
    from horizongs_tpu.config import parse_cfg
    sc = _load("base/small_scene/coarse.yaml")
    lp, op, pp = parse_cfg(sc)
    assert op.iterations == 60000 and op.update_until == 30000
    assert pp.camera_proportion == "2-1" and pp.aerial_densify

    sf = _load("base/small_scene/fine.yaml")
    _, op, pp = parse_cfg(sf)
    assert op.iterations == 40000 and op.growing_type == "max"
    assert op.densify_grad_threshold == 0.015 and pp.street_densify

    lf = _load("base/large_scene/fine.yaml")
    _, op, pp = parse_cfg(lf)
    assert pp.no_prefilter_step == 10000 and pp.weed_ratio == 0.01

    lg = _load("base/large_scene/global.yaml")
    _, op, pp = parse_cfg(lg)
    assert op.iterations == 30000 and op.appearance_lr_init == 0.05
    assert not pp.aerial_densify and not pp.street_densify


def test_matrix_city_configs_carry_model_params():
    for stage in ("coarse", "fine"):
        cfg = _load(f"matrix_city/block_small/{stage}.yaml")
        kw = cfg["model_params"]["model_config"]["kwargs"]
        assert kw["aerial_levels"] == 3 and kw["street_levels"] == 8
        assert kw["voxel_size"] == 0.001 and kw["n_offsets"] == 10
    assert cfg["model_params"]["pretrained_checkpoint"]  # fine stage


def test_quickstart_trains_through_cli(tmp_path):
    from horizongs_tpu.cli.make_synthetic import main as make_main
    from horizongs_tpu.cli.train import main as train_main

    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    rc = make_main([data, "--n_train", "6", "--n_test", "2",
                    "--width", "48", "--height", "48"])
    assert rc == 0
    rc = train_main(["--config",
                     os.path.join(CONFIGS, "synthetic", "quickstart.yaml"),
                     "--model_path", out, "--source_path", data,
                     "--iterations", "40", "--rasterizer", "tiled",
                     "--disable_tb", "--skip_eval"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_40",
                                       "point_cloud.ply"))

    # the saved config.yaml must carry the RESOLVED paths (the CLI's
    # --source_path/--model_path overrides, not the template defaults):
    # render/metrics/export_mesh reload it to reconstruct the run
    saved = _load(os.path.join(out, "config.yaml"))
    assert saved["model_params"]["source_path"] == data
    assert saved["model_params"]["model_path"] == out
    assert saved["optim_params"]["iterations"] == 40

    from horizongs_tpu.cli.render import main as render_main
    rc = render_main(["--model_path", out, "--iteration", "40",
                      "--skip_train", "--rasterizer", "tiled"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "test", "ours_40", "renders",
                                       "00000.png"))
