"""Real multi-process (simulated multi-host) execution of the band-
sharded training step: 2 processes x 4 CPU devices over a localhost
coordinator, global 4x2 (data x model) mesh, compared step-for-step with
the same scenario on the single-process 8-device mesh.

This is the SURVEY.md §4 multi-host test strategy executed for real —
`jax.distributed.initialize` bring-up through the product path
(`maybe_init_distributed`), cross-process record exchange + halo
ppermutes over the Gloo CPU collectives, and per-process camera-batch
agreement. The reference has no multi-host code at all (SURVEY.md §2.3).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


STEPS = 10


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    """Launch the 2-process run once; both tests read its artifacts."""
    out_dir = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    outs = [str(out_dir / f"proc{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_DIR, "mp_worker.py"),
         str(i), "2", str(port), outs[i], "4", str(STEPS)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{logs[i][-4000:]}")
    return [json.load(open(o)) for o in outs]


def test_two_process_band_step_runs_and_agrees(mp_results):
    r0, r1 = mp_results
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["n_global_devices"] == 8
    # per-process camera-batch agreement: same seed => same picks
    assert r0["picks"] == r1["picks"]
    # both processes observe the identical (replicated) loss stream
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert np.isfinite(r0["losses"]).all()
    # training makes progress across the 10 steps
    assert r0["losses"][-1] < r0["losses"][0]


def test_two_process_full_trainer_cli(tmp_path):
    """The COMPLETE product path across 2 processes: train CLI with
    --mesh 4x2 on the global mesh — Scene build per process, band-sharded
    steps with cross-process collectives, device-resident densify epochs
    (decision arrays process_allgather-ed), a coordinated orbax sharded
    checkpoint into one shared directory, and end-of-run evaluation.
    This is multi-host *training* (not just the step) executed for real."""
    import yaml

    from horizongs_tpu.data.synthetic import write_synthetic_blender_dataset

    dataset = str(tmp_path / "data")
    write_synthetic_blender_dataset(dataset, n_train=6, n_test=2,
                                    width=48, height=48)
    cfg = {
        "model_params": {
            "model_config": {"name": "GaussianLoDModel", "kwargs": {
                "fork": 2, "gs_attr": "3D", "color_attr": "RGB",
                "feat_dim": 16, "view_dim": 3, "appearance_dim": 0,
                "n_offsets": 4, "voxel_size": 0.3,
                "render_mode": "RGB+ED", "standard_dist": 8.0,
                "aerial_levels": 2, "street_levels": 4}},
            "dataset_name": "synth", "scene_name": "tiny_mp",
            "data_format": "blender", "source_path": dataset,
            "add_mask": False, "add_depth": False, "eval": True,
            "resolution": 1, "scale": 1.0, "center": [0, 0, 0]},
        "pipeline_params": {
            "camera_balance": True, "camera_proportion": "2-1",
            "aerial_densify": True, "street_densify": False,
            "weed_ratio": 0.0, "add_prefilter": False,
            "vis_step": 5000, "no_prefilter_step": 0},
        "optim_params": dict(
            iterations=40, start_stat=5, update_from=10,
            update_interval=10, update_until=35, feature_lr=0.03,
            mlp_color_lr_init=0.02, lambda_dreg=0.0, lambda_sky_opa=0.0,
            lambda_opacity_entropy=0.0, densify_grad_threshold=0.0002),
    }
    with open(os.path.join(dataset, "mp_config.yaml"), "w") as f:
        yaml.dump(cfg, f)
    model_path = str(tmp_path / "mp_out")

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    outs = [str(tmp_path / f"trainer{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_DIR, "mp_worker.py"),
         str(i), "2", str(port), outs[i], "4", "40", "trainer",
         dataset, model_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"trainer worker {i} failed (rc={p.returncode}):\n"
            f"{logs[i][-6000:]}")
    results = [json.load(open(o)) for o in outs]
    assert all(r["rc"] == 0 for r in results)
    assert all(r["process_count"] == 2 for r in results)
    psnr = results[0]["results"]["ours_40"]["all"]["PSNR"]
    assert psnr > 20.0, f"multi-process training quality too low: {psnr}"
    # the coordinated sharded checkpoint exists in the shared dir
    assert os.path.isdir(os.path.join(model_path, "chkpnt40_sharded"))


def test_two_process_matches_single_process(mp_results):
    """The 2-process 4x2 run reproduces the single-process 8-device run:
    same losses, same final parameter/optimizer/stats checksums."""
    sys.path.insert(0, _DIR)
    import mp_worker

    from horizongs_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=mp_worker.N_DATA, model=mp_worker.N_MODEL)
    ref = mp_worker.run_steps(mesh, STEPS)

    r0 = mp_results[0]
    assert ref["picks"] == r0["picks"]
    np.testing.assert_allclose(r0["losses"], ref["losses"],
                               rtol=1e-5, atol=1e-7)
    for k, v in ref["checks"].items():
        assert r0["checks"][k] == pytest.approx(v, rel=1e-4), k
