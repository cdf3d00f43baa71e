"""Converged-quality evidence for the sharded trainer (r3 VERDICT #6):
train the synthetic quickstart scene through the REAL train CLI twice —
single-device and band-sharded on a 4x2 virtual mesh — for enough steps
to pass every densify cycle of the schedule plus a long post-densify
tail, then compare final test PSNR and the anchor-count trajectory.

Step-level parity (tests/test_parallel.py, 1e-5) makes divergence
unlikely; this turns it into a measured fact at training length.
`--tpu` runs the same schedule once on the real chip at a 1x1 mesh to
pin hardware behavior (numerics + densify/recalibration interplay).

Usage:
  python tools/convergence_check.py [--iterations 2000]
  python tools/convergence_check.py --tpu     # real-chip 1x1-mesh run
Writes/merges CONVERGENCE.json.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TPU = "--tpu" in sys.argv

if not _TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU:
    jax.config.update("jax_platforms", "cpu")


def anchors_from_log(model_path):
    path = os.path.join(model_path, "outputs.log")
    traj = []
    if os.path.exists(path):
        for line in open(path):
            m = re.search(r"\[it\s*(\d+)\] .*anchors=(\d+)", line)
            if m:
                traj.append((int(m.group(1)), int(m.group(2))))
    return traj


def run_one(label, scene, cfg_path, iterations, extra, workdir):
    from horizongs_tpu.cli.train import main as train_main
    mp = os.path.join(workdir, label)
    train_main(["--config", cfg_path, "--model_path", mp,
                "--source_path", scene,
                "--iterations", str(iterations),
                "--disable_tb"] + extra)
    res_path = os.path.join(mp, "results_test.json")
    results = json.load(open(res_path)) if os.path.exists(res_path) else {}
    key = next(iter(results)) if results else None
    psnr = (results.get(key, {}).get("all", {}).get("PSNR")
            if key else None)
    traj = anchors_from_log(mp)
    print(f"{label}: test PSNR={psnr} final anchors="
          f"{traj[-1][1] if traj else None}")
    return {"test_psnr": psnr, "anchor_trajectory": traj}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--mesh", default="4x2")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--flagship", action="store_true",
                    help="flagship-scale evidence (r4 VERDICT ask #4): "
                    "the bench LOD model (feat_dim 32, 10 offsets, "
                    "voxel 0.02) at 512x512 through several densify "
                    "cycles and a capacity regrowth — minutes on the "
                    "chip, instead of the 64x64/80-gaussian toy")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default="CONVERGENCE.json")
    args = ap.parse_args()
    if args.iterations is None:
        args.iterations = 2500 if args.flagship else 2000

    workdir = args.workdir or tempfile.mkdtemp(prefix="hgs_conv_")
    scene = args.scene
    if scene is None:
        scene = os.path.join(workdir, "scene")
        if not os.path.exists(scene):
            from horizongs_tpu.cli.make_synthetic import main as mk
            if args.flagship:
                mk([scene, "--n_train", "24", "--n_test", "4",
                    "--width", "512", "--height", "512",
                    "--n_gauss", "12000"])
            else:
                mk([scene, "--n_train", "24", "--n_test", "4",
                    "--width", "64", "--height", "64", "--n_gauss", "80"])
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "synthetic",
        "flagship512.yaml" if args.flagship else "quickstart.yaml")

    prior = {}
    if os.path.exists(args.out):
        try:
            prior = json.load(open(args.out))
        except Exception:
            prior = {}

    if args.tpu:
        label = "tpu_1x1_flagship512" if args.flagship else "tpu_1x1"
        rec = run_one(label, scene, cfg_path, args.iterations,
                      ["--mesh", "1x1", "--rasterizer", "pallas"],
                      workdir)
        prior[("tpu_flagship_512" if args.flagship else "tpu_1x1_mesh")] = {
            "platform": jax.default_backend(),
            "iterations": args.iterations,
            **({"scale_note": ("flagship LOD model (feat_dim 32, 10 "
                               "offsets, voxel 0.02) at 512x512, 24 "
                               "train views, densify 100-1500/100 + "
                               "1000-step tail, real chip 1x1 mesh")}
               if args.flagship else {}),
            **rec}
    else:
        single = run_one("single", scene, cfg_path, args.iterations, [],
                         workdir)
        # 1x2: model-sharded band path at the SAME effective batch
        # (1 view/step) — the strict parity comparison
        mesh12 = run_one("mesh_1x2", scene, cfg_path, args.iterations,
                         ["--mesh", "1x2"], workdir)
        # DxM: the production shape (n_data views/step — a larger
        # effective batch, expected to do at least as well)
        mesh = run_one("mesh", scene, cfg_path, args.iterations,
                       ["--mesh", args.mesh], workdir)
        gap = None
        if single["test_psnr"] and mesh12["test_psnr"]:
            gap = abs(single["test_psnr"] - mesh12["test_psnr"])
        n_s = single["anchor_trajectory"][-1][1] \
            if single["anchor_trajectory"] else None
        n_m = mesh12["anchor_trajectory"][-1][1] \
            if mesh12["anchor_trajectory"] else None
        print(f"same-batch PSNR gap (single vs 1x2): {gap} dB; "
              f"anchors single={n_s} mesh_1x2={n_m}")
        prior.update({
            "platform": jax.default_backend(),
            "iterations": args.iterations,
            "mesh": args.mesh,
            "single": single, "mesh_1x2": mesh12, "mesh_run": mesh,
            "psnr_gap_db_same_batch": gap,
            "note": ("quickstart schedule (densify iters 50-300 every "
                     "40, long tail to the end), full train CLI incl. "
                     "calibration/recalibration. single vs 1x2 is the "
                     "strict same-batch parity (BASELINE 'PSNR parity "
                     "under distribution'); the DxM run batches n_data "
                     "views/step and is expected to score higher")})

    with open(args.out, "w") as f:
        json.dump(prior, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
