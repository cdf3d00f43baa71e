"""`python -m horizongs_tpu.cli.train --config X.yaml` — the train driver.

Reference equivalent: `python train.py --config X.yaml` (`train.py:689-779`):
train, save, re-render the held-out set, evaluate, write results.json.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a Horizon-GS TPU model")
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--source_path", default=None,
                        help="override model_params.source_path (lets the "
                        "shipped configs/ templates run on any dataset "
                        "location)")
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--save_iterations", type=int, nargs="*", default=None)
    parser.add_argument("--test_iterations", type=int, nargs="*", default=[],
                        help="in-train milestone evaluation iterations "
                        "(reference training_report, train.py:309-383)")
    parser.add_argument("--checkpoint_iterations", type=int, nargs="*",
                        default=[])
    parser.add_argument("--start_checkpoint", default=None,
                        help="chkpnt{N}.npz to resume from (the reference's "
                        "--start_checkpoint, whose capture/restore is "
                        "broken — ours round-trips)")
    parser.add_argument("--rasterizer", default="auto",
                        choices=["auto", "pallas", "tiled", "dense",
                                 "pallas_interpret"])
    parser.add_argument("--skip_eval", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--disable_tb", action="store_true",
                        help="skip tensorboard SummaryWriter creation")
    parser.add_argument("--viewer_port", type=int, default=None,
                        help="poll a SIBR remote-GUI client during training "
                        "(reference network_gui, shipped disabled there)")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a jax.profiler device trace of N "
                        "training steps (starting at iteration 20) into "
                        "<model_path>/profile/ for TensorBoard")
    parser.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                        help="multi-chip training mesh, e.g. '4x2' "
                        "(cameras data-parallel x anchors+image-bands "
                        "tensor-parallel) or 'auto' for all visible "
                        "devices. Omit for the single-device step.")
    parser.add_argument("--band_cap", type=int, default=None,
                        help="per (src,dst) record slots of the tile-band "
                        "exchange (default: auto-calibrated from sample "
                        "views; overflow is counted + recalibrated, "
                        "never silent)")
    parser.add_argument("--balanced_bands", action="store_true",
                        default=None,
                        help="load-balanced tile-band boundaries: cut "
                        "the image's tile rows at equal routed-record "
                        "quantiles measured over sample views, instead "
                        "of uniformly. OPT-IN for record-bound (sparse) "
                        "scenes: the r5 measurement (SCALING.json "
                        "band_time_skew) shows production step time is "
                        "rows-bound, so uniform bounds win time on "
                        "saturated scenes")
    parser.add_argument("--uniform_bands", action="store_true",
                        help="force uniform tile-band boundaries "
                        "(overrides --balanced_bands)")
    parser.add_argument("--no_balanced_batches", action="store_true",
                        help="disable cost-balanced data-parallel "
                        "camera batches (default under --mesh: fill "
                        "each step's batch with views of similar "
                        "estimated instance cost — the synchronous "
                        "step waits on the heaviest view)")
    parser.add_argument("--checkpoint_format", default=None,
                        choices=["npz", "sharded"],
                        help="npz: host-gathered single file (portable). "
                        "sharded: orbax directory, every device writes "
                        "its own shards (no host gather) — the default "
                        "whenever --mesh is active; npz is the default "
                        "for single-device runs")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="enable jax_debug_nans: every jitted step "
                        "re-runs op-by-op on a NaN and raises at the "
                        "producing primitive (the reference's "
                        "torch.autograd.set_detect_anomaly, train.py:760; "
                        "slow — debugging only)")
    args = parser.parse_args(argv)

    # multi-host bring-up FIRST: jax.distributed.initialize() hard-fails
    # after anything touches the XLA backend
    if args.mesh:
        from horizongs_tpu.parallel.mesh import maybe_init_distributed
        maybe_init_distributed()

    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)

    from horizongs_tpu.cli.common import get_logger, load_config
    from horizongs_tpu.data.scene import Scene
    from horizongs_tpu.train.trainer import Trainer
    from horizongs_tpu.train.evaluate import (
        evaluate_sets, lpips_fn_or_none, render_set)

    lp, op, pp, cfg = load_config(args.config, args.model_path)
    if args.source_path is not None:
        lp.source_path = args.source_path
    if args.iterations is not None:
        op.iterations = args.iterations
    logger = get_logger("train", lp.model_path)
    os.makedirs(lp.model_path, exist_ok=True)
    # save the RESOLVED config, not a raw copy: CLI overrides
    # (--source_path, --iterations, the explicit --model_path) must be
    # visible to the downstream CLIs (render/metrics/export_mesh), which
    # reload <model_path>/config.yaml to reconstruct this run
    import yaml
    from horizongs_tpu.config import load_yaml
    raw = load_yaml(args.config)
    raw.setdefault("model_params", {})["source_path"] = lp.source_path
    raw["model_params"]["model_path"] = lp.model_path
    if args.iterations is not None:
        raw.setdefault("optim_params", {})["iterations"] = op.iterations
    with open(os.path.join(lp.model_path, "config.yaml"), "w") as f:
        yaml.safe_dump(raw, f, sort_keys=False)
    with open(os.path.join(lp.model_path, "cfg_args"), "w") as f:
        f.write(str(vars(lp)))
    # source snapshot for post-hoc debugging (`saveRuntimeCode`,
    # reference `train.py:60-81,735`)
    try:
        import horizongs_tpu
        pkg_dir = os.path.dirname(horizongs_tpu.__file__)
        dst = os.path.join(lp.model_path, "backup", "horizongs_tpu")
        if not os.path.exists(dst):
            shutil.copytree(pkg_dir, dst,
                            ignore=shutil.ignore_patterns("__pycache__"))
    except Exception as e:
        logger.info(f"source snapshot skipped: {e}")

    wandb_run = None
    if args.wandb:
        try:
            import wandb
            wandb_run = wandb.init(project="horizongs_tpu",
                                   name=str(lp.scene_name), config=vars(op))
        except Exception as e:
            logger.info(f"wandb unavailable: {e}")

    tb_writer = None
    if not args.disable_tb:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(lp.model_path)
        except Exception as e:
            logger.info(f"tensorboard unavailable: {e}")

    mesh = None
    if args.mesh:
        from horizongs_tpu.parallel.mesh import parse_mesh_spec
        mesh = parse_mesh_spec(args.mesh)
        if mesh is not None:
            logger.info(f"training mesh: data={mesh.shape['data']} x "
                        f"model={mesh.shape['model']} "
                        f"({len(mesh.devices.flat)} devices)")
    if args.checkpoint_format is None:
        args.checkpoint_format = "sharded" if mesh is not None else "npz"

    scene = Scene(lp, cfg, weed_ratio=pp.weed_ratio, logger=logger,
                  seed=args.seed)
    trainer = Trainer(scene.cfg, op, pp, scene, logger=logger,
                      rasterizer=args.rasterizer, seed=args.seed,
                      wandb_run=wandb_run, viewer_port=args.viewer_port,
                      tb_writer=tb_writer,
                      profile_steps=(20, args.profile) if args.profile
                      else None,
                      mesh=mesh, band_cap=args.band_cap,
                      checkpoint_format=args.checkpoint_format,
                      balanced_bands=(False if args.uniform_bands
                                      else args.balanced_bands),
                      balanced_batches=(False if args.no_balanced_batches
                                        else None))
    iterations = args.iterations or op.iterations
    save_iters = set(args.save_iterations
                     if args.save_iterations is not None else [iterations])
    save_iters.add(iterations)
    first_iter = 1
    if args.start_checkpoint:
        # Trainer.restore owns format dispatch (orbax sharded dir vs
        # npz file) and the mesh-divisibility capacity re-pad, so every
        # resume path — not just this CLI — gets both
        ckpt_it = trainer.restore(args.start_checkpoint)
        first_iter = ckpt_it + 1
        logger.info(f"Resumed from {args.start_checkpoint} "
                    f"at iteration {ckpt_it}")
    trainer.train(iterations=iterations, save_iterations=save_iters,
                  checkpoint_iterations=set(args.checkpoint_iterations),
                  test_iterations=set(args.test_iterations),
                  first_iter=first_iter)
    if tb_writer is not None:
        tb_writer.close()   # flush buffered scalars

    if not args.skip_eval:
        logger.info("Rendering + evaluating test set")
        cams = scene.get_test_cameras() or scene.get_train_cameras()
        renders, gts, counts, times, types, subsets = render_set(
            lp.model_path, "test", iterations, cams, scene.cfg, scene,
            trainer._host_state(), rasterizer=trainer.rasterizer,
            # reference render_sets: prefilter off iff no_prefilter_step
            # was used in training (`train.py:478-484`)
            add_prefilter=not (int(getattr(pp, "no_prefilter_step", 0)
                                   or 0) > 0))
        results = evaluate_sets(lp.model_path, iterations, renders, gts,
                                types, lpips_model=lpips_fn_or_none(),
                                subsets=subsets)
        logger.info(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
