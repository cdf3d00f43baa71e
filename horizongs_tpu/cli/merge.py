"""`python -m horizongs_tpu.cli.merge` — merge trained chunk models into
one explicit scene and optionally evaluate it (reference `merge.py`)."""
from __future__ import annotations

import argparse
import glob
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True,
                        help="root containing chunk_fine/<id> model dirs")
    parser.add_argument("--source_path", required=True,
                        help="dataset root containing chunks/partitions.json")
    parser.add_argument("--chunk_stage", default="chunk_fine")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--eval_config", default=None,
                        help="config YAML for re-render + eval of the merge")
    parser.add_argument("--rasterizer", default="auto")
    args = parser.parse_args(argv)

    from horizongs_tpu.models.config import ModelConfig
    from horizongs_tpu.parallel.chunks import consolidate_chunks

    with open(os.path.join(args.source_path, "chunks",
                           "partitions.json")) as f:
        meta = json.load(f)

    chunk_dirs = {}
    for cid in meta["chunks"]:
        d = os.path.join(args.model_path, args.chunk_stage, cid)
        if os.path.isdir(d):
            chunk_dirs[cid] = d
    if not chunk_dirs:
        raise FileNotFoundError(
            f"no chunk model dirs under {args.model_path}/{args.chunk_stage}")

    # model config from the first chunk's saved config
    first = next(iter(chunk_dirs.values()))
    cfg_file = os.path.join(first, "config.yaml")
    if os.path.exists(cfg_file):
        from horizongs_tpu.config import load_yaml
        cfg = ModelConfig.from_dict(
            load_yaml(cfg_file)["model_params"]["model_config"])
    else:
        cfg = ModelConfig()

    merged_dir = os.path.join(args.model_path, "merged_model")
    path = consolidate_chunks(chunk_dirs, meta, merged_dir, cfg,
                              scale=args.scale)
    print(f"merged explicit scene -> {path}")

    if args.eval_config:
        from horizongs_tpu.cli.common import get_logger, load_config
        from horizongs_tpu.data.scene import Scene
        from horizongs_tpu.train.evaluate import (
            evaluate_sets, lpips_fn_or_none, render_set)
        from horizongs_tpu.train.trainer import pick_rasterizer
        lp, op, pp, mcfg = load_config(args.eval_config, merged_dir)
        logger = get_logger("merge", merged_dir)
        scene = Scene(lp, mcfg, load_iteration=-1, explicit=True,
                      logger=logger)
        cams = scene.get_test_cameras() or scene.get_train_cameras()
        renders, gts, counts, times, types, subsets = render_set(
            merged_dir, "test", scene.loaded_iter, cams, scene.cfg, scene,
            scene.explicit_state, rasterizer=pick_rasterizer(args.rasterizer),
            explicit=True)
        results = evaluate_sets(merged_dir, scene.loaded_iter, renders, gts,
                                types, lpips_model=lpips_fn_or_none(),
                                subsets=subsets)
        print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
