"""`python -m horizongs_tpu.cli.render -m PATH` — standalone render CLI.

Reference equivalent: `render.py -m PATH [--explicit]` (`render.py:176-219`).
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render train/test sets")
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--explicit", action="store_true")
    parser.add_argument("--rasterizer", default="auto")
    parser.add_argument("--path_video", action="store_true",
                        help="render an elliptical fly-through + video "
                        "(reference utils/render_utils.py path)")
    parser.add_argument("--path_frames", type=int, default=120)
    args = parser.parse_args(argv)

    from horizongs_tpu.cli.common import get_logger, load_config
    from horizongs_tpu.data.scene import Scene
    from horizongs_tpu.train.evaluate import render_set
    from horizongs_tpu.train.trainer import pick_rasterizer

    cfg_path = os.path.join(args.model_path, "config.yaml")
    lp, op, pp, cfg = load_config(cfg_path, args.model_path)
    logger = get_logger("render", args.model_path)
    scene = Scene(lp, cfg, load_iteration=args.iteration,
                  explicit=args.explicit, logger=logger)
    state = scene.explicit_state if args.explicit else scene.train_state
    rasterizer = pick_rasterizer(args.rasterizer)

    for name, cams, skip in (
            ("train", scene.get_train_cameras(), args.skip_train),
            ("test", scene.get_test_cameras(), args.skip_test)):
        if skip or not cams:
            continue
        logger.info(f"Rendering {name} set ({len(cams)} views)")
        renders, gts, counts, times, types, subsets = render_set(
            args.model_path, name, scene.loaded_iter, cams, scene.cfg,
            scene, state, rasterizer=rasterizer, explicit=args.explicit,
            add_prefilter=not (int(getattr(pp, "no_prefilter_step", 0)
                                   or 0) > 0))
        fps = len(times) / max(sum(times), 1e-9)
        logger.info(f"{name}: {fps:.2f} views/s, "
                    f"mean visible GS {sum(counts)/len(counts):.0f}")

    if args.path_video:
        import numpy as np
        from horizongs_tpu.utils.render_paths import (
            generate_path_cameras, write_video)
        path_cams = generate_path_cameras(scene.get_train_cameras(),
                                          n_frames=args.path_frames)
        logger.info(f"Rendering fly-through ({len(path_cams)} frames)")
        renders, *_ = render_set(
            args.model_path, "path", scene.loaded_iter, path_cams,
            scene.cfg, scene, state, rasterizer=rasterizer,
            explicit=args.explicit, save_images=False)
        out = write_video([np.asarray(r)[..., :3] for r in renders],
                          os.path.join(args.model_path, "path.mp4"))
        logger.info(f"fly-through written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
