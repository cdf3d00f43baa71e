"""`python -m horizongs_tpu.cli.metrics -m PATH` — PSNR/SSIM/LPIPS on
previously rendered image sets (reference `metrics.py`)."""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _read_images(renders_dir, gt_dir):
    from PIL import Image
    renders, gts, names = [], [], []
    for rp in sorted(glob.glob(os.path.join(renders_dir, "*.png"))):
        name = os.path.basename(rp)
        gp = os.path.join(gt_dir, name)
        if not os.path.exists(gp):
            continue
        renders.append(np.asarray(Image.open(rp).convert("RGB"),
                                  dtype=np.float32) / 255.0)
        gts.append(np.asarray(Image.open(gp).convert("RGB"),
                              dtype=np.float32) / 255.0)
        names.append(name)
    return renders, gts, names


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--set", default="test")
    args = parser.parse_args(argv)

    from horizongs_tpu.train.evaluate import evaluate_sets, lpips_fn_or_none

    base = os.path.join(args.model_path, args.set)
    out = {}
    for it_dir in sorted(glob.glob(os.path.join(base, "ours_*"))):
        it = int(it_dir.split("_")[-1])
        renders, gts, names = _read_images(os.path.join(it_dir, "renders"),
                                           os.path.join(it_dir, "gt"))
        if not renders:
            continue
        types = ["aerial"] * len(renders)  # split info lost offline; all
        results = evaluate_sets(args.model_path, it, renders, gts, types,
                                lpips_model=lpips_fn_or_none(),
                                tag=f"{args.set}_metrics")
        out[f"ours_{it}"] = results
        print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
