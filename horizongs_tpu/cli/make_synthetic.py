"""`python -m horizongs_tpu.cli.make_synthetic PATH` — generate the tiny
synthetic Blender-format dataset the quick-start config trains on
(`configs/synthetic/quickstart.yaml`). Hermetic: renders a known gaussian
cloud, so no downloads are needed (the reference's quick start requires
the MatrixCity download, `README.md:41-59`)."""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Write a tiny synthetic Blender-format dataset")
    parser.add_argument("path")
    parser.add_argument("--n_train", type=int, default=12)
    parser.add_argument("--n_test", type=int, default=4)
    parser.add_argument("--width", type=int, default=96)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--n_gauss", type=int, default=60)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from horizongs_tpu.data.synthetic import write_synthetic_blender_dataset
    write_synthetic_blender_dataset(
        args.path, n_train=args.n_train, n_test=args.n_test,
        width=args.width, height=args.height, n_gauss=args.n_gauss,
        seed=args.seed)
    print(f"synthetic dataset written to {args.path} "
          f"({args.n_train} train / {args.n_test} test views, "
          f"{args.width}x{args.height})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
