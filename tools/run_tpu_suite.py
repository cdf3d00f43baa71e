"""Run every TPU-hardware measurement in ONE process / ONE backend
session: the remote-TPU tunnel in this environment wedges for long
periods when clients are killed mid-session, so batching the whole
suite into a single never-killed process is the reliable way to collect
hardware evidence.

Sequence:
  1. bench.py main()            -> headline rays/s + full-step JSON line
  2. tools/parity_tpu.py        -> kernel fwd/bwd parity vs f32 oracle
  3. tools/bench_densify.py     -> 1M-anchor densify/checkpoint timings
  4. bench_scaling --tpu_overhead -> band-vs-plain 1x1 step ratio

Usage: python tools/run_tpu_suite.py [--skip bench,parity,densify,overhead]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma list: bench,parity,densify,overhead")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    t0 = time.time()

    def tick(msg):
        print(f"[tpu-suite {time.time()-t0:7.1f}s] {msg}", flush=True)

    import jax
    tick(f"backend: {jax.default_backend()} devices={jax.devices()}")

    if "bench" not in skip:
        tick("bench.py ...")
        import bench
        bench.main()
        tick("bench.py done")

    if "parity" not in skip:
        tick("parity_tpu ...")
        sys.argv = ["parity_tpu"]
        import parity_tpu
        rc = parity_tpu.main()
        tick(f"parity_tpu done rc={rc}")

    if "densify" not in skip:
        tick("bench_densify (1M anchors) ...")
        sys.argv = ["bench_densify", "--out", "DENSIFY_BENCH.json"]
        import bench_densify
        bench_densify.main()
        tick("bench_densify done")

    if "overhead" not in skip:
        tick("tpu 1x1 band-vs-plain overhead ...")
        sys.argv = ["bench_scaling", "--tpu_overhead",
                    "--out", "SCALING.json"]
        import bench_scaling
        bench_scaling.main()
        tick("overhead done")

    tick("ALL DONE")


if __name__ == "__main__":
    main()
