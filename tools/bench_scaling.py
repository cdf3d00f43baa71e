"""Scaling benchmark: sharded train step at 1..N devices.

Measures the full band-sharded training step (decode -> record exchange
-> per-band rasterize -> loss -> backward -> Adam) at increasing device
counts and reports rays/s and scaling efficiency vs 1 device
(BASELINE.md target: >=80% at N devices).

On the virtual CPU mesh (default: JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8) the numbers validate that the
collective program scales structurally — all devices share one host's
cores, so wall-clock efficiency there is a lower bound. On a real TPU
slice run with no flags to measure true ICI scaling.

Usage:  python tools/bench_scaling.py [--devices 1,2,4,8] [--out SCALING.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("HGS_BENCH_FORCE_CPU", "1") == "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("HGS_BENCH_FORCE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(n_devices: int, model_axis: int, width: int, height: int,
          capacity: int, rasterizer: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship
    from horizongs_tpu.config import make_optim
    from horizongs_tpu.parallel.mesh import make_mesh
    from horizongs_tpu.parallel.step import (
        build_sharded_train_step, shard_state)
    from horizongs_tpu.train.step import camera_tensors

    model = model_axis if n_devices % model_axis == 0 else 1
    data = n_devices // model
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[:n_devices])
    cfg, ts, cams = _flagship(capacity=capacity, width=width, height=height,
                              n_cams=data)
    cams = [c._replace(image=jnp.zeros((height, width, 3)),
                       alpha_mask=jnp.ones((height, width, 1)))
            for c in cams]
    opt = make_optim(start_stat=0)
    step = build_sharded_train_step(cfg, opt, mesh, height, width,
                                    add_prefilter=False,
                                    rasterizer=rasterizer,
                                    shard_tiles=True)
    ts = shard_state(ts, mesh)
    cts = [camera_tensors(c, do_stats=True) for c in cams[:data]]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cts)
    return step, ts, batch


def time_step(step, ts, batch, warmup: int = 2, iters: int = 8) -> float:
    for i in range(warmup):
        ts, m = step(ts, batch, i + 1)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, m = step(ts, batch, i + 10)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--model_axis", type=int, default=2,
                    help="model-axis size when divisible (data = N/model)")
    ap.add_argument("--rasterizer", default="tiled")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    counts = [int(x) for x in args.devices.split(",")]
    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    results = []
    for n in counts:
        step, ts, batch = build(n, args.model_axis if n > 1 else 1,
                                args.width, args.height, args.capacity,
                                args.rasterizer)
        dt = time_step(step, ts, batch)
        data_axis = n // (args.model_axis if n > 1 and
                          n % args.model_axis == 0 else 1)
        rays = args.width * args.height * data_axis / dt
        results.append({"devices": n, "step_ms": dt * 1e3,
                        "rays_per_sec": rays})
        print(f"devices={n:2d}  step={dt*1e3:8.1f} ms  "
              f"rays/s={rays:,.0f}")
    base = results[0]["rays_per_sec"]
    # Two efficiency notions:
    #  * linear: wall-clock speedup vs n-fold ideal — THE metric on real
    #    chips, where each device adds compute.
    #  * shared_host: total throughput vs the 1-device run — the only
    #    meaningful notion on a virtual mesh (all "devices" oversubscribe
    #    one host's cores, so flat total throughput IS the ideal; the gap
    #    below 1.0 is the collective/sharding overhead the virtual mesh
    #    can actually measure).
    virtual = (jax.default_backend() == "cpu"
               and len(jax.devices()) > os.cpu_count())
    for r in results:
        r["efficiency_linear"] = r["rays_per_sec"] / (base * r["devices"])
        r["efficiency_shared_host"] = r["rays_per_sec"] / base
        r["efficiency"] = (r["efficiency_shared_host"] if virtual
                           else r["efficiency_linear"])
    out = {"platform": jax.default_backend(),
           "virtual_shared_host_mesh": virtual,
           "efficiency_definition": ("total-throughput vs 1 device "
                                     "(flat ideal: devices share one "
                                     "host's cores)" if virtual else
                                     "wall-clock speedup vs linear ideal"),
           "width": args.width, "height": args.height,
           "capacity": args.capacity, "rasterizer": args.rasterizer,
           "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; efficiency @max devices: "
          f"{results[-1]['efficiency']:.2f}"
          + (" (shared-host virtual mesh: flat-total-throughput ideal)"
             if virtual else ""))


if __name__ == "__main__":
    main()
