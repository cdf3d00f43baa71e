"""Itemize the band-sharded step's overhead vs the plain step at a 1x1
mesh on the real chip — the VERDICT r3 gating item (band/plain = 1.197
bounds achievable N-chip scaling efficiency at ~0.84 before any
collective byte moves).

Method: run both steps under `jax.profiler.trace` and aggregate the
device plane's per-HLO-op times (the ONLY trustworthy breakdown on the
axon remote-TPU tunnel: host-side stage timings measure the ~1.6-15 ms
session dispatch floor, not the op — see tools/profile_full_step.py's
caveat). Each HLO event carries `source_stack`, `hlo_category`, `flops`
and `bytes_accessed`, so the diff table names the exact source lines the
band path pays for.

Outputs a side-by-side per-category and per-source table plus a JSON
artifact, and the end-to-end chained timing of both steps (same
methodology as tools/bench_scaling.py --tpu_overhead).

Usage:
  python tools/profile_band_overhead.py [--steps 6] [--iters 10]
      [--n_points 20000] [--out BAND_PROFILE.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# xplane trace parsing (TF's bundled tsl proto; works through axon)
# ---------------------------------------------------------------------------

def parse_device_ops(trace_dir: str):
    """[(display, source, category, total_dur_ps, flops, bytes)] from the
    newest xplane.pb's TPU device plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    plane = next((p for p in xs.planes
                  if p.name.startswith("/device:TPU")), None)
    if plane is None:
        raise RuntimeError(
            f"no TPU device plane in {paths[-1]} "
            f"(planes: {[p.name for p in xs.planes]})")
    sm = {k: v.name for k, v in plane.stat_metadata.items()}

    def md_stats(md):
        out = {}
        for st in md.stats:
            name = sm.get(st.metadata_id)
            out[name] = (st.str_value if st.str_value
                         else st.uint64_value or st.int64_value
                         or st.double_value)
        return out

    rows = []
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # dur,fl,by,n
        meta = {}
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            a = agg[ev.metadata_id]
            a[0] += ev.duration_ps
            a[3] += 1
            meta[ev.metadata_id] = md
        for mid, (dur, _, _, n) in agg.items():
            md = meta[mid]
            st = md_stats(md)
            src = str(st.get("source", ""))
            rows.append({
                "op": md.display_name or md.name,
                "source": src,
                "category": str(st.get("hlo_category", "")),
                "dur_ps": dur,
                "count": n,
                "flops": int(st.get("flops", 0) or 0),
                "bytes": int(st.get("bytes_accessed", 0) or 0),
            })
    rows.sort(key=lambda r: -r["dur_ps"])
    return rows


def summarize(rows, n_steps, label, top=30):
    total_ms = sum(r["dur_ps"] for r in rows) / 1e9 / n_steps
    print(f"\n=== {label}: device-op total {total_ms:.2f} ms/step ===")
    by_cat = collections.defaultdict(float)
    by_src = collections.defaultdict(float)
    for r in rows:
        by_cat[r["category"]] += r["dur_ps"] / 1e9 / n_steps
        by_src[r["source"] or "(none)"] += r["dur_ps"] / 1e9 / n_steps
    print("-- by hlo_category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:42s} {v:8.3f} ms")
    print(f"-- top {top} ops --")
    for r in rows[:top]:
        print(f"  {r['dur_ps']/1e9/n_steps:8.3f} ms  x{r['count']:<4d} "
              f"{r['category']:<22s} {r['op'][:46]:46s} {r['source']}")
    return {"total_ms": total_ms,
            "by_category": dict(by_cat),
            "by_source": dict(by_src),
            "top_ops": [{k: r[k] for k in
                         ("op", "source", "category", "count")}
                        | {"ms_per_step": r["dur_ps"] / 1e9 / n_steps}
                        for r in rows[:top]]}


def diff_sources(plain, band, n_steps, top=25):
    """Per-source-line band-minus-plain device time."""
    def by_src(rows):
        d = collections.defaultdict(float)
        for r in rows:
            d[r["source"] or "(none)"] += r["dur_ps"] / 1e9 / n_steps
        return d
    p, b = by_src(plain), by_src(band)
    keys = set(p) | set(b)
    diffs = sorted(((b.get(k, 0.0) - p.get(k, 0.0), k) for k in keys),
                   key=lambda t: -abs(t[0]))
    print(f"\n=== band minus plain, by source line (ms/step) ===")
    out = []
    for d, k in diffs[:top]:
        print(f"  {d:+8.3f} ms   band={b.get(k, 0.0):7.3f} "
              f"plain={p.get(k, 0.0):7.3f}   {k}")
        out.append({"source": k, "delta_ms": d,
                    "band_ms": b.get(k, 0.0), "plain_ms": p.get(k, 0.0)})
    return out


# ---------------------------------------------------------------------------
# the two steps (identical scene to bench_scaling.run_tpu_overhead)
# ---------------------------------------------------------------------------

def build_steps(args):
    from tools.bench_scaling import _calibrate, _scene
    from horizongs_tpu.config import make_optim
    from horizongs_tpu.parallel.mesh import make_mesh
    from horizongs_tpu.parallel.step import (
        build_sharded_train_step, shard_state)
    from horizongs_tpu.train.step import build_train_step, camera_tensors

    W, H = args.width, args.height
    rasterizer = "pallas" if jax.default_backend() != "cpu" else "tiled"
    cfg, ts0, cams = _scene(W, H, args.n_points, 0, 1, 1)
    opt = make_optim(start_stat=0)
    ct = camera_tensors(cams[0], do_stats=True)
    inst_cap, _ = _calibrate(cfg, ts0, cams[:1], W, H, 1, rasterizer)
    plain = build_train_step(cfg, opt, H, W, add_prefilter=False,
                             rasterizer=rasterizer, instance_cap=inst_cap)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    band = build_sharded_train_step(cfg, opt, mesh, H, W,
                                    add_prefilter=False,
                                    rasterizer=rasterizer,
                                    shard_tiles=True,
                                    instance_cap=inst_cap)
    batch = jax.tree.map(lambda x: x[None], ct)
    ts_plain = jax.tree.map(jnp.copy, ts0)
    ts_band = shard_state(ts0, mesh)
    return (plain, ts_plain, ct), (band, ts_band, batch), int(ts0.n)


def run_and_trace(step, ts, cam, trace_dir, warmup, iters, steps):
    m = None
    for i in range(warmup):
        ts, m = step(ts, cam, i + 1)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, m = step(ts, cam, i + 10)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        ts, m = step(ts, cam, i + 50)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--n_points", type=int, default=20_000)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--steps", type=int, default=6,
                    help="traced steps per variant")
    ap.add_argument("--trace_root", default="/tmp/band_profile")
    ap.add_argument("--out", default="BAND_PROFILE.json")
    args = ap.parse_args()

    (plain, tsp, ct), (band, tsb, batch), n_anchors = build_steps(args)
    print(f"anchors={n_anchors}  backend={jax.default_backend()}")

    d_plain = os.path.join(args.trace_root, "plain")
    d_band = os.path.join(args.trace_root, "band")
    t_plain = run_and_trace(plain, tsp, ct, d_plain,
                            args.warmup, args.iters, args.steps)
    t_band = run_and_trace(band, tsb, batch, d_band,
                           args.warmup, args.iters, args.steps)
    ratio = t_band / t_plain
    print(f"\nend-to-end: plain={t_plain*1e3:.1f} ms  "
          f"band={t_band*1e3:.1f} ms  ratio={ratio:.3f}")

    rows_p = parse_device_ops(d_plain)
    rows_b = parse_device_ops(d_band)
    sp = summarize(rows_p, args.steps, "plain step")
    sb = summarize(rows_b, args.steps, "band 1x1 step")
    dd = diff_sources(rows_p, rows_b, args.steps)

    with open(args.out, "w") as f:
        json.dump({
            "width": args.width, "height": args.height,
            "n_anchors": n_anchors,
            "plain_step_ms": t_plain * 1e3,
            "band_step_ms": t_band * 1e3,
            "band_overhead_ratio": ratio,
            "plain": sp, "band": sb,
            "band_minus_plain_by_source": dd,
        }, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
