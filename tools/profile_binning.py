"""Micro-profile the binning pipeline's internal stages on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.binning import build_tile_instances, tile_spans
from horizongs_tpu.ops.pallas.raster3d import G, TILE_H, TILE_W
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import _make_grid


def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt * 1e3:8.2f} ms")
    return out


def main():
    W, H = 1920, 1088
    n = 100_000
    cam = lookat_camera(width=W, height=H, eye=(0, 0, -4))
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n, seed=0, extent=1.5,
                          scale_range=(0.004, 0.02)).items()}
    cap = -(-6 * n // G) * G
    grid = _make_grid(W, H, TILE_W, TILE_H)
    ntx, nty, n_tiles = grid.n_tiles_x, grid.n_tiles_y, grid.n_tiles

    proj = jax.jit(lambda m, q, s: project_3dgs(
        m, q, s, cam.viewmat, cam.K, W, H))(g["means"], g["quats"], g["scales"])
    jax.block_until_ready(proj)
    means2d, radii, depths = proj.means2d, proj.radii, proj.depths
    radii = jnp.where(g["opacities"] >= 1 / 255.0, radii, 0.0)

    timeit("full build_tile_instances", jax.jit(
        lambda m, r, d: build_tile_instances(m, r, d, ntx, nty, TILE_W,
                                             TILE_H, cap)),
        means2d, radii, depths)
    inst = jax.jit(lambda m, r, d: build_tile_instances(
        m, r, d, ntx, nty, TILE_W, TILE_H, cap))(means2d, radii, depths)

    # stage timings
    def depth_rank_fn(d, r):
        order = jnp.argsort(jnp.where(r > 0, d, jnp.inf))
        rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return rank
    timeit("  depth argsort+rank (N)", jax.jit(depth_rank_fn), depths, radii)

    def expand_fn(m, r, d):
        x0, x1, y0, y1 = tile_spans(m, r, ntx, nty, TILE_W, TILE_H)
        n_cover = jnp.where(r > 0, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
        offs = jnp.cumsum(n_cover)
        hist = jnp.zeros(cap + 1, jnp.int32).at[jnp.clip(offs, 0, cap)].add(1)
        gg = jnp.clip(jnp.cumsum(hist[:cap]).astype(jnp.int32), 0, n - 1)
        table = jnp.stack([offs, n_cover, x0, y0, x1 - x0 + 1], axis=1)
        return table[gg], gg
    timeit("  slot->gauss expand", jax.jit(expand_fn), means2d, radii, depths)

    key = jnp.arange(cap, dtype=jnp.int32)[::-1]
    gg = jnp.zeros(cap, jnp.int32)
    slots = jnp.arange(cap, dtype=jnp.int32)
    timeit("  sort (key,g,slot) CAP", jax.jit(
        lambda k, a, s: jax.lax.sort((k, a, s), num_keys=1)), key, gg, slots)
    timeit("  sort (key,slot) CAP", jax.jit(
        lambda k, s: jax.lax.sort((k, s), num_keys=1)), key, slots)
    perm = jax.lax.sort((key, slots), num_keys=1)[1]
    timeit("  inv_perm via 2nd sort", jax.jit(
        lambda p, s: jax.lax.sort((p, s), num_keys=1)[1]), perm, slots)
    timeit("  inv_perm via scatter", jax.jit(
        lambda p, s: jnp.zeros(cap, jnp.int32).at[p].set(
            s, unique_indices=True, mode="drop")), perm, slots)
    try:
        key64 = key.astype(jnp.int64) << 20 | slots.astype(jnp.int64)
        timeit("  sort int64 packed CAP", jax.jit(
            lambda k: jax.lax.sort((k,), num_keys=1)), key64)
    except Exception as e:
        print(f"  sort int64 packed CAP  skipped ({e})")

    # per-tile segment starts: scatter-add histogram (current) vs
    # searchsorted over the already-sorted tile ids
    tile_sorted = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(0), (cap,), 0, n_tiles + 1,
                           dtype=jnp.int32))

    def starts_hist(ts):
        h = jnp.zeros(n_tiles + 2, jnp.int32).at[ts].add(1)
        return jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(h[:n_tiles + 1])])[:n_tiles + 1]

    def starts_ss(ts):
        return jnp.searchsorted(
            ts, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)

    s1 = timeit("  tile_starts scatter-hist", jax.jit(starts_hist),
                tile_sorted)
    s2 = timeit("  tile_starts searchsorted", jax.jit(starts_ss), tile_sorted)
    assert jnp.array_equal(s1, s2), "tile_starts mismatch"

    # gather costs
    vals = jnp.arange(cap, dtype=jnp.int32)
    timeit("  gather int32 CAP", jax.jit(lambda v, p: v[p]), vals, perm)


if __name__ == "__main__":
    main()
