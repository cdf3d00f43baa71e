"""Split grad-routing cost: the big (CAP,10) gather vs the cumsum vs the
final per-gaussian range gathers, plus binning internals (the two sorts).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from horizongs_tpu.data.synthetic import lookat_camera, random_gaussians
from horizongs_tpu.ops.binning import build_tile_instances, grad_capacity
from horizongs_tpu.ops.pallas.raster3d import G, TILE_H, TILE_W
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import _make_grid


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
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
    proj = jax.jit(lambda m, q, s: project_3dgs(
        m, q, s, cam.viewmat, cam.K, W, H))(g["means"], g["quats"],
                                            g["scales"])
    radii = jnp.where(g["opacities"] >= 1 / 255.0, proj.radii, 0.0)
    co, op = proj.conics, g["opacities"]
    inst = jax.jit(lambda m, r, d: build_tile_instances(
        m, r, d, grid.n_tiles_x, grid.n_tiles_y, TILE_W, TILE_H,
        cap, conics=co, opacities=op))(proj.means2d, radii, proj.depths)
    n_tiles = grid.n_tiles_x * grid.n_tiles_y
    cap_out = grad_capacity(cap, n_tiles, G)
    key = jax.random.PRNGKey(0)
    ginst = jax.random.normal(key, (16, cap_out), jnp.float32)
    ifin = jnp.full((n_tiles,), 100, jnp.int32)

    live = ((jnp.arange(cap, dtype=jnp.int32) < inst.n_instances)
            & (inst.slot_chunk < ifin[inst.slot_tile]))

    gather = jax.jit(lambda gi: gi[:10, :].T[inst.grad_slot])
    gu = timeit("routing: big gather", gather, ginst)
    mask = jax.jit(lambda gu: jnp.where(live[:, None], gu, 0.0))
    gu = timeit("routing: mask", mask, gu)
    cs = jax.jit(lambda gu: jnp.cumsum(gu, axis=0))
    csum = timeit("routing: cumsum", cs, gu)
    def final(csum):
        csum = jnp.concatenate([jnp.zeros((1, 10)), csum], axis=0)
        ends = jnp.clip(inst.gauss_offsets, 0, cap)
        starts = jnp.clip(inst.gauss_offsets - inst.gauss_cover, 0, cap)
        return csum[ends] - csum[starts]
    timeit("routing: range diff", jax.jit(final), csum)

    # binning internals
    iota = jnp.arange(cap, dtype=jnp.int32)
    key32 = jax.random.randint(jax.random.PRNGKey(1), (cap,), 0,
                               2**30, jnp.int32)
    payload = jax.random.randint(jax.random.PRNGKey(2), (cap,), 0,
                                 2**30, jnp.int32)
    s1 = jax.jit(lambda k, p: jax.lax.sort((k, p, iota), num_keys=1))
    timeit("binning: 614k sort (2 payld)", s1, key32, payload)
    s2 = jax.jit(lambda k: jax.lax.sort((k, iota), num_keys=1))
    timeit("binning: 614k sort (1 payld)", s2, key32)
    nkey = jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float32)
    s3 = jax.jit(lambda k: jax.lax.sort((k, jnp.arange(n, dtype=jnp.int32)),
                                        num_keys=1))
    timeit("binning: 100k sort", s3, nkey)
    tbl = jax.random.normal(jax.random.PRNGKey(4), (n, 9), jnp.float32)
    ids = jnp.clip(payload % n, 0, n - 1)
    timeit("binning: (cap,9) gather", jax.jit(lambda t: t[ids]), tbl)
    timeit("assemble-like (cap,10) gthr",
           jax.jit(lambda t: jnp.concatenate([t, t[:, :1]], 1)[ids]), tbl)


if __name__ == "__main__":
    main()
