"""Tile binning: sort-based gaussian->tile instance expansion, static shapes.

TPU-native replacement for gsplat's atomic tile binning + per-tile radix
sort. There are no atomics on TPU, so we build the (tile, depth)-sorted
instance list with data-parallel primitives only:

  1. per-gaussian tile span from the projected center + radius
  2. exclusive prefix sum of span areas -> each instance slot finds its
     gaussian with a searchsorted (static INSTANCE_CAP bounds memory;
     overflow instances are dropped and counted, never silently)
  3. one global `lax.sort` on (tile_id, depth) keys
  4. per-tile segments are implicit: rows with equal tile_id are
     contiguous and depth-ordered, exactly the invariant the chunked
     compositor needs.

Everything is O(CAP log CAP) in XLA ops with static shapes — recompiles
only when CAP changes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileInstances(NamedTuple):
    gauss_id: jnp.ndarray    # (CAP,) int32 gaussian index per instance
    tile_id: jnp.ndarray     # (CAP,) int32, == n_tiles for invalid slots
    valid: jnp.ndarray       # (CAP,) bool
    n_instances: jnp.ndarray  # () int32 true instance count (pre-drop)
    n_dropped: jnp.ndarray   # () int32 instances beyond CAP
    # gradient-routing info (Pallas backend): sorted row r holds original
    # slot perm[r]; inv_perm[s] = r. Original slots are contiguous per
    # gaussian: gaussian g owns [offsets[g]-cover[g], offsets[g]).
    inv_perm: jnp.ndarray     # (CAP,) int32
    tile_starts: jnp.ndarray  # (n_tiles+1,) int32 segment offsets
    gauss_offsets: jnp.ndarray  # (N,) int32 inclusive cumsum of cover
    gauss_cover: jnp.ndarray    # (N,) int32 tiles covered per gaussian


def tile_spans(means2d: jnp.ndarray, radii: jnp.ndarray,
               n_tiles_x: int, n_tiles_y: int, tile_w: int, tile_h: int):
    """Inclusive tile index ranges covered by each gaussian's AABB."""
    x0 = jnp.floor((means2d[:, 0] - radii) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((means2d[:, 0] + radii) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((means2d[:, 1] - radii) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((means2d[:, 1] + radii) / tile_h).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, n_tiles_x - 1)
    x1 = jnp.clip(x1, 0, n_tiles_x - 1)
    y0 = jnp.clip(y0, 0, n_tiles_y - 1)
    y1 = jnp.clip(y1, 0, n_tiles_y - 1)
    return x0, x1, y0, y1


def build_tile_instances(means2d: jnp.ndarray, radii: jnp.ndarray,
                         depths: jnp.ndarray, n_tiles_x: int, n_tiles_y: int,
                         tile_w: int, tile_h: int, cap: int) -> TileInstances:
    n_tiles = n_tiles_x * n_tiles_y
    N = means2d.shape[0]
    valid_g = radii > 0

    # 1) depth-rank the gaussians once (N keys, cheap) so the instance sort
    #    can use a single fused integer key instead of a lexicographic
    #    (tile, f32 depth) sort — ~2x fewer sorted bytes, one sort operand.
    rank_bits = max(31 - max(n_tiles + 1, 2).bit_length(), 1)
    depth_order = jnp.argsort(jnp.where(valid_g, depths, jnp.inf))
    depth_rank = jnp.zeros(N, dtype=jnp.int32).at[depth_order].set(
        jnp.arange(N, dtype=jnp.int32))
    depth_rank = jnp.minimum(depth_rank, (1 << rank_bits) - 1)

    x0, x1, y0, y1 = tile_spans(means2d, radii, n_tiles_x, n_tiles_y,
                                tile_w, tile_h)
    wspan = (x1 - x0 + 1)
    n_cover = jnp.where(valid_g, wspan * (y1 - y0 + 1), 0)   # (N,)

    offs = jnp.cumsum(n_cover)                                # inclusive
    total = offs[-1]
    slots = jnp.arange(cap, dtype=jnp.int32)
    # slot -> gaussian: g(s) = #(offs <= s). XLA's searchsorted lowers to a
    # serial binary-search loop on TPU (~100ms/M queries); a histogram +
    # cumsum over the contiguous slot range does the same in ~1ms.
    hist = jnp.zeros(cap + 1, dtype=jnp.int32).at[
        jnp.clip(offs, 0, cap)].add(1)
    g = jnp.cumsum(hist[:cap]).astype(jnp.int32)
    g = jnp.clip(g, 0, N - 1)
    # one stacked gather: separate 1-channel gathers cost ~3ms each on TPU
    table = jnp.stack([offs, n_cover, x0, y0, wspan, depth_rank], axis=1)
    got = table[g]                                            # (cap, 6)
    start = got[:, 0] - got[:, 1]
    local = slots - start
    w = jnp.maximum(got[:, 4], 1)
    # vector-divisor int div; local <= max tile coverage (~2k) so exact
    # in f32 with the +0.5 trick
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / w.astype(jnp.float32)).astype(jnp.int32)
    tx = got[:, 2] + (local - q * w)
    ty = got[:, 3] + q
    valid_slot = slots < total
    tile_id = jnp.where(valid_slot, ty * n_tiles_x + tx, n_tiles)

    # fused key: tile in the high bits, depth rank in the low bits
    key = (tile_id << rank_bits) | jnp.where(valid_slot, got[:, 5], 0)
    key_sorted, g_sorted, perm = jax.lax.sort((key, g, slots), num_keys=1)
    tile_sorted = (key_sorted >> rank_bits).astype(jnp.int32)
    valid_sorted = tile_sorted < n_tiles

    # inverse permutation via a second radix sort (scatter would serialize)
    _, inv_perm = jax.lax.sort((perm, slots), num_keys=1)

    # per-tile segment starts from a histogram of sorted tile ids
    hist_t = jnp.zeros(n_tiles + 2, dtype=jnp.int32).at[tile_sorted].add(1)
    tile_starts = jnp.concatenate([
        jnp.zeros(1, dtype=jnp.int32),
        jnp.cumsum(hist_t[:n_tiles + 1]).astype(jnp.int32)])[:n_tiles + 1]

    return TileInstances(gauss_id=g_sorted, tile_id=tile_sorted,
                         valid=valid_sorted,
                         n_instances=total,
                         n_dropped=jnp.maximum(total - cap, 0),
                         inv_perm=inv_perm,
                         tile_starts=tile_starts,
                         gauss_offsets=offs.astype(jnp.int32),
                         gauss_cover=n_cover.astype(jnp.int32))


def align_tile_segments(inst: TileInstances, n_tiles: int,
                        align: int = 8) -> TileInstances:
    """Re-pack instances so every tile segment starts at a multiple of
    `align` rows (Mosaic DMA slices of the packed (CAP, 16) instance
    buffer must be 8-row aligned). Pure gathers — no scatter.

    The padded capacity is cap + n_tiles*align (static)."""
    cap = inst.gauss_id.shape[0]
    counts = inst.tile_starts[1:] - inst.tile_starts[:-1]      # (n_tiles,)
    aligned = -(-counts // align) * align
    pstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(aligned).astype(jnp.int32)])
    cap_pad = cap + n_tiles * align

    # padded row p -> tile t(p) = #(pstart[1:] <= p), via histogram+cumsum
    hist = jnp.zeros(cap_pad + 1, jnp.int32).at[
        jnp.clip(pstart[1:], 0, cap_pad)].add(1)
    t_of_p = jnp.cumsum(hist[:cap_pad]).astype(jnp.int32)
    t_of_p = jnp.clip(t_of_p, 0, n_tiles - 1)
    ttab = jnp.stack([pstart[:n_tiles], counts,
                      inst.tile_starts[:n_tiles]], axis=1)
    tg = ttab[t_of_p]                                          # (cap_pad, 3)
    r_local = jnp.arange(cap_pad, dtype=jnp.int32) - tg[:, 0]
    real = r_local < tg[:, 1]
    src = jnp.clip(tg[:, 2] + r_local, 0, cap - 1)

    stab = jnp.stack([inst.gauss_id, inst.tile_id,
                      inst.valid.astype(jnp.int32)], axis=1)
    sg = stab[src]                                             # (cap_pad, 3)
    gauss_id = jnp.where(real, sg[:, 0], 0)
    tile_id = jnp.where(real, sg[:, 1], n_tiles)
    valid = real & (sg[:, 2] > 0)

    # original slot s previously lived at sorted row inv_perm[s]; its new
    # padded position is pstart[tile(r)] + (r - tile_starts[tile(r)]).
    r_old = inst.inv_perm
    t_old = jnp.clip(inst.tile_id[jnp.clip(r_old, 0, cap - 1)], 0, n_tiles - 1)
    otab = jnp.stack([pstart[:n_tiles], inst.tile_starts[:n_tiles]], axis=1)
    og = otab[t_old]
    new_pos = og[:, 0] + (r_old - og[:, 1])
    inv_perm = jnp.clip(new_pos, 0, cap_pad - 1)

    return TileInstances(gauss_id=gauss_id, tile_id=tile_id, valid=valid,
                         n_instances=inst.n_instances,
                         n_dropped=inst.n_dropped,
                         inv_perm=inv_perm, tile_starts=pstart,
                         gauss_offsets=inst.gauss_offsets,
                         gauss_cover=inst.gauss_cover)
