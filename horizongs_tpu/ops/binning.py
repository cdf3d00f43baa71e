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
     compositor needs. Segments are NOT re-packed to G-aligned starts:
     the Pallas kernels read each segment from the floor-aligned chunk
     base and mask the leading columns, so the expensive realignment
     gather pass is unnecessary. The backward kernel writes per-instance
     gradients to a *separate* G-aligned column layout (`out_starts` /
     `grad_slot`) so its block DMA writes stay disjoint per tile.

Everything is O(CAP log CAP) in XLA ops with static shapes — recompiles
only when CAP changes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

GRAD_ALIGN = 128    # == raster kernels' chunk size G


def grad_capacity(cap: int, n_tiles: int, align: int = GRAD_ALIGN) -> int:
    """Static column count of the backward kernel's gradient buffer: each
    tile's padded span ceil((lead+count)/G)*G costs at most count+2G-2
    columns, and real-tile counts sum to <= cap. The final `align`
    columns are the SENTINEL block — provably beyond every tile's
    columns — where `build_tile_instances` routes invalid slots and
    which the backward kernels zero, so the gradient un-sort gather
    needs no runtime validity mask."""
    return cap + 2 * align * n_tiles + align


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
    # aligned gradient-output layout (see module docstring)
    out_starts: jnp.ndarray   # (n_tiles+1,) int32 G-aligned grad columns
    grad_slot: jnp.ndarray    # (CAP,) int32 slot -> grad buffer column
    slot_chunk: jnp.ndarray   # (CAP,) int32 chunk index within the tile
    slot_tile: jnp.ndarray    # (CAP,) int32 owning tile (clipped)


def tile_spans(means2d: jnp.ndarray, rx: jnp.ndarray, ry: jnp.ndarray,
               n_tiles_x: int, n_tiles_y: int, tile_w: int, tile_h: int):
    """Inclusive tile index ranges covered by each gaussian's AABB
    (per-axis half-extents rx/ry; pass the same array twice for a
    circle)."""
    x0 = jnp.floor((means2d[:, 0] - rx) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((means2d[:, 0] + rx) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((means2d[:, 1] - ry) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((means2d[:, 1] + ry) / tile_h).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, n_tiles_x - 1)
    x1 = jnp.clip(x1, 0, n_tiles_x - 1)
    y0 = jnp.clip(y0, 0, n_tiles_y - 1)
    y1 = jnp.clip(y1, 0, n_tiles_y - 1)
    return x0, x1, y0, y1


def ellipse_extents(conics: jnp.ndarray, opacities: jnp.ndarray,
                    alpha_cutoff: float = 1.0 / 255.0):
    """Per-axis half-extents of the alpha >= cutoff region and the sigma
    threshold tau.

    The compositor zeroes alpha = op*exp(-sigma) below the cutoff, i.e.
    keeps sigma <= tau := ln(op/cutoff). With sigma = ½ dᵀQd (Q = conic
    [[a,b],[b,c]], PSD after the eps2d low-pass), that region is the
    ellipse with AABB half-extents sqrt(2·tau·c/det), sqrt(2·tau·a/det).
    Like `cull_radius` this is LOSSLESS w.r.t. the compositor's cutoff —
    and strictly tighter for anisotropic splats, whose bounding circle
    (max eigenvalue) over-covers by the axis ratio."""
    a = conics[:, 0]
    b = conics[:, 1]
    c = conics[:, 2]
    tau = jnp.log(jnp.clip(opacities, 1e-12, None) / alpha_cutoff)
    tau = jnp.clip(tau, 0.0, None)
    det = jnp.clip(a * c - b * b, 1e-12, None)
    rx = jnp.sqrt(2.0 * tau * c / det)
    ry = jnp.sqrt(2.0 * tau * a / det)
    return rx, ry, tau


def cull_radius(radii: jnp.ndarray, opacities: jnp.ndarray,
                alpha_cutoff: float = 1.0 / 255.0,
                guard_px: float = 0.0) -> jnp.ndarray:
    """Opacity-exact cull radius  r * sqrt(2*ln(op/cutoff))/3  (with
    r = 3*sigma_max): beyond it the splat's alpha is provably below the
    compositor's cutoff, so binning against this radius (square span AND
    rect-circle test) is LOSSLESS — the kernel and the dense oracle both
    zero those contributions anyway. For op > 0.35 this is slightly
    LARGER than the 3-sigma heuristic (gsplat cuts such tails; we keep
    them, matching the oracle exactly). `guard_px`: never *shrink* below
    the geometric radius for splats smaller than this (the 2DGS low-pass
    bound 2*d^2 >= s^2 needs r >= ~2.2px for the argument to hold)."""
    # gradient-safe sqrt: for op <= cutoff the clip zeroes the forward,
    # but sqrt'(0) = inf would make the chained VJP 0*inf = NaN the
    # moment radii enters any differentiable tensor (the band-sharded
    # step packs radii into the exchanged records) — double-where keeps
    # both forward and backward finite
    inner = 2.0 * jnp.log(jnp.clip(opacities, 1e-12, None) / alpha_cutoff)
    pos = inner > 0
    s = jnp.where(pos, jnp.sqrt(jnp.where(pos, inner, 1.0)), 0.0)
    factor = s / 3.0
    if guard_px > 0:
        factor = jnp.where(radii >= guard_px, factor,
                           jnp.maximum(factor, 1.0))
    return radii * factor


def count_tile_instances(means2d: jnp.ndarray, radii: jnp.ndarray,
                         n_tiles_x: int, n_tiles_y: int,
                         tile_w: int, tile_h: int,
                         conics=None, opacities=None) -> jnp.ndarray:
    """Number of (gaussian, tile) instance slots the AABB spans enumerate
    — exactly the count `build_tile_instances` needs capacity for (its
    rect-ellipse/circle test culls *within* the enumerated slots, so the
    span count is the right capacity measure). O(N), jittable; use with
    `raster_pallas.suggest_instance_cap` to calibrate the static cap
    instead of the worst-case default. Pass the same conics/opacities as
    `build_tile_instances` to match its (tighter) ellipse spans."""
    if conics is not None:
        rx, ry, _ = ellipse_extents(conics, opacities)
        rx = jnp.where(radii > 0, rx, 0.0)
        ry = jnp.where(radii > 0, ry, 0.0)
    else:
        rx = ry = radii
    x0, x1, y0, y1 = tile_spans(means2d, rx, ry, n_tiles_x, n_tiles_y,
                                tile_w, tile_h)
    n_cover = jnp.where(radii > 0, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return jnp.sum(n_cover)


def build_tile_instances(means2d: jnp.ndarray, radii: jnp.ndarray,
                         depths: jnp.ndarray, n_tiles_x: int, n_tiles_y: int,
                         tile_w: int, tile_h: int, cap: int,
                         conics=None, opacities=None) -> TileInstances:
    """With `conics`+`opacities` (3DGS): spans come from the exact
    alpha-cutoff ellipse AABB and candidates are pruned with an exact
    rect-ellipse test — both lossless w.r.t. the compositor's cutoff and
    strictly tighter than the bounding circle for anisotropic splats
    (fewer instances -> every downstream sort/gather/kernel chunk
    shrinks). Without them: circle spans + rect-circle test (`radii`)."""
    n_tiles = n_tiles_x * n_tiles_y
    N = means2d.shape[0]
    valid_g = radii > 0
    if conics is not None:
        ell_rx, ell_ry, ell_tau = ellipse_extents(conics, opacities)
        span_rx = jnp.where(valid_g, ell_rx, 0.0)
        span_ry = jnp.where(valid_g, ell_ry, 0.0)
    else:
        span_rx = span_ry = radii

    x0, x1, y0, y1 = tile_spans(means2d, span_rx, span_ry, n_tiles_x,
                                n_tiles_y, tile_w, tile_h)
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
    cols = [offs.astype(jnp.float32),
            n_cover.astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            wspan.astype(jnp.float32),
            depths.astype(jnp.float32),
            means2d[:, 0], means2d[:, 1]]
    if conics is not None:
        cols += [conics[:, 0], conics[:, 1], conics[:, 2], ell_tau]
    else:
        cols += [radii]
    table = jnp.stack(cols, axis=1)
    got = table[g].astype(jnp.float32)                        # (cap, 9|12)
    start = got[:, 0].astype(jnp.int32) - got[:, 1].astype(jnp.int32)
    local = slots - start
    w = jnp.maximum(got[:, 4].astype(jnp.int32), 1)
    # vector-divisor int div; local <= max tile coverage (~2k) so exact
    # in f32 with the +0.5 trick
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / w.astype(jnp.float32)).astype(jnp.int32)
    tx = got[:, 2].astype(jnp.int32) + (local - q * w)
    ty = got[:, 3].astype(jnp.int32) + q
    valid_slot = slots < total
    mx, my = got[:, 6], got[:, 7]
    rx0 = (tx * tile_w).astype(jnp.float32)
    ry0 = (ty * tile_h).astype(jnp.float32)
    if conics is not None:
        # exact rect-ellipse test: min of sigma = ½(a·dx² + 2b·dx·dy +
        # c·dy²) over the tile rectangle vs tau. The minimum is 0 when
        # the center lies inside; otherwise it is on one of the four
        # edges, where the 1D quadratic minimizer clamps to the edge
        # range. A splat this rejects has alpha < cutoff at every pixel
        # of the tile — the compositor would zero it anyway (lossless).
        a, b, c = got[:, 8], got[:, 9], got[:, 10]
        tau = got[:, 11]
        xlo, xhi = rx0 - mx, rx0 + tile_w - mx
        ylo, yhi = ry0 - my, ry0 + tile_h - my

        def q(dx, dy):
            return 0.5 * a * dx * dx + b * dx * dy + 0.5 * c * dy * dy

        def edge_x(X):
            ys = jnp.clip(-b * X / jnp.maximum(c, 1e-12), ylo, yhi)
            return q(X, ys)

        def edge_y(Y):
            xs = jnp.clip(-b * Y / jnp.maximum(a, 1e-12), xlo, xhi)
            return q(xs, Y)

        qmin = jnp.minimum(jnp.minimum(edge_x(xlo), edge_x(xhi)),
                           jnp.minimum(edge_y(ylo), edge_y(yhi)))
        inside = (xlo <= 0) & (xhi >= 0) & (ylo <= 0) & (yhi >= 0)
        qmin = jnp.where(inside, 0.0, qmin)
        # small sigma slack absorbs f32 roundoff in qmin vs the kernel's
        # alpha evaluation (a borderline splat is worth <= cutoff alpha)
        hit = qmin <= tau + 1e-3
    else:
        # exact rect-circle test: the square AABB span keeps corner
        # tiles the splat's cull circle never touches (~21% of
        # candidates). Distance from the tile rectangle to the center
        # vs the cull radius is exact w.r.t. the alpha cutoff when
        # `radii` comes through `cull_radius`.
        r = got[:, 8]
        ddx = mx - jnp.clip(mx, rx0, rx0 + tile_w)
        ddy = my - jnp.clip(my, ry0, ry0 + tile_h)
        hit = (ddx * ddx + ddy * ddy) <= r * r
    valid_slot = valid_slot & hit
    tile_id = jnp.where(valid_slot, ty * n_tiles_x + tx, n_tiles)

    # lexicographic (tile, depth) sort: the raw f32 depth bits are an
    # ascending int32 key for positive floats, so no depth pre-ranking
    # pass is needed (a two-key sort costs ~15% more than a fused-key
    # one-key sort, but the N-sized argsort+rank pair it replaces costs
    # ~4x that). Invalid slots carry tile_id == n_tiles -> sorted last.
    depth_bits = jax.lax.bitcast_convert_type(got[:, 5], jnp.int32)
    tile_sorted, _, g_sorted, perm = jax.lax.sort(
        (tile_id, depth_bits, g, slots), num_keys=2)
    valid_sorted = tile_sorted < n_tiles

    # inverse permutation via a second radix sort (scatter would serialize)
    _, inv_perm = jax.lax.sort((perm, slots), num_keys=1)

    # per-tile segment starts: binary search over the sorted tile ids
    # (n_tiles+1 queries; a 600k-element scatter-add histogram costs ~6ms
    # on TPU, this costs ~1.5ms)
    tile_starts = jnp.searchsorted(
        tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)

    # aligned gradient-output layout: tile t's backward chunk i writes its
    # (INST_DIM, G) grad block at column out_starts[t] + i*G; chunks cover
    # [base_t, base_t + n_chunks_t*G) of the instance buffer where
    # base_t = floor(start_t/G)*G, so instance at sorted row r lands at
    # out_starts[t] + (lead_t + r - start_t).
    A = GRAD_ALIGN
    starts_t = tile_starts[:n_tiles]
    counts_t = tile_starts[1:] - starts_t
    lead_t = starts_t - (starts_t // A) * A
    n_chunks_t = jnp.where(counts_t > 0, -(-(lead_t + counts_t) // A), 0)
    out_starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(n_chunks_t * A).astype(jnp.int32)])
    cap_out = grad_capacity(cap, n_tiles, A)

    t_slot = jnp.clip(tile_id, 0, n_tiles - 1)                 # (cap,)
    ttab = jnp.stack([out_starts[:n_tiles] + lead_t - starts_t,
                      out_starts[:n_tiles]], axis=1)
    tg = ttab[t_slot]                                          # (cap, 2)
    # invalid slots (overflow or ellipse/circle-culled) route to the
    # sentinel block (the last A columns), which the backward kernels
    # write as zeros — the grad gather then needs no validity mask
    grad_slot = jnp.where(tile_id < n_tiles,
                          jnp.clip(tg[:, 0] + inv_perm, 0, cap_out - 1),
                          cap_out - A)
    slot_chunk = jnp.where(tile_id < n_tiles,
                           (grad_slot - tg[:, 1]) // A,
                           jnp.int32(2 ** 30))

    return TileInstances(gauss_id=g_sorted, tile_id=tile_sorted,
                         valid=valid_sorted,
                         n_instances=total,
                         n_dropped=jnp.maximum(total - cap, 0),
                         inv_perm=inv_perm,
                         tile_starts=tile_starts,
                         gauss_offsets=offs.astype(jnp.int32),
                         gauss_cover=n_cover.astype(jnp.int32),
                         out_starts=out_starts,
                         grad_slot=grad_slot,
                         slot_chunk=slot_chunk,
                         slot_tile=t_slot)
