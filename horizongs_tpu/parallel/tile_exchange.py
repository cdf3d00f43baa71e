"""Tile-band record exchange: route projected splats to band owners.

The image's tile rows are split into `n_model` contiguous bands; device m
owns tile rows [m*band_rows, (m+1)*band_rows). Each device projects only
its local anchor shard's gaussians and sends each resulting splat record
to the band(s) its screen footprint touches — an `all_to_all` of compact
(10-20 float) records over ICI, replacing the all_gather of full decoded
gaussians. Each device then bins + composites ONLY its band: pixel FLOPs
and instance memory scale 1/n_model, and no device ever holds the full
decoded set (SURVEY.md §2.3; the reference has no distribution at all —
its per-tile ownership exists only inside one GPU's rasterize launch,
`gaussian_renderer/render.py:40-76`).

Static shapes: each (src, dst) pair carries `send_cap` record slots,
compacted per destination with one row-wise sort (no scatter). Overflow
is dropped and counted, never silent — the trainer recalibrates the cap
the same way it handles tile-instance overflow.

The exchange is an ordinary differentiable gather + `lax.all_to_all`:
record gradients ride the transposed collective back to the owning
shard, and a record sent to two bands receives the sum of both bands'
gradients through the gather transpose.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BandLayout(NamedTuple):
    n_model: int
    tile_h: int
    band_rows: int    # tile rows of the TALLEST band (static shapes)
    n_tiles_y: int    # real tile rows in the full image
    height: int       # full image height (pixels)
    width: int
    # band boundaries in tile-row units, len n_model+1, bounds[0] = 0,
    # bounds[-1] >= n_tiles_y. Uniform by default; `suggest_band_bounds`
    # produces load-balanced ones (street views concentrate splats near
    # the horizon — contiguous uniform bands there skew 1.5-1.8x,
    # SCALING.json load_imbalance)
    bounds: tuple = ()

    @property
    def band_px(self) -> int:
        """Pixel height of the tallest band — the static composite
        height every device uses (shorter bands mask their tail)."""
        return self.band_rows * self.tile_h

    @property
    def starts_px(self) -> tuple:
        return tuple(b * self.tile_h for b in self.bounds[:-1])

    @property
    def heights_px(self) -> tuple:
        return tuple((b1 - b0) * self.tile_h
                     for b0, b1 in zip(self.bounds[:-1], self.bounds[1:]))


def band_layout(height: int, width: int, n_model: int,
                tile_h: int, bounds=None) -> BandLayout:
    n_tiles_y = -(-height // tile_h)
    if bounds is None:
        # uniform: every band spans the same tile-row count (trailing
        # bands may be phantom past the image bottom)
        rows = -(-n_tiles_y // n_model)
        bounds = tuple(m * rows for m in range(n_model + 1))
    bounds = tuple(int(b) for b in bounds)
    if len(bounds) != n_model + 1 or bounds[0] != 0:
        raise ValueError(f"bounds must be n_model+1 tile-row offsets "
                         f"starting at 0, got {bounds}")
    if any(b1 <= b0 for b0, b1 in zip(bounds[:-1], bounds[1:])):
        raise ValueError(f"bounds must be strictly increasing: {bounds}")
    if bounds[-1] < n_tiles_y:
        raise ValueError(f"bounds {bounds} do not cover the image's "
                         f"{n_tiles_y} tile rows")
    band_rows = max(b1 - b0 for b0, b1 in zip(bounds[:-1], bounds[1:]))
    return BandLayout(n_model=n_model, tile_h=tile_h, band_rows=band_rows,
                      n_tiles_y=n_tiles_y, height=height, width=width,
                      bounds=bounds)


def band_span(means2d_y: jnp.ndarray, ry: jnp.ndarray,
              layout: BandLayout, halo_px: int = 0):
    """Inclusive band index range [b0, b1] each splat's vertical extent
    touches (same AABB rule as `binning.tile_spans`, collapsed to y).

    `halo_px`: extend each band's owned row range by this many pixels on
    both sides — a splat is then routed to every band whose EXTENDED
    range it touches, so each device can composite its band plus halo
    rows locally, identical to the neighbor's composite of those rows
    (this removes the post-composite halo ppermute entirely).

    Works for arbitrary (load-balanced) boundaries: band_of(q) is the
    band whose pixel range contains q, computed as a sum of comparisons
    against the n_model-1 interior boundaries (bands align to tile rows,
    so this equals the historical tile-quantized uniform formula)."""
    starts = [b * layout.tile_h for b in layout.bounds[1:-1]]
    lo = means2d_y - ry - halo_px
    hi = means2d_y + ry + halo_px
    if not starts:
        z = jnp.zeros(means2d_y.shape, jnp.int32)
        return z, z
    sb = jnp.asarray(starts, means2d_y.dtype)
    b0 = jnp.sum(lo[:, None] >= sb[None, :], axis=1).astype(jnp.int32)
    b1 = jnp.sum(hi[:, None] >= sb[None, :], axis=1).astype(jnp.int32)
    return b0, b1


def route_records(records: jnp.ndarray, means2d_y: jnp.ndarray,
                  ry: jnp.ndarray, valid: jnp.ndarray,
                  layout: BandLayout, send_cap: int,
                  halo_px: int = 0):
    """Compact records into per-destination send blocks.

    records: (K, R) rows to route (row must self-invalidate when zeroed —
    the binning radius column is 0). Returns (send (n_model*send_cap, R),
    n_dropped ()). Pure per-device code — usable outside shard_map for
    unit tests."""
    K = records.shape[0]
    b0, b1 = band_span(means2d_y, ry, layout, halo_px)
    dests = jnp.arange(layout.n_model, dtype=jnp.int32)[:, None]
    mask = valid[None, :] & (b0[None, :] <= dests) & (dests <= b1[None, :])
    # per-destination compaction: keys == row index when routed, K when
    # not; a row-wise sort lists each destination's row indices first
    keys = jnp.where(mask, jnp.arange(K, dtype=jnp.int32)[None, :], K)
    keys = jnp.sort(keys, axis=1)[:, :send_cap]            # (n_model, S)
    slot_valid = keys < K
    idx = jnp.minimum(keys, K - 1).reshape(-1)
    send = records[idx] * slot_valid.reshape(-1)[:, None].astype(
        records.dtype)
    n_dropped = jnp.sum(mask) - jnp.sum(slot_valid)
    return send, n_dropped


def exchange_records(records: jnp.ndarray, means2d_y: jnp.ndarray,
                     ry: jnp.ndarray, valid: jnp.ndarray,
                     layout: BandLayout, send_cap: int,
                     axis_name: str = "model", halo_px: int = 0):
    """Route + all_to_all. Inside shard_map over `axis_name` only.
    Returns (recv (n_model*send_cap, R), n_dropped ()) — recv rows are
    the records every shard routed to THIS device's band (+halo rows
    when `halo_px` > 0: the receiver composites its halo locally)."""
    if layout.n_model == 1 and send_cap >= records.shape[0]:
        # degenerate single-band mesh: every record already belongs to
        # this device — skip the routing sort + gather entirely (the
        # sort-based compaction is pure overhead here and its gather
        # transpose turns into a scatter in the backward)
        keep = valid.astype(records.dtype)[:, None]
        return records * keep, jnp.zeros((), jnp.int32)
    send, n_dropped = route_records(records, means2d_y, ry, valid,
                                    layout, send_cap, halo_px)
    if layout.n_model == 1:
        return send, n_dropped
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    return recv, n_dropped


def exchange_halo(x: jnp.ndarray, halo: int, n_model: int,
                  axis_name: str = "model") -> jnp.ndarray:
    """Extend a band image (rows, W, C) with `halo` rows from the
    vertically adjacent bands: device m receives the bottom rows of m-1
    above and the top rows of m+1 below (zeros at the mesh ends — the
    same zero padding the full-image SSIM window uses at the image
    border). Differentiable: halo gradients ride the transposed
    ppermutes back to the producing band. Inside shard_map only."""
    if halo <= 0:
        return x
    top = x[:halo]
    bot = x[x.shape[0] - halo:]
    if n_model == 1:
        z = jnp.zeros_like(top)
        return jnp.concatenate([z, x, z], axis=0)
    from_below = jax.lax.ppermute(
        top, axis_name, [(m, m - 1) for m in range(1, n_model)])
    from_above = jax.lax.ppermute(
        bot, axis_name, [(m, m + 1) for m in range(n_model - 1)])
    return jnp.concatenate([from_above, x, from_below], axis=0)


def count_routed_records(means2d_y: jnp.ndarray, ry: jnp.ndarray,
                         valid: jnp.ndarray, layout: BandLayout,
                         halo_px: int = 0):
    """Max records any single destination band receives from this shard —
    the quantity `send_cap` must cover. Jittable; use max over sample
    views x margin to calibrate (mirrors `count_render_instances`)."""
    b0, b1 = band_span(means2d_y, ry, layout, halo_px)
    dests = jnp.arange(layout.n_model, dtype=jnp.int32)[:, None]
    mask = valid[None, :] & (b0[None, :] <= dests) & (dests <= b1[None, :])
    return jnp.max(jnp.sum(mask, axis=1))


def count_tile_row_loads(means2d_y: jnp.ndarray, ry: jnp.ndarray,
                         valid: jnp.ndarray, n_tiles_y: int,
                         tile_h: int) -> jnp.ndarray:
    """Records whose vertical extent touches each tile row — the load
    profile `suggest_band_bounds` balances over. Jittable, O(K) per
    row (n_tiles_y is small: 34 at 1080p/32px tiles)."""
    ty0 = jnp.clip(jnp.floor((means2d_y - ry) / tile_h), 0,
                   n_tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((means2d_y + ry) / tile_h), 0,
                   n_tiles_y - 1).astype(jnp.int32)
    rows = jnp.arange(n_tiles_y, dtype=jnp.int32)[:, None]
    touch = (valid[None, :] & (ty0[None, :] <= rows)
             & (rows <= ty1[None, :]))
    return jnp.sum(touch, axis=1)


def suggest_band_bounds(row_loads, n_model: int) -> tuple:
    """Load-balanced band boundaries (tile-row units, len n_model+1)
    from a per-tile-row record-load profile: cut the cumulative load at
    equal quantiles, each band keeping >= 1 tile row. On street-like
    views splats pile up near the horizon and uniform contiguous bands
    skew 1.5-1.8x worst/mean (SCALING.json load_imbalance) — the
    synchronous step waits on the slowest band, so balanced cuts buy
    that factor back. Boundaries feed `band_layout(bounds=...)`;
    changing them recompiles the step (quantized to tile rows, so they
    are stable across minor load drift)."""
    import numpy as np
    loads = np.asarray(row_loads, np.float64)
    n_rows = len(loads)
    cdf = np.concatenate([[0.0], np.cumsum(loads)])
    total = max(cdf[-1], 1.0)
    bounds = [0]
    for m in range(1, n_model):
        target = total * m / n_model
        # NEAREST boundary to the quantile (a plain left-search lumps a
        # whole spike row into the band before the cut)
        i = int(np.searchsorted(cdf, target, side="left"))
        i = min(i, n_rows)
        if i > 0 and target - cdf[i - 1] <= cdf[i] - target:
            i -= 1
        # strictly increasing; prefer staying inside the image but fall
        # back to phantom rows past the bottom when n_rows < n_model
        b = max(i, bounds[-1] + 1)
        if b > n_rows - (n_model - m) and n_rows - (n_model - m) > bounds[-1]:
            b = n_rows - (n_model - m)
        bounds.append(b)
    bounds.append(max(n_rows, bounds[-1] + 1))
    return tuple(bounds)


def suggest_band_cap(n_records: int, margin: float = 1.25,
                     align: int = 8) -> int:
    """Round a measured per-(src shard, dst band) record count up to a
    geometric capacity bucket (4 buckets per octave) — the band-exchange
    analog of `ops.raster_pallas.suggest_instance_cap`. The all_to_all
    send/recv buffers are (n_model * cap, R) rows, so a calibrated cap is
    what makes per-device instance memory actually scale ~1/n_model (the
    uncalibrated default, cap = every local record, sizes the recv buffer
    at the full scene)."""
    import math
    need = max(int(math.ceil(max(n_records, 1) * margin)), align)
    k = max(int(math.ceil(4 * math.log2(need / align))), 0)
    cap = int(math.ceil(align * 2 ** (k / 4)))
    return -(-cap // align) * align
