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
    band_rows: int    # tile rows per band
    n_tiles_y: int    # real tile rows in the full image
    height: int       # full image height (pixels)
    width: int

    @property
    def band_px(self) -> int:
        return self.band_rows * self.tile_h


def band_layout(height: int, width: int, n_model: int,
                tile_h: int) -> BandLayout:
    n_tiles_y = -(-height // tile_h)
    band_rows = -(-n_tiles_y // n_model)
    return BandLayout(n_model=n_model, tile_h=tile_h, band_rows=band_rows,
                      n_tiles_y=n_tiles_y, height=height, width=width)


def band_span(means2d_y: jnp.ndarray, ry: jnp.ndarray,
              layout: BandLayout, halo_px: int = 0):
    """Inclusive band index range [b0, b1] each splat's vertical extent
    touches (same AABB rule as `binning.tile_spans`, collapsed to y).

    `halo_px`: extend each band's owned row range by this many pixels on
    both sides — a splat is then routed to every band whose EXTENDED
    range it touches, so each device can composite its band plus halo
    rows locally, identical to the neighbor's composite of those rows
    (this removes the post-composite halo ppermute entirely)."""
    if halo_px:
        band_px = layout.band_px
        b0 = jnp.floor((means2d_y - ry - halo_px) / band_px)
        b1 = jnp.floor((means2d_y + ry + halo_px) / band_px)
        b0 = jnp.clip(b0, 0, layout.n_model - 1).astype(jnp.int32)
        b1 = jnp.clip(b1, 0, layout.n_model - 1).astype(jnp.int32)
        return b0, b1
    ty0 = jnp.floor((means2d_y - ry) / layout.tile_h).astype(jnp.int32)
    ty1 = jnp.floor((means2d_y + ry) / layout.tile_h).astype(jnp.int32)
    ty0 = jnp.clip(ty0, 0, layout.n_tiles_y - 1)
    ty1 = jnp.clip(ty1, 0, layout.n_tiles_y - 1)
    return ty0 // layout.band_rows, ty1 // layout.band_rows


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
