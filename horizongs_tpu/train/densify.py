"""Densification: gradient-driven anchor growing + opacity pruning.

Host-side (numpy) resize epoch, run every `update_interval` iterations —
the functional replacement for the reference's in-place optimizer surgery
(`basic_model.py:212-295`, `base_model.py:393-465`, `lod_model.py:466-596`).
Tables come back capacity-padded; a capacity increase simply retriggers
jit specialization of the train step.

Semantics preserved:
  * growing_type mean: grads = accum/denom;  max: grads = accum scaled by
    max_radii2d * opacity^(1/5), gated by opacity > 0.15
  * flat model: `update_depth` rounds of coarser voxel grids with
    threshold x (update_hierachy_factor//2)^i and random decimation
  * LOD model: per-level thresholds x fork^(update_ratio*level),
    extra_level promotion (extra_ratio/extra_up), fine stage adds at
    max(level+1, aerial_levels), weed-out of candidates
  * voxel dedup with feature inheritance via per-voxel max (the
    torch_scatter.scatter_max equivalent)
  * pruning restricted by stage to aerial/street levels (LOD)
  * Adam moments: pruned rows dropped, new rows start at zero
  * scaling clamp on prune: raw scaling_log[:, 3:] capped at 0.05
    (`basic_model.py:162-166`)
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from horizongs_tpu.models.anchors import round_capacity, weed_out_mask
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.train.optim import AdamState, TrainableParams
from horizongs_tpu.train.step import DensifyStats, TrainState, init_stats


def _np(x):
    return np.asarray(x)


def _scatter_max_by_group(values: np.ndarray, groups: np.ndarray,
                          n_groups: int) -> np.ndarray:
    """Per-group elementwise max (torch_scatter.scatter_max equivalent,
    used for feature inheritance at `base_model.py:439`)."""
    out = np.full((n_groups,) + values.shape[1:], -np.inf, dtype=values.dtype)
    np.maximum.at(out, groups, values)
    out[~np.isfinite(out)] = 0.0
    return out


def _rows_as_void(a: np.ndarray) -> np.ndarray:
    """(N, 3) int64 rows -> (N,) void keys (byte-wise row equality)."""
    a = np.ascontiguousarray(a)
    return a.view(np.dtype((np.void, a.dtype.itemsize * a.shape[1])))[:, 0]


def _dedup_against(existing: np.ndarray, candidates: np.ndarray) -> np.ndarray:
    """True for candidate grid coords already present in `existing`
    (`get_remove_duplicates`, `basic_model.py:179-190`).

    Sort-based membership on packed row keys: O((E+C) log(E+C)) numpy
    work — the reference does this as a GPU float-matmul coordinate
    compare; a Python set over `.tolist()` rows would dominate the
    densify epoch at city scale (10^6+ anchors)."""
    if existing.shape[0] == 0 or candidates.shape[0] == 0:
        return np.zeros(candidates.shape[0], dtype=bool)
    return np.isin(_rows_as_void(candidates), _rows_as_void(existing))


def _grow_flat(cfg: ModelConfig, opt, live: dict, grads_norm: np.ndarray,
               offset_mask: np.ndarray, rng: np.random.Generator,
               voxel_size: float):
    """Flat-model growth (`base_model.py:393-465`). Mutates `live` dict of
    numpy arrays (anchor/offset/feat/scaling_log/rotation/level/extra_level
    + adam moment rows + anchor stats rows)."""
    k = cfg.n_offsets
    init_count = live["anchor"].shape[0]
    for i in range(cfg.update_depth):
        cur_threshold = opt.densify_grad_threshold * ((cfg.update_hierachy_factor // 2) ** i)
        n_now = live["anchor"].shape[0]
        cand = np.zeros(n_now * k, dtype=bool)
        base_len = init_count * k
        cand[:base_len] = (grads_norm >= cur_threshold) & offset_mask
        keep = rng.random(cand.shape[0]) > (0.5 ** (i + 1))
        cand &= keep

        size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor ** i)
        cur_size = voxel_size * size_factor

        all_xyz = (live["anchor"][:, None, :]
                   + live["offset"] * np.exp(live["scaling_log"])[:, None, :3]
                   ).reshape(-1, 3)
        grid_coords = np.round(live["anchor"] / cur_size - cfg.padding).astype(np.int64)
        sel_xyz = all_xyz[cand]
        sel_coords = np.round(sel_xyz / cur_size - cfg.padding).astype(np.int64)
        uniq, inverse = np.unique(sel_coords, axis=0, return_inverse=True)
        if getattr(opt, "overlap", False):
            keep_new = np.ones(uniq.shape[0], dtype=bool)
        else:
            keep_new = ~_dedup_against(grid_coords, uniq)
        cand_anchor = uniq[keep_new].astype(np.float32) * cur_size + cfg.padding * cur_size
        if cand_anchor.shape[0] == 0:
            continue
        feat_rep = np.repeat(live["feat"], k, axis=0)[cand]
        new_feat = _scatter_max_by_group(feat_rep, inverse, uniq.shape[0])[keep_new]
        _append_rows(cfg, live, cand_anchor, new_feat,
                     np.log(np.full((cand_anchor.shape[0], 6), cur_size,
                                    dtype=np.float32)),
                     np.zeros(cand_anchor.shape[0], dtype=np.int32))


def _grow_lod(cfg: ModelConfig, opt, live: dict, grads_norm: np.ndarray,
              offset_mask: np.ndarray, stage: str,
              cam_infos: Optional[np.ndarray], weed_ratio: float):
    """LOD growth (`lod_model.py:487-596`)."""
    k = cfg.n_offsets
    init_count = live["anchor"].shape[0]
    grads = grads_norm.copy()
    grads[~offset_mask] = 0.0
    anchor_grads = (grads.reshape(-1, k).sum(axis=1)
                    / (offset_mask.reshape(-1, k).sum(axis=1) + 1e-6))
    update_value = cfg.fork ** opt.update_ratio
    for cur_level in range(cfg.street_levels):
        if stage == "coarse":
            add_level = cur_level
        elif stage == "fine":
            add_level = max(cur_level + 1, cfg.aerial_levels)
        else:
            raise ValueError(f"invalid training stage {stage}")
        n_now = live["anchor"].shape[0]
        cur_level_mask = live["level"][:init_count] == cur_level
        if cur_level_mask.sum() == 0:
            continue
        add_level_mask = live["level"] == add_level

        cur_threshold = opt.densify_grad_threshold * (update_value ** cur_level)
        extra_threshold = cur_threshold * opt.extra_ratio

        cand = np.zeros(n_now * k, dtype=bool)
        cand[:init_count * k] = ((grads >= cur_threshold)
                                 & np.repeat(cur_level_mask, k))
        cand_extra = np.zeros(n_now, dtype=bool)
        cand_extra[:init_count] = (anchor_grads >= extra_threshold) & cur_level_mask
        if stage == "coarse":
            cand_extra &= live["level"] < cfg.aerial_levels
        else:
            cand_extra &= live["level"] >= cfg.aerial_levels
        live["extra_level"] += opt.extra_up * cand_extra.astype(np.float32)

        voxel_size = cfg.voxel_size / (float(cfg.fork) ** (add_level - cfg.aerial_levels))
        all_xyz = (live["anchor"][:, None, :]
                   + live["offset"] * np.exp(live["scaling_log"])[:, None, :3]
                   ).reshape(-1, 3)
        grid_coords = np.round(live["anchor"][add_level_mask] / voxel_size
                               - cfg.padding).astype(np.int64)
        sel_xyz = all_xyz[cand]
        sel_coords = np.round(sel_xyz / voxel_size - cfg.padding).astype(np.int64)
        uniq, inverse = np.unique(sel_coords, axis=0, return_inverse=True)
        if getattr(opt, "overlap", False):
            keep_new = np.ones(uniq.shape[0], dtype=bool)
        else:
            keep_new = ~_dedup_against(grid_coords, uniq)
        cand_anchor = uniq[keep_new].astype(np.float32) * voxel_size + cfg.padding * voxel_size
        new_level = np.full(cand_anchor.shape[0], add_level, dtype=np.int32)
        if cand_anchor.shape[0] > 0 and weed_ratio > 0 and cam_infos is not None:
            weed = weed_out_mask(cfg, cand_anchor, new_level, cam_infos, weed_ratio)
            sub = keep_new.copy()
            keep_new[sub] = weed
            cand_anchor = cand_anchor[weed]
            new_level = new_level[weed]
        if cand_anchor.shape[0] == 0:
            continue
        feat_rep = np.repeat(live["feat"], k, axis=0)[cand]
        new_feat = _scatter_max_by_group(feat_rep, inverse, uniq.shape[0])[keep_new]
        _append_rows(cfg, live,
                     cand_anchor, new_feat,
                     np.log(np.full((cand_anchor.shape[0], 6), voxel_size,
                                    dtype=np.float32)),
                     new_level)


def _append_rows(cfg: ModelConfig, live: dict, new_anchor: np.ndarray,
                 new_feat: np.ndarray, new_scaling_log: np.ndarray,
                 new_level: np.ndarray):
    m = new_anchor.shape[0]
    k = cfg.n_offsets
    rot = np.zeros((m, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    live["anchor"] = np.concatenate([live["anchor"], new_anchor])
    live["offset"] = np.concatenate(
        [live["offset"], np.zeros((m, k, 3), dtype=np.float32)])
    live["feat"] = np.concatenate([live["feat"], new_feat.astype(np.float32)])
    live["scaling_log"] = np.concatenate([live["scaling_log"], new_scaling_log])
    live["rotation"] = np.concatenate([live["rotation"], rot])
    live["level"] = np.concatenate([live["level"], new_level])
    live["extra_level"] = np.concatenate(
        [live["extra_level"], np.zeros(m, dtype=np.float32)])
    # anchor-level stats get zero rows (reference lod_model.py:579-585)
    live["anchor_opacity_accum"] = np.concatenate(
        [live["anchor_opacity_accum"], np.zeros(m, dtype=np.float32)])
    live["anchor_demon"] = np.concatenate(
        [live["anchor_demon"], np.zeros(m, dtype=np.float32)])
    # adam moments: zeros for new rows (cat_tensors_to_optimizer contract)
    for key in ("anchor", "offset", "feat", "scaling_log"):
        for mom in ("mu_", "nu_"):
            arr = live[mom + key]
            pad_shape = (m,) + arr.shape[1:]
            live[mom + key] = np.concatenate(
                [arr, np.zeros(pad_shape, dtype=arr.dtype)])


def run_densify(cfg: ModelConfig, opt, state: TrainState, iteration: int,
                stage: str = "coarse",
                rng: Optional[np.random.Generator] = None,
                cam_infos: Optional[np.ndarray] = None,
                weed_ratio: float = 0.0,
                capacity_block: int = 4096) -> TrainState:
    """One grow+prune epoch (`run_densify`, `basic_model.py:212-295`)."""
    rng = rng or np.random.default_rng(iteration)
    k = cfg.n_offsets
    n = int(state.n)
    C = state.params.anchor.shape[0]

    # ---- pull live rows to host ----
    p = state.params
    live = {
        "anchor": _np(p.anchor)[:n].copy(),
        "offset": _np(p.offset)[:n].copy(),
        "feat": _np(p.feat)[:n].copy(),
        "scaling_log": _np(p.scaling_log)[:n].copy(),
        "rotation": _np(state.rotation)[:n].copy(),
        "level": _np(state.level)[:n].copy(),
        "extra_level": _np(state.extra_level)[:n].copy(),
        "anchor_opacity_accum": _np(state.stats.anchor_opacity_accum)[:n].copy(),
        "anchor_demon": _np(state.stats.anchor_demon)[:n].copy(),
    }
    for key, attr in (("anchor", "anchor"), ("offset", "offset"),
                      ("feat", "feat"), ("scaling_log", "scaling_log")):
        live["mu_" + key] = _np(getattr(state.opt.mu, attr))[:n].copy()
        live["nu_" + key] = _np(getattr(state.opt.nu, attr))[:n].copy()

    ograd = _np(state.stats.offset_gradient_accum)[:n * k].copy()
    odenom = _np(state.stats.offset_denom)[:n * k].copy()
    oopa = _np(state.stats.offset_opacity_accum)[:n * k].copy()
    radii2d = _np(state.stats.max_radii2d)[:n * k].copy()

    # ---- grads / offset_mask (`run_densify` preamble) ----
    if opt.growing_type == "mean":
        grads = np.where(odenom > 0, ograd / np.clip(odenom, 1e-12, None), 0.0)
        grads = np.nan_to_num(grads)
        grads_norm = np.abs(grads)
        offset_mask = odenom > opt.update_interval * opt.success_threshold * 0.5
    elif opt.growing_type == "max":
        grads = np.nan_to_num(ograd)
        opac = np.nan_to_num(np.where(odenom > 0, oopa / np.clip(odenom, 1e-12, None), 0.0))
        grads_norm = np.abs(grads) * radii2d * np.power(np.clip(opac, 0, None), 1 / 5.0)
        offset_mask = (odenom > opt.update_interval * opt.success_threshold * 0.5)
        offset_mask &= opac > 0.15
    else:
        raise ValueError(f"Unknown growing_type: {opt.growing_type}")

    # ---- grow ----
    if cfg.is_lod:
        _grow_lod(cfg, opt, live, grads_norm, offset_mask, stage,
                  cam_infos, weed_ratio)
    else:
        _grow_flat(cfg, opt, live, grads_norm, offset_mask, rng,
                   cfg.voxel_size)

    n_grown = live["anchor"].shape[0]
    # reset + pad offset stats (run_densify:236-252)
    odenom[offset_mask] = 0
    ograd[offset_mask] = 0
    oopa[offset_mask] = 0
    pad = np.zeros((n_grown - n) * k, dtype=np.float32)
    odenom = np.concatenate([odenom, pad])
    ograd = np.concatenate([ograd, pad])
    oopa = np.concatenate([oopa, pad])

    # ---- prune (run_densify:254-295) ----
    if opt.pruning_type == "mean":
        prune = live["anchor_opacity_accum"] < opt.min_opacity * live["anchor_demon"]
    else:
        prune = live["anchor_opacity_accum"] < opt.min_opacity
    anchors_mask = live["anchor_demon"] > opt.update_interval * opt.success_threshold
    prune = prune & anchors_mask
    if cfg.is_lod:
        if stage == "coarse":
            prune &= live["level"] < cfg.aerial_levels
        elif stage == "fine":
            prune &= live["level"] >= cfg.aerial_levels
    keep = ~prune

    # reset stats of well-observed anchors BEFORE dropping pruned rows
    live["anchor_opacity_accum"][anchors_mask] = 0.0
    live["anchor_demon"][anchors_mask] = 0.0

    for key in ("anchor", "offset", "feat", "scaling_log", "rotation",
                "level", "extra_level", "anchor_opacity_accum",
                "anchor_demon", "mu_anchor", "nu_anchor", "mu_offset",
                "nu_offset", "mu_feat", "nu_feat", "mu_scaling_log",
                "nu_scaling_log"):
        live[key] = live[key][keep]
    # scaling clamp on prune (`_prune_anchor_optimizer`, basic_model.py:162-166)
    sl = live["scaling_log"]
    sl[:, 3:] = np.minimum(sl[:, 3:], 0.05)

    keep_off = np.repeat(keep, k)
    odenom = odenom.reshape(-1)[keep_off]
    ograd = ograd.reshape(-1)[keep_off]
    oopa = oopa.reshape(-1)[keep_off]

    # ---- repack to padded capacity (keep existing capacity while rows
    # still fit — capacity growth forces a jit respecialization) ----
    n_new = live["anchor"].shape[0]
    C_new = C if n_new <= C else round_capacity(n_new, capacity_block)

    def padto(a, rows):
        out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
        out[:a.shape[0]] = a
        return out

    rot_pad = padto(live["rotation"], C_new)
    rot_pad[n_new:, 0] = 1.0

    new_params = TrainableParams(
        anchor=jnp.asarray(padto(live["anchor"], C_new)),
        offset=jnp.asarray(padto(live["offset"], C_new)),
        feat=jnp.asarray(padto(live["feat"], C_new)),
        scaling_log=jnp.asarray(padto(live["scaling_log"], C_new)),
        mlp_opacity=p.mlp_opacity, mlp_cov=p.mlp_cov, mlp_color=p.mlp_color,
        appearance=p.appearance)
    new_mu = state.opt.mu._replace(
        anchor=jnp.asarray(padto(live["mu_anchor"], C_new)),
        offset=jnp.asarray(padto(live["mu_offset"], C_new)),
        feat=jnp.asarray(padto(live["mu_feat"], C_new)),
        scaling_log=jnp.asarray(padto(live["mu_scaling_log"], C_new)))
    new_nu = state.opt.nu._replace(
        anchor=jnp.asarray(padto(live["nu_anchor"], C_new)),
        offset=jnp.asarray(padto(live["nu_offset"], C_new)),
        feat=jnp.asarray(padto(live["nu_feat"], C_new)),
        scaling_log=jnp.asarray(padto(live["nu_scaling_log"], C_new)))

    new_stats = DensifyStats(
        anchor_opacity_accum=jnp.asarray(padto(live["anchor_opacity_accum"], C_new)),
        anchor_demon=jnp.asarray(padto(live["anchor_demon"], C_new)),
        offset_gradient_accum=jnp.asarray(padto(ograd, C_new * k)),
        offset_denom=jnp.asarray(padto(odenom, C_new * k)),
        offset_opacity_accum=jnp.asarray(padto(oopa, C_new * k)),
        max_radii2d=jnp.zeros(C_new * k),   # reference resets to zero
    )

    return TrainState(params=new_params,
                      rotation=jnp.asarray(rot_pad),
                      level=jnp.asarray(padto(live["level"], C_new)),
                      extra_level=jnp.asarray(padto(live["extra_level"], C_new)),
                      n=jnp.asarray(n_new, dtype=jnp.int32),
                      opt=AdamState(mu=new_mu, nu=new_nu, t=state.opt.t),
                      stats=new_stats)


def pad_state_capacity(state: TrainState, C_new: int) -> TrainState:
    """Grow a TrainState's padded capacity to C_new rows (no live-row
    change). Used by the sharded trainer to make the anchor table
    divisible by the mesh's "model" axis before `shard_state`."""
    C = state.params.anchor.shape[0]
    if C_new == C:
        return state
    assert C_new > C, f"cannot shrink capacity {C} -> {C_new}"
    k = state.params.offset.shape[1]

    def pad(a, rows):
        a = np.asarray(a)
        out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
        out[:a.shape[0]] = a
        return jnp.asarray(out)

    rot = np.zeros((C_new, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    rot[:C] = np.asarray(state.rotation)
    p = state.params
    new_params = p._replace(
        anchor=pad(p.anchor, C_new), offset=pad(p.offset, C_new),
        feat=pad(p.feat, C_new), scaling_log=pad(p.scaling_log, C_new))
    rep = lambda t: t._replace(
        anchor=pad(t.anchor, C_new), offset=pad(t.offset, C_new),
        feat=pad(t.feat, C_new), scaling_log=pad(t.scaling_log, C_new))
    new_stats = DensifyStats(
        anchor_opacity_accum=pad(state.stats.anchor_opacity_accum, C_new),
        anchor_demon=pad(state.stats.anchor_demon, C_new),
        offset_gradient_accum=pad(state.stats.offset_gradient_accum,
                                  C_new * k),
        offset_denom=pad(state.stats.offset_denom, C_new * k),
        offset_opacity_accum=pad(state.stats.offset_opacity_accum,
                                 C_new * k),
        max_radii2d=pad(state.stats.max_radii2d, C_new * k))
    return state._replace(
        params=new_params, rotation=jnp.asarray(rot),
        level=pad(state.level, C_new),
        extra_level=pad(state.extra_level, C_new),
        opt=state.opt._replace(mu=rep(state.opt.mu), nu=rep(state.opt.nu)),
        stats=new_stats)


def clean_stats(state: TrainState, cfg: ModelConfig) -> TrainState:
    """`gaussians.clean()` at update_until (`train.py:270-273`)."""
    C = state.params.anchor.shape[0]
    return state._replace(stats=init_stats(C, cfg.n_offsets))


def roll_back(state: TrainState, base: dict, cfg: ModelConfig) -> TrainState:
    """Fine-stage rollback (`lod_model.py:673-679` / `base_model.py:559-564`):
    restore pretrained (coarse-level) rows from the frozen base copies.

    `base` holds numpy arrays anchor/offset/feat/scaling_log/rotation of
    the pretrained rows (in original order). Valid because fine-stage
    pruning never touches levels < aerial_levels and growth appends rows.
    """
    n = int(state.n)
    level = _np(state.level)[:n]
    if cfg.is_lod:
        base_rows = np.flatnonzero(level < cfg.aerial_levels)
    else:
        base_rows = np.arange(base["anchor"].shape[0])
    assert base_rows.shape[0] == base["anchor"].shape[0], (
        f"rollback mismatch: {base_rows.shape[0]} vs {base['anchor'].shape[0]}")
    p = state.params
    idx = jnp.asarray(base_rows)
    new_params = p._replace(
        anchor=p.anchor.at[idx].set(jnp.asarray(base["anchor"])),
        offset=p.offset.at[idx].set(jnp.asarray(base["offset"])),
        feat=p.feat.at[idx].set(jnp.asarray(base["feat"])),
        scaling_log=p.scaling_log.at[idx].set(jnp.asarray(base["scaling_log"])))
    new_rot = state.rotation.at[idx].set(jnp.asarray(base["rotation"]))
    return state._replace(params=new_params, rotation=new_rot)
