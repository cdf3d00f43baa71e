"""Render sets + evaluation: the reference's post-training pipeline.

`render_sets` / `evaluate` (`train.py:385-669`, `render.py`, `metrics.py`):
re-render train/test cameras, dump renders / gt / error maps, count
visible gaussians per view, and compute PSNR / SSIM (/ LPIPS when weights
are available) split by aerial/street into results.json + per_view.json.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.render import render as render_fn
from horizongs_tpu.models.explicit import render_explicit
from horizongs_tpu.train.losses import psnr, ssim
from horizongs_tpu.train.optim import mlps_from_params


def save_image(path: str, img: np.ndarray, alpha: np.ndarray = None) -> None:
    from PIL import Image
    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if alpha is not None:
        a = (np.clip(np.asarray(alpha[..., 0]), 0, 1) * 255).astype(np.uint8)
        arr = np.concatenate([arr, a[..., None]], axis=-1)
        Image.fromarray(arr, "RGBA").save(path)
    else:
        Image.fromarray(arr).save(path)


def lpips_fn_or_none():
    """LPIPS(vgg) scorer, preferring the TPU-native JAX implementation
    (`train/lpips_jax.py`, weights via tools/convert_lpips_weights.py)
    over the torch `lpips` package; None when neither has weights
    (reference loads it unconditionally at `train.py:50`)."""
    from horizongs_tpu.train.lpips_jax import lpips_fn
    fn = lpips_fn()
    if fn is not None:
        return fn
    try:
        import torch
        import lpips  # noqa
        model = lpips.LPIPS(net="vgg")

        def score(r, g):
            with torch.no_grad():
                return float(model(
                    torch.tensor(np.asarray(r)).permute(2, 0, 1)[None]
                    * 2 - 1,
                    torch.tensor(np.asarray(g)).permute(2, 0, 1)[None]
                    * 2 - 1))
        return score
    except Exception:
        import sys
        print("WARNING: LPIPS unavailable (no JAX VGG weights under "
              "HGS_LPIPS_WEIGHTS / ~/.cache/horizongs_tpu, no torch lpips "
              "package) — results.json will report LPIPS: null. Convert "
              "weights with tools/convert_lpips_weights.py.",
              file=sys.stderr, flush=True)
        return None


def render_set(out_dir: str, name: str, iteration: int, cameras, cfg,
               scene, state, rasterizer: str = "tiled",
               save_images: bool = True, explicit: bool = False,
               add_prefilter: Optional[bool] = None):
    """Render one camera set; returns (renders, gts, per_view_counts,
    elapsed seconds per view, image types, eval-subset tags).

    `add_prefilter=None` defaults to the scene's flag; the train CLI
    passes `not (no_prefilter_step > 0)` per the reference's
    `render_sets` (`train.py:478-484`)."""
    base = os.path.join(out_dir, name, f"ours_{iteration}")
    render_dir = os.path.join(base, "renders")
    gt_dir = os.path.join(base, "gt")
    err_dir = os.path.join(base, "errors")
    if save_images:
        for d in (render_dir, gt_dir, err_dir):
            os.makedirs(d, exist_ok=True)
    if add_prefilter is None:
        add_prefilter = getattr(scene, "add_prefilter", True)

    def _make_fn(cam, cap):
        # MLP weights ride as arguments, not closure constants — baking
        # them in would re-embed the full tables into every compiled
        # (H, W) executable and every recalibration
        return jax.jit(lambda vm, K, cc, uid, ast, m, c=cam,
                       cp=cap: render_fn(
            c._replace(viewmat=vm, K=K, cam_center=cc, uid=uid),
            cfg, m, ast, scene.background,
            add_prefilter=add_prefilter,
            rasterizer=rasterizer, instance_cap=cp))

    def _calibrate(cam):
        from horizongs_tpu.render import count_render_instances
        from horizongs_tpu.ops.raster_pallas import suggest_instance_cap
        n = int(count_render_instances(
            cam, cfg, mlps_from_params(state.params),
            state.anchor_state(), add_prefilter=add_prefilter))
        return suggest_instance_cap(n, margin=1.5)

    renders, gts, counts, times, types, subsets = [], [], [], [], [], []
    fns = {}
    mlps = None if explicit else mlps_from_params(state.params)
    for idx, cam in enumerate(cameras):
        key = (cam.height, cam.width)
        if key not in fns:
            cap = None
            if not explicit and rasterizer in ("pallas", "pallas_interpret",
                                               "tiled"):
                # calibrate the tile-instance capacity for this resolution
                # (binning/routing scale with it; the 4N default wastes ~2x)
                cap = _calibrate(cam)
            if explicit:
                fns[key] = jax.jit(lambda vm, K, cc, st, c=cam: render_explicit(
                    c._replace(viewmat=vm, K=K, cam_center=cc), cfg, st,
                    scene.background, rasterizer=rasterizer))
            else:
                fns[key] = _make_fn(cam, cap)
        t0 = time.time()
        if explicit:
            pkg = fns[key](cam.viewmat, cam.K, cam.cam_center, state)
            vis = pkg["gs_mask"]
        else:
            pkg = fns[key](cam.viewmat, cam.K, cam.cam_center,
                           jnp.asarray(cam.uid), state.anchor_state(), mlps)
            while int(pkg.get("n_dropped", 0)) > 0:
                # this view overflowed the calibrated capacity:
                # recalibrate from it (x1.5 margin) and re-render —
                # evaluation must never drop instances silently
                fns[key] = _make_fn(cam, _calibrate(cam))
                pkg = fns[key](cam.viewmat, cam.K, cam.cam_center,
                               jnp.asarray(cam.uid), state.anchor_state(),
                               mlps)
            vis = pkg["selection_mask"]
        img = jax.block_until_ready(pkg["render"])
        times.append(time.time() - t0)
        counts.append(int(jnp.sum(vis)))
        gt = cam.image if cam.image is not None else jnp.zeros_like(img)
        mask = cam.alpha_mask if cam.alpha_mask is not None else None
        if mask is not None:
            img = img * mask
            gt = gt * mask
        renders.append(np.asarray(img))
        gts.append(np.asarray(gt))
        types.append(cam.image_type)
        subsets.append(getattr(cam, "subset", ""))
        if save_images:
            stem = f"{idx:05d}"
            save_image(os.path.join(render_dir, stem + ".png"), img,
                       alpha=mask)
            save_image(os.path.join(gt_dir, stem + ".png"), gt, alpha=mask)
            save_image(os.path.join(err_dir, stem + ".png"),
                       np.abs(np.asarray(img) - np.asarray(gt)))
    if save_images:
        with open(os.path.join(base, "per_view_count.json"), "w") as f:
            json.dump({f"{i:05d}": c for i, c in enumerate(counts)}, f)
    return renders, gts, counts, times, types, subsets


def evaluate_sets(out_dir: str, iteration: int, renders, gts, types,
                  lpips_model=None, tag: str = "test", subsets=None):
    """PSNR/SSIM(/LPIPS) per aerial/street split -> results.json
    (`metrics.py:52-148`, `train.py:520-669`). When `subsets` carries
    non-empty tags (UCGS robustness splits: held-out / +0.1m / +0.1m+5°,
    reference `train.py:542-591`), each subset is reported as its own
    group alongside aerial/street."""
    per_view = {"PSNR": {}, "SSIM": {}, "LPIPS": {}}
    groups = {"all": [], "aerial": [], "street": []}
    if subsets is None:
        subsets = [""] * len(renders)
    for sub in subsets:
        if sub and sub not in groups:
            groups[sub] = []
    for i, (r, g, t, sub) in enumerate(zip(renders, gts, types, subsets)):
        p = float(psnr(jnp.asarray(r), jnp.asarray(g)))
        s = float(ssim(jnp.asarray(r), jnp.asarray(g)))
        l = None
        if lpips_model is not None:
            l = float(lpips_model(np.asarray(r), np.asarray(g)))
        name = f"{i:05d}"
        per_view["PSNR"][name] = p
        per_view["SSIM"][name] = s
        per_view["LPIPS"][name] = l
        groups["all"].append((p, s, l))
        groups[t].append((p, s, l))
        if sub:
            groups[sub].append((p, s, l))

    results = {}
    for gname, vals in groups.items():
        if not vals:
            continue
        results[gname] = {
            "PSNR": float(np.mean([v[0] for v in vals])),
            "SSIM": float(np.mean([v[1] for v in vals])),
            "LPIPS": (float(np.mean([v[2] for v in vals]))
                      if vals[0][2] is not None else None),
            "n_views": len(vals),
        }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"results_{tag}.json"), "w") as f:
            json.dump({f"ours_{iteration}": results}, f, indent=2)
        with open(os.path.join(out_dir, f"per_view_{tag}.json"), "w") as f:
            json.dump({f"ours_{iteration}": per_view}, f, indent=2)
    return results
