"""The jitted training step: render -> loss -> backward -> Adam -> stats.

One fused XLA program per (capacity, resolution) pair covering the whole
hot loop of the reference trainer (`train.py:112-278`): forward render,
loss assembly, backward through the rasterizer and MLPs, Adam update with
per-group scheduled LRs, and the densification statistics accumulation
(`training_statis`, `basic_model.py:96-144`) — which on TPU is a set of
masked dense updates instead of boolean-mask scatters.

Screen-space gradients for densification come from a zero "probe" added
to the projected means (`means2d_probe`), the functional replacement for
`info["means2d"].retain_grad()` (`gaussian_renderer/render.py:91-93`).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.models.anchors import AnchorState
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.render import render
from horizongs_tpu.train.losses import assemble_loss, psnr
from horizongs_tpu.train.optim import (
    AdamState,
    TrainableParams,
    adam_step,
    lr_tree,
    mlps_from_params,
)
from horizongs_tpu.train.schedules import expon_lr, group_lrs


class DensifyStats(NamedTuple):
    """Per-anchor / per-offset accumulators (`training_setup`,
    `base_model.py:238-243`)."""
    anchor_opacity_accum: jnp.ndarray   # (C,)
    anchor_demon: jnp.ndarray           # (C,) visit counts
    offset_gradient_accum: jnp.ndarray  # (C*k,)
    offset_denom: jnp.ndarray           # (C*k,)
    offset_opacity_accum: jnp.ndarray   # (C*k,)
    max_radii2d: jnp.ndarray            # (C*k,)


def init_stats(capacity: int, n_offsets: int) -> DensifyStats:
    return DensifyStats(
        anchor_opacity_accum=jnp.zeros(capacity),
        anchor_demon=jnp.zeros(capacity),
        offset_gradient_accum=jnp.zeros(capacity * n_offsets),
        offset_denom=jnp.zeros(capacity * n_offsets),
        offset_opacity_accum=jnp.zeros(capacity * n_offsets),
        max_radii2d=jnp.zeros(capacity * n_offsets),
    )


class TrainState(NamedTuple):
    params: TrainableParams
    rotation: jnp.ndarray      # (C, 4) — stored, not optimized (reference parity)
    level: jnp.ndarray         # (C,) int32
    extra_level: jnp.ndarray   # (C,)
    n: jnp.ndarray             # () int32 live anchors
    opt: AdamState
    stats: DensifyStats

    def anchor_state(self) -> AnchorState:
        p = self.params
        return AnchorState(anchor=p.anchor, offset=p.offset, feat=p.feat,
                           scaling_log=p.scaling_log, rotation=self.rotation,
                           level=self.level, extra_level=self.extra_level,
                           n=self.n)


class CameraTensors(NamedTuple):
    """The per-iteration dynamic camera payload (static dims live in the
    step closure)."""
    viewmat: jnp.ndarray       # (4, 4)
    K: jnp.ndarray             # (3, 3)
    cam_center: jnp.ndarray    # (3,)
    uid: jnp.ndarray           # () int32
    image: jnp.ndarray         # (H, W, 3) ground truth
    alpha_mask: jnp.ndarray    # (H, W, 1)
    invdepth: jnp.ndarray      # (H, W, 1) mono inverse depth (zeros if absent)
    depth_mask: jnp.ndarray    # (H, W, 1)
    has_depth: jnp.ndarray     # () float32 0/1
    do_stats: jnp.ndarray      # () float32 0/1: accumulate densify stats
    resolution_scale: jnp.ndarray  # () float32
    loss_weight: jnp.ndarray   # () float32 relative weight in the DP mean
    #   (1.0 normally; 1/k when a view appears k times in a data-parallel
    #   batch because the dataset couldn't fill it — keeps duplicated
    #   views from weighing k x in the mean gradient)


def camera_tensors(cam, do_stats: bool = False,
                   height: int = None, width: int = None,
                   loss_weight: float = 1.0) -> CameraTensors:
    H = height or cam.height
    W = width or cam.width
    zero_img = jnp.zeros((H, W, 1), dtype=jnp.float32)
    return CameraTensors(
        viewmat=cam.viewmat, K=cam.K, cam_center=cam.cam_center,
        uid=jnp.asarray(cam.uid, dtype=jnp.int32),
        image=cam.image if cam.image is not None else jnp.zeros((H, W, 3)),
        alpha_mask=cam.alpha_mask if cam.alpha_mask is not None
        else jnp.ones((H, W, 1)),
        invdepth=cam.invdepth if cam.invdepth is not None else zero_img,
        depth_mask=cam.depth_mask if cam.depth_mask is not None else zero_img,
        has_depth=jnp.asarray(1.0 if cam.invdepth is not None else 0.0),
        do_stats=jnp.asarray(1.0 if do_stats else 0.0),
        resolution_scale=jnp.asarray(cam.resolution_scale, dtype=jnp.float32),
        loss_weight=jnp.asarray(loss_weight, dtype=jnp.float32),
    )


def update_stats(opt, stats: DensifyStats, n_offsets: int,
                 opacities: jnp.ndarray, selection_mask: jnp.ndarray,
                 anchor_mask: jnp.ndarray, radii: jnp.ndarray,
                 means2d_grad: jnp.ndarray, width: int, height: int,
                 gate: jnp.ndarray) -> DensifyStats:
    """`training_statis` (`basic_model.py:96-144`) as dense masked updates.

    `gate` is 0/1: whether this view accumulates statistics (aerial/street
    densify gating, `train.py:259-260`).
    """
    C = stats.anchor_opacity_accum.shape[0]
    sel = selection_mask.astype(jnp.float32) * gate            # (C*k,)
    vis = anchor_mask.astype(jnp.float32) * gate               # (C,)

    op_ck = (opacities * sel).reshape(C, n_offsets)            # masked opacities
    sel_ck = sel.reshape(C, n_offsets)

    if opt.pruning_type == "mean":
        s = jnp.sum(op_ck, axis=1)
        cnt = jnp.sum(sel_ck, axis=1)
        avg = jnp.where(cnt > 0, s / jnp.clip(cnt, 1.0, None), 0.0)
        new_aopa = stats.anchor_opacity_accum + vis * avg
    elif opt.pruning_type == "max":
        s = jnp.abs(jnp.sum(op_ck, axis=1))
        new_aopa = jnp.where(vis > 0,
                             jnp.maximum(stats.anchor_opacity_accum, s),
                             stats.anchor_opacity_accum)
    else:
        raise ValueError(f"Unknown pruning_type: {opt.pruning_type}")

    new_demon = stats.anchor_demon + vis

    # per-offset: combined = selected & rendered (radius > 0)
    combined = sel * (radii > 0).astype(jnp.float32)           # (C*k,)
    grad = means2d_grad * jnp.asarray([[width * 0.5, height * 0.5]])
    grad_norm = jnp.linalg.norm(grad, axis=-1)                 # (C*k,)

    if opt.growing_type == "mean":
        new_ograd = stats.offset_gradient_accum + combined * grad_norm
        new_oopa = stats.offset_opacity_accum
        new_radii = stats.max_radii2d
    elif opt.growing_type == "max":
        new_ograd = jnp.where(combined > 0,
                              jnp.maximum(stats.offset_gradient_accum,
                                          jnp.abs(grad_norm)),
                              stats.offset_gradient_accum)
        new_radii = jnp.where(combined > 0,
                              jnp.maximum(stats.max_radii2d, radii),
                              stats.max_radii2d)
        new_oopa = stats.offset_opacity_accum + combined * opacities
    else:
        raise ValueError(f"Unknown growing_type: {opt.growing_type}")

    new_denom = stats.offset_denom + combined
    return DensifyStats(anchor_opacity_accum=new_aopa, anchor_demon=new_demon,
                        offset_gradient_accum=new_ograd,
                        offset_denom=new_denom,
                        offset_opacity_accum=new_oopa, max_radii2d=new_radii)


def build_train_step(cfg: ModelConfig, opt, height: int, width: int,
                     spatial_lr_scale: float = 1.0,
                     frozen_mlps: bool = False,
                     add_prefilter: bool = True,
                     rasterizer: str = "dense",
                     active_sh_degree: Optional[int] = None,
                     background=None,
                     frozen_appearance: bool = False,
                     instance_cap: Optional[int] = None):
    """Returns a jitted fn(state, cam: CameraTensors, iteration) ->
    (state', metrics dict)."""
    bg = background if background is not None else jnp.zeros(3)

    def loss_fn(params: TrainableParams, probe: jnp.ndarray,
                state: TrainState, cam: CameraTensors, iteration):
        astate = AnchorState(anchor=params.anchor, offset=params.offset,
                             feat=params.feat, scaling_log=params.scaling_log,
                             rotation=state.rotation, level=state.level,
                             extra_level=state.extra_level, n=state.n)
        from horizongs_tpu.core.cameras import Camera
        camera = Camera(viewmat=cam.viewmat, K=cam.K, width=width,
                        height=height, cam_center=cam.cam_center,
                        uid=cam.uid,
                        resolution_scale=cam.resolution_scale)
        pkg = render(camera, cfg, mlps_from_params(params), astate, bg,
                     add_prefilter=add_prefilter,
                     active_sh_degree=active_sh_degree,
                     means2d_probe=probe, rasterizer=rasterizer,
                     instance_cap=instance_cap)
        depth_w = expon_lr(iteration, opt.depth_l1_weight_init,
                           opt.depth_l1_weight_final,
                           max_steps=opt.iterations) * cam.has_depth
        loss, aux = assemble_loss(opt, pkg, cam.image, cam.alpha_mask,
                                  cam.invdepth, cam.depth_mask,
                                  iteration, depth_w, cfg.render_mode)
        side = {"opacities": pkg["opacity"],
                "selection_mask": pkg["selection_mask"],
                "anchor_mask": pkg["visible_mask"],
                "radii": pkg["radii"],
                "render": pkg["render"],
                "n_dropped": pkg["n_dropped"]}
        return loss, (aux, side)

    def step(state: TrainState, cam: CameraTensors, iteration):
        iteration = jnp.asarray(iteration, dtype=jnp.float32)
        Ck = state.params.offset.shape[0] * state.params.offset.shape[1]
        probe = jnp.zeros((Ck, 2), dtype=jnp.float32)
        (loss, (aux, side)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, probe, state, cam, iteration)
        param_grads, probe_grad = grads

        lrs_dict = group_lrs(opt, iteration, spatial_lr_scale)
        lrs = lr_tree(state.params, lrs_dict, frozen_mlps=frozen_mlps,
                      frozen_appearance=frozen_appearance)
        new_params, new_opt = adam_step(state.params, param_grads,
                                        state.opt, lrs)

        new_stats = update_stats(opt, state.stats, cfg.n_offsets,
                                 side["opacities"], side["selection_mask"],
                                 side["anchor_mask"], side["radii"],
                                 probe_grad, width, height, cam.do_stats)

        metrics = {"loss": loss, "l1": aux["l1"], "ssim": aux["ssim"],
                   "depth_l1": aux["depth_l1"],
                   "psnr": psnr(side["render"] * cam.alpha_mask,
                                cam.image * cam.alpha_mask),
                   "n_selected": jnp.sum(side["selection_mask"]),
                   "n_dropped": side["n_dropped"]}
        new_state = TrainState(params=new_params, rotation=state.rotation,
                               level=state.level,
                               extra_level=state.extra_level, n=state.n,
                               opt=new_opt, stats=new_stats)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
