"""Sharded training step: anchors tensor-parallel, cameras data-parallel.

Parallelization strategy (replaces the reference's "no distribution at
all", SURVEY.md §2.3) for one scene/chunk:

  * anchor table rows (and their Adam moments and densify stats) are
    sharded over the "model" mesh axis; the MLP decode — the FLOP-heavy
    matmul part — runs on local rows only;
  * decoded gaussians are all-gathered over "model" (a few hundred
    bytes/gaussian over ICI), so every device rasterizes a full gaussian
    set. Gradients flow back through the transposed collective: each
    shard receives exactly its own rows' gradients;
  * cameras are sharded over "data": each step renders n_data views;
    all parameter gradients are mean-reduced over "data" and MLP/
    appearance gradients additionally sum-reduced over "model";
  * densification statistics accumulate on the local row slices.

Rasterization itself is replicated over "model" (pixel work is
parallel over "data" views). Sharding image tiles over "model" with a
partial-composite exchange is a further step planned in ops/.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from horizongs_tpu.models.anchors import (
    AnchorState,
    anchor_lod_mask,
    decode_neural_gaussians,
)
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import rasterize_tiled_3dgs
from horizongs_tpu.render import prefilter_anchors
from horizongs_tpu.train.losses import assemble_loss, psnr
from horizongs_tpu.train.optim import adam_step, lr_tree, mlps_from_params
from horizongs_tpu.train.schedules import expon_lr, group_lrs
from horizongs_tpu.train.step import CameraTensors, DensifyStats, TrainState, update_stats
from horizongs_tpu.core.cameras import Camera


def _is_per_anchor(path: str) -> bool:
    return path in ("anchor", "offset", "feat", "scaling_log")


def state_specs(state: TrainState):
    """PartitionSpec pytree for a TrainState: per-anchor rows on 'model'."""
    def param_spec(params):
        return params._replace(
            anchor=P("model"), offset=P("model"), feat=P("model"),
            scaling_log=P("model"),
            mlp_opacity=jax.tree.map(lambda _: P(), params.mlp_opacity),
            mlp_cov=jax.tree.map(lambda _: P(), params.mlp_cov),
            mlp_color=jax.tree.map(lambda _: P(), params.mlp_color),
            appearance=None if params.appearance is None else P())
    stats_spec = DensifyStats(*(P("model"),) * 6)
    return TrainState(
        params=param_spec(state.params),
        rotation=P("model"), level=P("model"), extra_level=P("model"),
        n=P(),
        opt=state.opt._replace(mu=param_spec(state.opt.mu),
                               nu=param_spec(state.opt.nu), t=P()),
        stats=stats_spec)


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place a TrainState on the mesh with anchor rows sharded."""
    specs = state_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def build_sharded_train_step(cfg: ModelConfig, opt, mesh, height: int,
                             width: int, spatial_lr_scale: float = 1.0,
                             frozen_mlps: bool = False,
                             add_prefilter: bool = True,
                             active_sh_degree: Optional[int] = None,
                             background=None,
                             raster_chunk: int = 512,
                             rasterizer: str = "tiled",
                             instance_cap: Optional[int] = None):
    """Returns fn(state, cams: CameraTensors (n_data-batched), iteration)
    -> (state', metrics). Anchor capacity must divide the model axis.

    `rasterizer`: "tiled" (scan backend, CPU-testable) or "pallas" /
    "pallas_interpret" (the TPU kernels; shard_map runs them per device
    on that device's all-gathered gaussians). `instance_cap` calibrates
    the static tile-instance capacity (see `render.count_render_instances`)."""
    bg = background if background is not None else jnp.zeros(3)
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    k = cfg.n_offsets

    def device_fn(state: TrainState, cams: CameraTensors, iteration):
        # local shapes: per-anchor arrays are (C/n_model, ...) rows;
        # cams leaves are (1, ...) — this device's camera.
        cam = jax.tree.map(lambda x: x[0], cams)
        m_idx = jax.lax.axis_index("model")
        C_local = state.params.anchor.shape[0]
        n_local = jnp.clip(state.n - m_idx * C_local, 0, C_local)
        Ck = C_local * k * n_model
        iteration = jnp.asarray(iteration, dtype=jnp.float32)

        def loss_fn(params, probe):
            astate = AnchorState(
                anchor=params.anchor, offset=params.offset, feat=params.feat,
                scaling_log=params.scaling_log, rotation=state.rotation,
                level=state.level, extra_level=state.extra_level, n=n_local)
            camera = Camera(viewmat=cam.viewmat, K=cam.K, width=width,
                            height=height, cam_center=cam.cam_center,
                            uid=cam.uid,
                            resolution_scale=cam.resolution_scale)
            mask, smooth = anchor_lod_mask(cfg, astate, cam.cam_center,
                                           cam.resolution_scale)
            if add_prefilter:
                mask = prefilter_anchors(cfg, astate, camera, mask)
            dec = decode_neural_gaussians(cfg, mlps_from_params(params),
                                          astate, cam.cam_center, mask,
                                          smooth,
                                          appearance_id=cam.uid)
            # gather decoded gaussians from all model shards
            gather = partial(jax.lax.all_gather, axis_name="model",
                             axis=0, tiled=True)
            means = gather(dec.means)
            quats = gather(dec.quats)
            scales = gather(dec.scales)
            opac = gather(dec.opacities)
            colors = gather(dec.colors)
            sel = gather(dec.selection_mask)

            if cfg.color_attr != "RGB":
                colors = colors.reshape(-1, cfg.color_dim // 3, 3)
                sh_deg = (cfg.max_sh_degree if active_sh_degree is None
                          else active_sh_degree)
            else:
                sh_deg = None

            proj = project_3dgs(means, quats, scales, camera.viewmat,
                                camera.K, width, height)
            if rasterizer in ("pallas", "pallas_interpret"):
                from horizongs_tpu.ops.raster_pallas import (
                    rasterize_pallas_3dgs)
                render, alphas, info = rasterize_pallas_3dgs(
                    means, quats, scales, opac, colors, camera.viewmat,
                    camera.K, width, height, bg, sh_degree=sh_deg,
                    render_mode=cfg.render_mode,
                    means2d_override=proj.means2d + probe,
                    cap=instance_cap,
                    interpret=rasterizer == "pallas_interpret")
            else:
                render, alphas, info = rasterize_tiled_3dgs(
                    means, quats, scales, opac, colors, camera.viewmat,
                    camera.K, width, height, bg, sh_degree=sh_deg,
                    render_mode=cfg.render_mode,
                    means2d_override=proj.means2d + probe,
                    chunk=raster_chunk)
            if render.shape[-1] == 4:
                image, depth = render[..., :3], render[..., 3:4]
            else:
                image, depth = render, None
            pkg = {"render": image, "render_depth": depth,
                   "render_alphas": alphas, "scaling": scales,
                   "opacity": opac, "selection_mask": sel}
            depth_w = expon_lr(iteration, opt.depth_l1_weight_init,
                               opt.depth_l1_weight_final,
                               max_steps=opt.iterations) * cam.has_depth
            loss, aux = assemble_loss(opt, pkg, cam.image, cam.alpha_mask,
                                      cam.invdepth, cam.depth_mask,
                                      iteration, depth_w, cfg.render_mode)
            side = {"opacities": opac, "selection_mask": sel,
                    "anchor_mask": gather(dec.anchor_mask),
                    "radii": info["radii"], "render": image}
            return loss, (aux, side)

        probe = jnp.zeros((Ck, 2), dtype=jnp.float32)
        (loss, (aux, side)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, probe)
        pgrads, probe_grad = grads

        # reduce: everything mean over data; mlp/appearance also sum over
        # model (each shard only saw its own anchors' decode path).
        # The 1/n_model rescale undoes the all_gather transpose's psum:
        # each device's backward computes d(sum of all model-shard
        # losses)/d(local params) = n_model x the true gradient, because
        # every replica's (identical) loss cotangent flows back through
        # psum_scatter. Probe grads are NOT rescaled — the probe enters
        # after the gather, so its gradient is already 1x.
        pgrads = jax.tree.map(
            lambda g: jax.lax.pmean(g, "data") / n_model, pgrads)
        reduce_model = lambda t: jax.tree.map(
            lambda g: jax.lax.psum(g, "model"), t)
        pgrads = pgrads._replace(
            mlp_opacity=reduce_model(pgrads.mlp_opacity),
            mlp_cov=reduce_model(pgrads.mlp_cov),
            mlp_color=reduce_model(pgrads.mlp_color),
            appearance=None if pgrads.appearance is None
            else reduce_model(pgrads.appearance))

        lrs_dict = group_lrs(opt, iteration, spatial_lr_scale)
        lrs = lr_tree(state.params, lrs_dict, frozen_mlps=frozen_mlps)
        new_params, new_opt = adam_step(state.params, pgrads, state.opt, lrs)

        # densify statistics on the local row slice
        off = m_idx * C_local
        sl = lambda x, o, n_: jax.lax.dynamic_slice_in_dim(x, o, n_)
        probe_grad = jax.lax.pmean(probe_grad, "data")
        local_stats = update_stats(
            opt, state.stats, k,
            sl(side["opacities"], off * k, C_local * k),
            sl(side["selection_mask"], off * k, C_local * k),
            sl(side["anchor_mask"], off, C_local),
            sl(side["radii"], off * k, C_local * k),
            sl(probe_grad, off * k, C_local * k),
            width, height, cam.do_stats)
        # stats deltas from other data-parallel cameras
        adds = jax.tree.map(
            lambda new, old: old + jax.lax.psum(new - old, "data"),
            local_stats, state.stats)
        if opt.growing_type == "max" or opt.pruning_type == "max":
            maxes = jax.tree.map(lambda new: jax.lax.pmax(new, "data"),
                                 local_stats)
            new_stats = DensifyStats(
                anchor_opacity_accum=(maxes if opt.pruning_type == "max"
                                      else adds).anchor_opacity_accum,
                anchor_demon=adds.anchor_demon,
                offset_gradient_accum=(maxes if opt.growing_type == "max"
                                       else adds).offset_gradient_accum,
                offset_denom=adds.offset_denom,
                offset_opacity_accum=adds.offset_opacity_accum,
                max_radii2d=maxes.max_radii2d if opt.growing_type == "max"
                else adds.max_radii2d)
        else:
            new_stats = adds

        metrics = {
            "loss": jax.lax.pmean(loss, "data"),
            "l1": jax.lax.pmean(aux["l1"], "data"),
            "psnr": jax.lax.pmean(
                psnr(side["render"] * cam.alpha_mask,
                     cam.image * cam.alpha_mask), "data"),
        }
        new_state = TrainState(params=new_params, rotation=state.rotation,
                               level=state.level,
                               extra_level=state.extra_level, n=state.n,
                               opt=new_opt, stats=new_stats)
        return new_state, metrics

    def step(state: TrainState, cams: CameraTensors, iteration):
        specs = state_specs(state)
        cam_specs = jax.tree.map(lambda _: P("data"), cams)
        fn = shard_map(device_fn, mesh=mesh,
                       in_specs=(specs, cam_specs, P()),
                       out_specs=(specs, P()), check_vma=False)
        return fn(state, cams, jnp.asarray(iteration, dtype=jnp.float32))

    return jax.jit(step, donate_argnums=(0,))
