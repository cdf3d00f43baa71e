"""Sharded training step: anchors tensor-parallel, cameras data-parallel,
rasterization tile-band-parallel.

Parallelization strategy (replaces the reference's "no distribution at
all", SURVEY.md §2.3) for one scene/chunk:

  * anchor table rows (and their Adam moments and densify stats) are
    sharded over the "model" mesh axis; the MLP decode — the FLOP-heavy
    matmul part — runs on local rows only;
  * the image's tile rows are split into n_model contiguous bands; each
    device projects its local gaussians and routes the resulting compact
    splat records (10-20 floats) to the band owners with an all_to_all
    over ICI (`parallel/tile_exchange.py`), then bins + composites ONLY
    its own band. Pixel FLOPs and instance memory scale 1/n_model and no
    device ever holds the full decoded gaussian set. Band images are
    all-gathered (a few MB) for the loss; gradients ride the transposed
    collectives back to the owning shard.
  * cameras are sharded over "data": each step renders n_data views;
    all parameter gradients are mean-reduced over "data" and MLP/
    appearance gradients additionally sum-reduced over "model";
  * densification statistics accumulate on the local row slices.

`shard_tiles=False` falls back to the round-1 scheme: all_gather the
decoded gaussians over "model" and rasterize the full image redundantly
on every device (3DGS only) — kept as the parity oracle for the band
path and for single-band-degenerate geometries.
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
from horizongs_tpu.ops.binning import ellipse_extents
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import rasterize_tiled_3dgs
from horizongs_tpu.ops.raster_fields import (
    backend_tile_shape,
    composite_fields_2dgs,
    composite_fields_3dgs,
    pack_fields_2dgs,
    pack_fields_3dgs,
    shift_band_2dgs,
    shift_band_3dgs,
)
from horizongs_tpu.ops.reference import depth_to_normals
from horizongs_tpu.parallel.tile_exchange import (
    BandLayout,
    band_layout,
    band_span,
    exchange_records,
)
from horizongs_tpu.render import prefilter_anchors
from horizongs_tpu.train.losses import (
    assemble_loss,
    assemble_loss_band,
    psnr,
)
from horizongs_tpu.train.optim import adam_step, lr_tree, mlps_from_params
from horizongs_tpu.train.schedules import expon_lr, group_lrs
from horizongs_tpu.train.step import CameraTensors, DensifyStats, TrainState, update_stats
from horizongs_tpu.core.cameras import Camera


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
    """Place a TrainState on the mesh with anchor rows sharded. On a
    multi-process mesh, leaves are lowered to host numpy first —
    device_put of a committed single-device array onto a non-addressable
    sharding is not allowed, but a (replicated) host value is: each
    process materializes exactly its addressable shards."""
    import numpy as np
    specs = state_specs(state)
    multiproc = jax.process_count() > 1

    def put(x, s):
        if multiproc and not isinstance(x, np.ndarray):
            x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(put, state, specs)


def unshard_state(state: TrainState) -> TrainState:
    """Gather a (possibly sharded) TrainState to host-replicated arrays —
    the inverse of `shard_state`, used for checkpoint saving, eval
    rendering and vis. Multi-process safe: non-addressable (multi-host)
    leaves gather via process_allgather so every process holds the full
    value."""
    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return jnp.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return jnp.asarray(jax.device_get(x))
    return jax.tree.map(pull, state)


def _rasterizer_backend(rasterizer: str) -> str:
    return {"tiled": "scan", "dense": "scan"}.get(rasterizer, rasterizer)


# SSIM 11x11 window radius: the band-local loss extends each band with
# this many rows of real neighbor pixels (rendered via ppermute halo
# exchange; ground truth pre-sliced into band strips outside shard_map)
HALO = 5


def build_sharded_train_step(cfg: ModelConfig, opt, mesh, height: int,
                             width: int, spatial_lr_scale: float = 1.0,
                             frozen_mlps: bool = False,
                             frozen_appearance: bool = False,
                             add_prefilter: bool = True,
                             active_sh_degree: Optional[int] = None,
                             background=None,
                             raster_chunk: int = 512,
                             rasterizer: str = "tiled",
                             instance_cap: Optional[int] = None,
                             shard_tiles: bool = True,
                             band_cap: Optional[int] = None,
                             band_bounds=None):
    """Returns fn(state, cams: CameraTensors (n_data-batched), iteration)
    -> (state', metrics). Anchor capacity must divide the model axis.

    `rasterizer`: "tiled" (scan backend, CPU-testable) or "pallas" /
    "pallas_interpret" (the TPU kernels). `instance_cap` calibrates the
    static per-device tile-instance capacity; `band_cap` the per
    (src, dst) record slots of the band exchange (default: every local
    record — never drops). Overflows of either are counted in
    `metrics["n_dropped"]`, never silent. `band_bounds`: optional
    load-balanced band boundaries in tile-row units
    (`tile_exchange.suggest_band_bounds`); default uniform."""
    bg = background if background is not None else jnp.zeros(3)
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    k = cfg.n_offsets
    backend = _rasterizer_backend(rasterizer)
    if cfg.gs_attr == "2D" and not shard_tiles:
        raise ValueError("2DGS requires shard_tiles=True in the sharded "
                         "step (the replicated fallback is 3DGS-only)")
    tile_w, tile_h = backend_tile_shape(cfg.gs_attr, backend)
    layout = band_layout(height, width, n_model, tile_h,
                         bounds=band_bounds)
    if cfg.color_attr != "RGB":
        sh_deg = (cfg.max_sh_degree if active_sh_degree is None
                  else active_sh_degree)
    else:
        sh_deg = None

    def _decode(state, params, cam, n_local):
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
                                      smooth, appearance_id=cam.uid)
        if cfg.color_attr != "RGB":
            colors = dec.colors.reshape(-1, cfg.color_dim // 3, 3)
        else:
            colors = dec.colors
        return dec, colors, camera

    # ------------------------------------------------------------------
    # tile-band-sharded loss: records cross devices, pixels stay local
    # ------------------------------------------------------------------
    def band_loss_fn(params, probe, state, cam, n_local, m_idx, iteration):
        dec, colors, camera = _decode(state, params, cam, n_local)
        K_local = dec.means.shape[0]
        send_cap = band_cap if band_cap is not None else K_local
        # composite the band EXTENDED by the halo rows directly: records
        # are routed to every band whose halo-extended range they touch
        # (band_span halo_px), so halo pixels composite locally and
        # identically to the neighbor's own rows — no post-composite
        # ppermute, and its gradient transpose disappears from the
        # backward. Per-band starts/heights support load-balanced
        # boundaries (uniform bounds reduce to m_idx * band_px).
        starts_arr = jnp.asarray(layout.starts_px, jnp.int32)
        heights_arr = jnp.asarray(layout.heights_px, jnp.int32)
        dy0 = starts_arr[m_idx]
        h_band = heights_arr[m_idx]
        dy = (dy0 - HALO).astype(jnp.float32)
        sg = jax.lax.stop_gradient

        if cfg.gs_attr == "2D":
            fields, bin_radii, depths, proj = pack_fields_2dgs(
                dec.means, dec.quats, dec.scales, dec.opacities, colors,
                camera.viewmat, camera.K, width, height,
                sh_degree=sh_deg, means2d_probe=probe)
            # radii + depth ride the records only as binning/sort keys —
            # stop their gradients (the single-device paths never
            # differentiate them either: they feed integer ops only)
            records = jnp.concatenate(
                [fields, sg(bin_radii)[:, None], sg(depths)[:, None]],
                axis=-1)
            ry = sg(bin_radii)
        else:
            fields, bin_radii, proj = pack_fields_3dgs(
                dec.means, dec.quats, dec.scales, dec.opacities, colors,
                camera.viewmat, camera.K, width, height,
                sh_degree=sh_deg, means2d_probe=probe)
            records = jnp.concatenate([fields, sg(bin_radii)[:, None]],
                                      axis=-1)
            # ellipse vertical extent: tighter routing for anisotropic
            # splats (same lossless bound binning uses for its spans)
            _, e_ry, _ = ellipse_extents(sg(proj.conics), sg(dec.opacities))
            ry = jnp.where(sg(bin_radii) > 0, e_ry, 0.0)

        my = fields[:, 10] if cfg.gs_attr == "2D" else fields[:, 1]
        recv, n_drop_exch = exchange_records(
            records, sg(my), ry, sg(bin_radii) > 0, layout, send_cap,
            halo_px=HALO)
        band_px = layout.band_px
        Hp = band_px + 2 * HALO

        if cfg.gs_attr == "2D":
            rfields = shift_band_2dgs(recv[:, :18], dy)
            rradii, rdepths = recv[:, 18], recv[:, 19]
            render_b, alphas_b, normals_b, distort_b, median_b, binfo = \
                composite_fields_2dgs(
                    rfields, rradii, rdepths, width, Hp, bg,
                    render_mode=cfg.render_mode, backend=backend,
                    cap=instance_cap, chunk=raster_chunk)
            extra_bands = [normals_b, distort_b, median_b]
        else:
            rfields = shift_band_3dgs(recv[:, :10], dy)
            rradii = recv[:, 10]
            render_b, alphas_b, binfo = composite_fields_3dgs(
                rfields, rradii, width, Hp, bg,
                render_mode=cfg.render_mode, backend=backend,
                cap=instance_cap, chunk=raster_chunk)
            extra_bands = []

        # band-local loss: every term is a masked interior sum over THIS
        # band (the composite already covers the HALO extension rows, so
        # SSIM windows and depth-normal differences see real neighbor
        # pixels without any cross-device exchange), psum-ed into the
        # full-image loss. No device ever assembles the full image and
        # loss FLOPs scale 1/n_model. The psum-ed loss is
        # replicated-identical across "model" exactly like a gathered
        # one, so the device_fn's 1/n_model gradient rescale is
        # unchanged.
        chans = [render_b, alphas_b] + extra_bands
        sizes = [c.shape[-1] for c in chans]
        patch_all = jnp.concatenate(chans, axis=-1)
        grow = dy0 - HALO + jnp.arange(Hp, dtype=jnp.int32)  # global rows
        row_ok = (grow >= 0) & (grow < height)
        li = jnp.arange(Hp, dtype=jnp.int32)
        interior = (row_ok & (li >= HALO) & (li < HALO + h_band)
                    ).astype(jnp.float32)[:, None, None]
        # zero phantom rows (beyond the image bottom they composite to
        # pure background, which must not reach the loss)
        patch_all = patch_all * row_ok.astype(jnp.float32)[:, None, None]
        parts = []
        off = 0
        for s in sizes:
            parts.append(patch_all[..., off:off + s])
            off += s
        render_p, alphas_p = parts[0], parts[1]
        if render_p.shape[-1] == 4:
            image_p, depth_p = render_p[..., :3], render_p[..., 3:4]
        else:
            image_p, depth_p = render_p, None

        # ground-truth band+halo strips, pre-sliced OUTSIDE shard_map
        # (`band_camera_strips`): this device only ever receives its own
        # (Hp, W, C) strip — full-resolution camera tensors are never
        # replicated across "model" (round-2 VERDICT next-item 1d)
        gt_p, am_p = cam.image, cam.alpha_mask
        inv_p, dm_p = cam.invdepth, cam.depth_mask

        pkg = {"render": image_p, "render_depth": depth_p,
               "render_alphas": alphas_p}
        if cfg.gs_attr == "2D":
            normals_p, distort_p, median_p = parts[2], parts[3], parts[4]
            nfd = depth_to_normals(median_p[..., 0], camera.K,
                                   row0=(dy0 - HALO).astype(jnp.float32))
            # the full-image computation leaves ddy (hence the normal)
            # zero on the first/last image row — reproduce that here
            # (the halo gives those rows a fabricated neighbor)
            edge = (grow == 0) | (grow == height - 1)
            nfd = jnp.where(edge[:, None, None], 0.0, nfd)
            pkg["render_normals"] = normals_p
            pkg["render_normals_from_depth"] = nfd
            pkg["render_distort"] = distort_p

        depth_w = expon_lr(iteration, opt.depth_l1_weight_init,
                           opt.depth_l1_weight_final,
                           max_steps=opt.iterations) * cam.has_depth
        contrib, const, sums = assemble_loss_band(
            opt, pkg, gt_p, am_p, inv_p, dm_p, iteration, depth_w,
            cfg.render_mode, interior, height, width)
        # scale regularizer: a masked mean over the globally selected
        # gaussians — local sums, one fused psum with the loss terms
        prod = jnp.prod(dec.scales, axis=-1) * dec.selection_mask
        pk = jax.lax.psum(
            {"contrib": contrib, "dreg_num": jnp.sum(prod),
             "dreg_den": jnp.sum(dec.selection_mask), **sums}, "model")
        loss = const + pk["contrib"]
        if getattr(opt, "lambda_dreg", 0.0) > 0:
            loss = loss + opt.lambda_dreg * (
                pk["dreg_num"] / jnp.clip(pk["dreg_den"], 1.0, None))
        D_c = float(height * width * 3)
        mse = pk["mse_sum"] / D_c
        aux = {"l1": pk["l1_sum"] / D_c, "ssim": pk["ssim_sum"] / D_c,
               "depth_l1": pk["depth_sum"], "total": loss,
               "psnr": 20.0 * jnp.log10(
                   1.0 / jnp.sqrt(jnp.clip(mse, 1e-12, None)))}
        side = {"opacities": dec.opacities,
                "selection_mask": dec.selection_mask,
                "anchor_mask": dec.anchor_mask,
                "radii": proj.radii,
                # split accounting: exchange overflow means band_cap is
                # too small, instance overflow means instance_cap is —
                # the trainer recalibrates the matching capacity
                "n_dropped_exchange": n_drop_exch,
                "n_dropped_instances": binfo["n_dropped"],
                "local_stats": True}
        return loss, (aux, side)

    # ------------------------------------------------------------------
    # replicated fallback: all_gather decoded gaussians, rasterize full
    # image on every device (round-1 scheme, 3DGS only)
    # ------------------------------------------------------------------
    def replicated_loss_fn(params, probe, state, cam, n_local, m_idx,
                           iteration):
        dec, colors, camera = _decode(state, params, cam, n_local)
        gather = partial(jax.lax.all_gather, axis_name="model",
                         axis=0, tiled=True)
        means = gather(dec.means)
        quats = gather(dec.quats)
        scales = gather(dec.scales)
        opac = gather(dec.opacities)
        colors = gather(colors)
        sel = gather(dec.selection_mask)

        proj = project_3dgs(means, quats, scales, camera.viewmat,
                            camera.K, width, height)
        if backend in ("pallas", "pallas_interpret"):
            from horizongs_tpu.ops.raster_pallas import (
                rasterize_pallas_3dgs)
            render, alphas, info = rasterize_pallas_3dgs(
                means, quats, scales, opac, colors, camera.viewmat,
                camera.K, width, height, bg, sh_degree=sh_deg,
                render_mode=cfg.render_mode,
                means2d_override=proj.means2d + probe,
                cap=instance_cap,
                interpret=backend == "pallas_interpret")
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
        aux["psnr"] = psnr(image * cam.alpha_mask,
                           cam.image * cam.alpha_mask)
        side = {"opacities": opac, "selection_mask": sel,
                "anchor_mask": gather(dec.anchor_mask),
                "radii": info["radii"],
                "n_dropped_exchange": jnp.zeros((), jnp.int32),
                "n_dropped_instances": info["n_dropped"],
                "local_stats": False}
        return loss, (aux, side)

    def device_fn(state: TrainState, cams: CameraTensors, iteration):
        # local shapes: per-anchor arrays are (C/n_model, ...) rows;
        # cams leaves are (1, ...) — this device's camera. In the band
        # path the image leaves are (1, 1, Hp, W, C) band strips (sharded
        # over "data" AND "model"): squeeze both leading axes.
        cam = jax.tree.map(lambda x: x[0], cams)
        if shard_tiles:
            cam = cam._replace(image=cam.image[0],
                               alpha_mask=cam.alpha_mask[0],
                               invdepth=cam.invdepth[0],
                               depth_mask=cam.depth_mask[0])
        m_idx = jax.lax.axis_index("model")
        C_local = state.params.anchor.shape[0]
        n_local = jnp.clip(state.n - m_idx * C_local, 0, C_local)
        iteration = jnp.asarray(iteration, dtype=jnp.float32)

        loss_impl = band_loss_fn if shard_tiles else replicated_loss_fn
        probe_rows = C_local * k if shard_tiles else C_local * k * n_model
        probe = jnp.zeros((probe_rows, 2), dtype=jnp.float32)

        def loss_fn(params, probe):
            return loss_impl(params, probe, state, cam, n_local, m_idx,
                             iteration)

        (loss, (aux, side)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, probe)
        pgrads, probe_grad = grads

        # reduce: everything mean over data; mlp/appearance also sum over
        # model (each shard only saw its own anchors' decode path).
        # The 1/n_model rescale undoes the all_gather transpose's psum:
        # each device's backward computes d(sum of all model-shard
        # losses)/d(local params) = n_model x the true gradient, because
        # every replica's (identical) loss cotangent flows back through
        # psum_scatter. In the band path the probe sits BEFORE the image
        # gather, so its gradient carries the same factor; in the
        # replicated path it enters after the gather and is already 1x.
        # weighted DP mean: a view that appears k times in the batch
        # carries loss_weight 1/k (trainer `_pick_batch` on datasets too
        # small to fill the batch), so duplicates don't weigh k x in the
        # mean gradient. All-ones weights reduce to the plain pmean.
        w = cam.loss_weight
        wscale = w * n_data / jax.lax.psum(w, "data")
        pgrads = jax.tree.map(
            lambda g: jax.lax.pmean(g * wscale, "data") / n_model, pgrads)
        reduce_model = lambda t: jax.tree.map(
            lambda g: jax.lax.psum(g, "model"), t)
        pgrads = pgrads._replace(
            mlp_opacity=reduce_model(pgrads.mlp_opacity),
            mlp_cov=reduce_model(pgrads.mlp_cov),
            mlp_color=reduce_model(pgrads.mlp_color),
            appearance=None if pgrads.appearance is None
            else reduce_model(pgrads.appearance))
        probe_grad = jax.lax.pmean(probe_grad, "data")
        if shard_tiles:
            probe_grad = probe_grad / n_model

        lrs_dict = group_lrs(opt, iteration, spatial_lr_scale)
        lrs = lr_tree(state.params, lrs_dict, frozen_mlps=frozen_mlps,
                      frozen_appearance=frozen_appearance)
        new_params, new_opt = adam_step(state.params, pgrads, state.opt, lrs)

        # densify statistics on the local row slice
        if side["local_stats"]:
            opac_l = side["opacities"]
            sel_l = side["selection_mask"]
            amask_l = side["anchor_mask"]
            radii_l = side["radii"]
            pg_l = probe_grad
        else:
            off = m_idx * C_local
            sl = lambda x, o, n_: jax.lax.dynamic_slice_in_dim(x, o, n_)
            opac_l = sl(side["opacities"], off * k, C_local * k)
            sel_l = sl(side["selection_mask"], off * k, C_local * k)
            amask_l = sl(side["anchor_mask"], off, C_local)
            radii_l = sl(side["radii"], off * k, C_local * k)
            pg_l = sl(probe_grad, off * k, C_local * k)
        local_stats = update_stats(
            opt, state.stats, k, opac_l, sel_l, amask_l, radii_l, pg_l,
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

        pmax2 = lambda x: jax.lax.pmax(jax.lax.pmax(x, "data"), "model")
        d_exch = pmax2(side["n_dropped_exchange"])
        d_inst = pmax2(side["n_dropped_instances"])
        metrics = {
            "loss": jax.lax.pmean(loss * wscale, "data"),
            "l1": jax.lax.pmean(aux["l1"], "data"),
            "psnr": jax.lax.pmean(aux["psnr"], "data"),
            "n_dropped": d_exch + d_inst,
            "n_dropped_exchange": d_exch,
            "n_dropped_instances": d_inst,
        }
        new_state = TrainState(params=new_params, rotation=state.rotation,
                               level=state.level,
                               extra_level=state.extra_level, n=state.n,
                               opt=new_opt, stats=new_stats)
        return new_state, metrics

    def _strip_leaf(x):
        """(n_data, H, W, C) full images -> (n_data, n_model, Hp, W, C)
        overlapping band+halo strips (per-band starts support
        load-balanced boundaries); rows outside the image are zero
        (the same padding the full-image SSIM window sees at the image
        border)."""
        Hp = layout.band_px + 2 * HALO
        starts = jnp.asarray(layout.starts_px, jnp.int32)
        pad_bottom = max(layout.starts_px[-1] + Hp - height - HALO, 0)
        xp = jnp.pad(x, ((0, 0), (HALO, pad_bottom), (0, 0), (0, 0)))
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(xp, s, Hp, axis=1),
            out_axes=1)(starts)

    def step(state: TrainState, cams: CameraTensors, iteration):
        specs = state_specs(state)
        cam_specs = jax.tree.map(lambda _: P("data"), cams)
        if shard_tiles:
            # slice the ground-truth tensors into band+halo strips here,
            # OUTSIDE shard_map, and shard them over ("data", "model"):
            # each device receives only its own band's rows instead of a
            # model-replicated full-resolution image
            cams = cams._replace(image=_strip_leaf(cams.image),
                                 alpha_mask=_strip_leaf(cams.alpha_mask),
                                 invdepth=_strip_leaf(cams.invdepth),
                                 depth_mask=_strip_leaf(cams.depth_mask))
            strip_spec = P("data", "model")
            cam_specs = cam_specs._replace(
                image=strip_spec, alpha_mask=strip_spec,
                invdepth=strip_spec, depth_mask=strip_spec)
        fn = shard_map(device_fn, mesh=mesh,
                       in_specs=(specs, cam_specs, P()),
                       out_specs=(specs, P()), check_vma=False)
        return fn(state, cams, jnp.asarray(iteration, dtype=jnp.float32))

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# band_cap calibration: measure the routing the band step will actually do
# ---------------------------------------------------------------------------

_BAND_COUNTERS = {}


def count_band_records(cam: Camera, cfg: ModelConfig, mlps, state,
                       n_model: int, backend: str = "scan",
                       add_prefilter: bool = True,
                       band_bounds=None) -> jnp.ndarray:
    """Max records any single (src anchor shard -> dst band) pair carries
    for this view — the quantity `band_cap` must cover. Runs the same
    decode -> pack -> band-span path as `band_loss_fn` on the full
    (host-replicated) table, partitions the rows into the n_model
    contiguous shard slices the mesh will use (decode rows are
    anchor-major, so shard m's records are rows [m*K/n, (m+1)*K/n)), and
    counts per (src, dst). Feed the max over sample views to
    `tile_exchange.suggest_band_cap` — the exact analog of
    `render.count_render_instances` + `suggest_instance_cap` for the
    exchange capacity. Jits internally per (cfg, resolution, n_model)."""
    return jnp.max(count_band_matrix(cam, cfg, mlps, state, n_model,
                                     backend=backend,
                                     add_prefilter=add_prefilter,
                                     band_bounds=band_bounds))


def count_band_matrix(cam: Camera, cfg: ModelConfig, mlps, state,
                      n_model: int, backend: str = "scan",
                      add_prefilter: bool = True,
                      band_bounds=None) -> jnp.ndarray:
    """Full (src shard, dst band) routed-record matrix for this view —
    the load-balance diagnostic behind `count_band_records` (which is
    its max element). Column sums are each band's total composite load;
    their spread is the band imbalance a synchronous step waits on."""
    import functools

    key = (cfg, cam.width, cam.height, n_model, backend, add_prefilter,
           band_bounds)
    if key not in _BAND_COUNTERS:
        width, height = cam.width, cam.height
        tile_w, tile_h = backend_tile_shape(cfg.gs_attr, backend)
        layout = band_layout(height, width, n_model, tile_h,
                             bounds=band_bounds)
        sh_deg = cfg.max_sh_degree if cfg.color_attr != "RGB" else None

        @functools.partial(jax.jit, static_argnames=("uid",))
        def counter(viewmat, K, cam_center, res_scale, uid, mlps, state):
            camera = Camera(viewmat=viewmat, K=K, width=width,
                            height=height, cam_center=cam_center,
                            uid=uid, resolution_scale=res_scale)
            amask, smooth = anchor_lod_mask(cfg, state, cam_center,
                                            res_scale)
            if add_prefilter:
                amask = prefilter_anchors(cfg, state, camera, amask)
            dec = decode_neural_gaussians(cfg, mlps, state, cam_center,
                                          amask, smooth,
                                          appearance_id=jnp.asarray(uid))
            if cfg.color_attr != "RGB":
                colors = dec.colors.reshape(-1, cfg.color_dim // 3, 3)
            else:
                colors = dec.colors
            if cfg.gs_attr == "2D":
                fields, bin_radii, _depths, _ = pack_fields_2dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities,
                    colors, viewmat, K, width, height, sh_degree=sh_deg)
                my, ry = fields[:, 10], bin_radii
            else:
                fields, bin_radii, proj = pack_fields_3dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities,
                    colors, viewmat, K, width, height, sh_degree=sh_deg)
                _, e_ry, _ = ellipse_extents(proj.conics, dec.opacities)
                my = fields[:, 1]
                ry = jnp.where(bin_radii > 0, e_ry, 0.0)
            valid = bin_radii > 0
            b0, b1 = band_span(my, ry, layout, halo_px=HALO)
            dests = jnp.arange(n_model, dtype=jnp.int32)[:, None]
            touch = (valid[None, :] & (b0[None, :] <= dests)
                     & (dests <= b1[None, :]))           # (dst, K)
            K_rows = touch.shape[1]
            if K_rows % n_model:
                raise ValueError(
                    f"decoded row count {K_rows} is not divisible by "
                    f"n_model={n_model}: pad the anchor table first "
                    f"(train.densify.pad_state_capacity) so rows shard "
                    f"evenly, as trainer-built states do")
            # (dst, src, rows/shard) -> per-(src, dst) routed counts
            per = touch.reshape(n_model, n_model, K_rows // n_model)
            return jnp.sum(per, axis=-1).T                # (src, dst)

        _BAND_COUNTERS[key] = counter
    return _BAND_COUNTERS[key](cam.viewmat, cam.K, cam.cam_center,
                               cam.resolution_scale, int(cam.uid),
                               mlps, state)


_ROW_COUNTERS = {}


def count_view_row_loads(cam: Camera, cfg: ModelConfig, mlps, state,
                         backend: str = "scan",
                         add_prefilter: bool = True) -> jnp.ndarray:
    """Per-tile-row routed-record loads for this view — the same
    decode -> pack path as `count_band_records`, reduced to tile-row
    granularity (`tile_exchange.count_tile_row_loads`). Feed the sum
    over sample views to `tile_exchange.suggest_band_bounds` to get
    load-balanced band boundaries."""
    import functools
    from horizongs_tpu.parallel.tile_exchange import count_tile_row_loads

    key = (cfg, cam.width, cam.height, backend, add_prefilter)
    if key not in _ROW_COUNTERS:
        width, height = cam.width, cam.height
        tile_w, tile_h = backend_tile_shape(cfg.gs_attr, backend)
        n_tiles_y = -(-height // tile_h)
        sh_deg = cfg.max_sh_degree if cfg.color_attr != "RGB" else None

        @functools.partial(jax.jit, static_argnames=("uid",))
        def counter(viewmat, K, cam_center, res_scale, uid, mlps, state):
            camera = Camera(viewmat=viewmat, K=K, width=width,
                            height=height, cam_center=cam_center,
                            uid=uid, resolution_scale=res_scale)
            amask, smooth = anchor_lod_mask(cfg, state, cam_center,
                                            res_scale)
            if add_prefilter:
                amask = prefilter_anchors(cfg, state, camera, amask)
            dec = decode_neural_gaussians(cfg, mlps, state, cam_center,
                                          amask, smooth,
                                          appearance_id=jnp.asarray(uid))
            if cfg.color_attr != "RGB":
                colors = dec.colors.reshape(-1, cfg.color_dim // 3, 3)
            else:
                colors = dec.colors
            if cfg.gs_attr == "2D":
                fields, bin_radii, _depths, _ = pack_fields_2dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities,
                    colors, viewmat, K, width, height, sh_degree=sh_deg)
                my, ry = fields[:, 10], bin_radii
            else:
                fields, bin_radii, proj = pack_fields_3dgs(
                    dec.means, dec.quats, dec.scales, dec.opacities,
                    colors, viewmat, K, width, height, sh_degree=sh_deg)
                _, e_ry, _ = ellipse_extents(proj.conics, dec.opacities)
                my = fields[:, 1]
                ry = jnp.where(bin_radii > 0, e_ry, 0.0)
            return count_tile_row_loads(my, ry, bin_radii > 0,
                                        n_tiles_y, tile_h)

        _ROW_COUNTERS[key] = counter
    return _ROW_COUNTERS[key](cam.viewmat, cam.K, cam.cam_center,
                              cam.resolution_scale, int(cam.uid),
                              mlps, state)


