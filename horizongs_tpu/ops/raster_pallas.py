"""Pallas-backed 3DGS rasterization: projection + binning in XLA, the
per-tile compositing loop in hand-written TPU kernels (fwd + bwd).

The kernel pair (`ops/pallas/raster3d.py`) is wrapped in a
`jax.custom_vjp` whose boundary is the packed per-gaussian field matrix
(N, 10): [mx, my, conic_a, conic_b, conic_c, opacity, r, g, b, depth].
Everything before the boundary (EWA projection, SH eval, the neural
decode) and after it (background blend, depth modes, losses)
differentiates with ordinary XLA autodiff.

Gradient routing back from per-instance to per-gaussian avoids XLA's
serializing scatter: the backward kernel writes one gradient row per
instance into a per-tile G-aligned column layout (`binning.grad_slot`);
rows are un-sorted with a precomputed gather and reduced per gaussian
with a cumsum over the contiguous pre-sort slot ranges — all O(CAP)
vector primitives. Dead columns — chunks the forward never composited
(saturated tiles) and the sentinel block binning routes invalid slots
to — are written as exact zeros by the backward kernel, so the un-sort
gather needs no runtime validity mask.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.dtypes import float0

from horizongs_tpu.ops.binning import (
    TileInstances,
    build_tile_instances,
    count_tile_instances,
    cull_radius,
)
from horizongs_tpu.ops.pallas.raster3d import (
    G,
    INST_DIM,
    P,
    TILE_H,
    TILE_W,
    rasterize_bwd,
    rasterize_fwd,
)
from horizongs_tpu.ops.projection import project_3dgs
from horizongs_tpu.ops.raster import _make_grid, _tiles_to_image
from horizongs_tpu.ops.reference import _sh_colors

N_FIELDS = 10


def suggest_instance_cap(n_instances: int, margin: float = 1.25,
                         buckets_per_octave: int = 8) -> int:
    """Round a measured instance count up to a geometric capacity bucket
    (8 buckets per octave, <=~9% spacing, G-aligned). Static capacities
    trigger one recompile per bucket; geometric spacing bounds both the
    recompile count and the padding overhead — and since recalibration
    happens only on counted-overflow events (whose cadence the margin
    schedule sets, not the bucket density), the r5 move from 4 to 8
    buckets/octave halves the average capacity padding (~9% -> ~4%)
    without adding recompiles (ROOFLINE.json capacity_cost measures the
    per-step price of every 100k slack slots). Use with
    `binning.count_tile_instances` / `count_instances_3dgs` — every
    binning/assembly/routing stage scales with the capacity, so a
    calibrated cap is ~25-35% cheaper per step than the 4N default
    (gsplat sizes its instance list exactly per frame; this is the
    static-shape analog)."""
    b = buckets_per_octave
    need = max(int(math.ceil(n_instances * margin)), G)
    k = max(int(math.ceil(b * math.log2(need / G))), 0)
    cap = int(math.ceil(G * 2 ** (k / b)))
    return -(-cap // G) * G


def count_instances_3dgs(means, quats, scales, opacities, viewmat, K,
                         width: int, height: int,
                         eps2d: float = 0.3,
                         tile_w: int = TILE_W,
                         tile_h: int = TILE_H) -> jnp.ndarray:
    """Instance count the 3DGS wrapper below will enumerate for this
    view (projection + lossless opacity cull + AABB tile spans). Cheap
    and jittable; feed the max over sample views to
    `suggest_instance_cap`. Pass the BACKEND's tile shape — the scan
    backend's 16x16 tiles enumerate ~4x the instances of the 32x32
    Pallas tiles (`raster_fields.backend_tile_shape`)."""
    grid = _make_grid(width, height, tile_w, tile_h)
    proj = project_3dgs(means, quats, scales, viewmat, K, width, height,
                        eps2d=eps2d)
    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities), 0.0)
    return count_tile_instances(proj.means2d, radii, grid.n_tiles_x,
                                grid.n_tiles_y, tile_w, tile_h,
                                conics=proj.conics, opacities=opacities)


def count_instances_2dgs(means, quats, scales, opacities, viewmat, K,
                         width: int, height: int,
                         tile_w: Optional[int] = None,
                         tile_h: Optional[int] = None) -> jnp.ndarray:
    """2DGS analog of `count_instances_3dgs` (matches the 2D wrapper's
    cull radius incl. its low-pass guard)."""
    from horizongs_tpu.ops.pallas.raster2d import (
        TILE_H as TILE_H2, TILE_W as TILE_W2)
    from horizongs_tpu.ops.projection import project_2dgs
    tile_w = TILE_W2 if tile_w is None else tile_w
    tile_h = TILE_H2 if tile_h is None else tile_h
    grid = _make_grid(width, height, tile_w, tile_h)
    proj = project_2dgs(means, quats, scales, viewmat, K, width, height)
    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities, guard_px=2.2),
                      0.0)
    return count_tile_instances(proj.means2d, radii, grid.n_tiles_x,
                                grid.n_tiles_y, tile_w, tile_h)


def _assemble_inst(fields: jnp.ndarray, inst: TileInstances,
                   inst_dim: int = INST_DIM) -> jnp.ndarray:
    """(N, F) fields -> (inst_dim, CAP+2G) transposed SoA instance columns
    (row F = validity flag). 2G of zero padding keeps the kernels' pair
    (2-chunk) DMAs in bounds for every floor-aligned segment."""
    cap = inst.gauss_id.shape[0]
    n_fields = fields.shape[1]
    gathered = fields[inst.gauss_id]                      # (CAP, F)
    one = inst.valid.astype(jnp.float32)[:, None]
    gathered = jnp.where(one > 0, gathered, 0.0)
    packed = jnp.concatenate(
        [gathered, one, jnp.zeros((cap, inst_dim - n_fields - 1))], axis=-1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((2 * G, inst_dim), packed.dtype)], axis=0)
    return packed.T                                        # (inst_dim, CAP+2G)


def _instance_grads_to_fields(ginst: jnp.ndarray, inst: TileInstances,
                              n_fields: int = N_FIELDS) -> jnp.ndarray:
    """(inst_dim, CAP_OUT) instance grads -> (N, F) per-gaussian grads.

    Un-sort with the precomputed `grad_slot` gather, then reduce each
    gaussian's contiguous pre-sort slot range with a cumsum difference.
    NO runtime validity mask: the backward kernels write exact zeros
    into every dead column — never-composited chunks (saturation
    early-exit) and the sentinel block where binning routes invalid
    slots — so dead slots gather zero by construction (the per-slot
    ifin[slot_tile] mask gather this replaces cost 5.8 ms/step at 1080p,
    r4 device trace). Slot count may exceed the padded row count when
    instances overflowed the cap — ranges are clipped."""
    n_slots = inst.inv_perm.shape[0]
    # all in the kernel's transposed (F, CAP) layout: the lane-axis
    # gather + cumsum avoid materializing the (CAP_OUT, F) transpose
    gu = jnp.take(ginst[:n_fields, :], inst.grad_slot, axis=1)  # (F, CAP)
    csum = jnp.cumsum(gu, axis=1)
    csum = jnp.concatenate([jnp.zeros((n_fields, 1)), csum], axis=1)
    ends = jnp.clip(inst.gauss_offsets, 0, n_slots)
    starts = jnp.clip(inst.gauss_offsets - inst.gauss_cover, 0, n_slots)
    return (jnp.take(csum, ends, axis=1)
            - jnp.take(csum, starts, axis=1)).T            # (N, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _raster_core(fields, inst: TileInstances,
                 n_tiles_x: int, n_tiles_y: int, interpret: bool):
    inst_data = _assemble_inst(fields, inst)
    return rasterize_fwd(inst_data, inst.tile_starts, n_tiles_x, n_tiles_y,
                         interpret=interpret)


def _raster_core_fwd(fields, inst, n_tiles_x, n_tiles_y, interpret):
    inst_data = _assemble_inst(fields, inst)
    out = rasterize_fwd(inst_data, inst.tile_starts, n_tiles_x, n_tiles_y,
                        interpret=interpret)
    acc, logT2 = out
    return out, (inst_data, inst, logT2)


def _raster_core_bwd(n_tiles_x, n_tiles_y, interpret, res, d_out):
    inst_data, inst, logT2 = res
    d_acc, d_logT2 = d_out
    logT_final = logT2[:, 0:1, :]
    ifin = logT2[:, 1, 0].astype(jnp.int32)                # (n_tiles,)
    d_logT = d_logT2[:, 0:1, :]
    ginst = rasterize_bwd(inst_data, inst.tile_starts, inst.out_starts,
                          ifin, d_acc, d_logT, logT_final,
                          n_tiles_x, n_tiles_y, interpret=interpret)
    # int/bool pytree args take float0 cotangents
    d_inst = jax.tree.map(lambda x: np.zeros(x.shape, float0), inst)
    return (_instance_grads_to_fields(ginst, inst), d_inst)


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


def rasterize_pallas_3dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, colors: jnp.ndarray,
    viewmat: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
    background: jnp.ndarray, sh_degree: Optional[int] = None,
    render_mode: str = "RGB", eps2d: float = 0.3,
    means2d_override: Optional[jnp.ndarray] = None,
    cap: Optional[int] = None, interpret: bool = False,
):
    """Drop-in equivalent of `rasterize_tiled_3dgs` on the Pallas path.

    colors must be RGB (N, 3) or SH (N, K, 3); outputs match the scan
    backend: (render (H,W,C), alphas (H,W,1), info).
    """
    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    N = means.shape[0]
    grid = _make_grid(width, height, TILE_W, TILE_H)
    cap = cap if cap is not None else max(4 * N, G)
    cap = -(-cap // G) * G

    proj = project_3dgs(means, quats, scales, viewmat, K, width, height,
                        eps2d=eps2d)
    means2d = proj.means2d if means2d_override is None else means2d_override
    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    # gaussians below the alpha cutoff can never contribute — don't bin them
    # (the neural-GS decode zeroes opacity on masked rows, so this is what
    # keeps dead table padding free); the opacity-aware cull radius is
    # lossless w.r.t. the compositor's alpha cutoff
    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities), 0.0)
    inst = build_tile_instances(jax.lax.stop_gradient(means2d), radii,
                                proj.depths, grid.n_tiles_x, grid.n_tiles_y,
                                TILE_W, TILE_H, cap,
                                conics=jax.lax.stop_gradient(proj.conics),
                                opacities=jax.lax.stop_gradient(opacities))

    fields = jnp.concatenate([
        means2d, proj.conics, opacities[:, None], rgb, proj.depths[:, None],
    ], axis=-1)                                            # (N, 10)

    acc, logT2 = _raster_core(fields, inst, grid.n_tiles_x, grid.n_tiles_y,
                              interpret)   # (n_tiles, 16, P), (n_tiles, 2, P)
    logT = logT2[:, 0:1, :]

    color_t = jnp.swapaxes(acc[:, 6:9, :], 1, 2)           # (n_tiles, P, 3)
    alpha_t = jnp.swapaxes(acc[:, 10:11, :], 1, 2)
    depth_t = jnp.swapaxes(acc[:, 9:10, :], 1, 2)
    T_final = jnp.exp(jnp.swapaxes(logT, 1, 2))            # (n_tiles, P, 1)

    render = _tiles_to_image(color_t + T_final * background[None, None, :],
                             grid, height, width)
    alphas = _tiles_to_image(alpha_t, grid, height, width)

    if render_mode == "RGB+D":
        depth_img = _tiles_to_image(depth_t, grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    elif render_mode == "RGB+ED":
        ed = depth_t / jnp.clip(alpha_t, 1e-10, None)
        depth_img = _tiles_to_image(ed, grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths,
            "conics": proj.conics, "n_instances": inst.n_instances,
            "n_dropped": inst.n_dropped}
    return render, alphas, info


# ---------------------------------------------------------------------------
# 2DGS
# ---------------------------------------------------------------------------

N_FIELDS_2D = 18   # M1(3) M2(3) M3(3) mx my op rgb(3) normal(3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _raster2d_core(fields, inst: TileInstances,
                   n_tiles_x: int, n_tiles_y: int, interpret: bool):
    from horizongs_tpu.ops.pallas.raster2d import (
        INST_DIM as INST_DIM2, rasterize2d_fwd)
    inst_data = _assemble_inst(fields, inst, inst_dim=INST_DIM2)
    return rasterize2d_fwd(inst_data, inst.tile_starts, n_tiles_x,
                           n_tiles_y, interpret=interpret)


def _raster2d_core_fwd(fields, inst, n_tiles_x, n_tiles_y, interpret):
    from horizongs_tpu.ops.pallas.raster2d import (
        INST_DIM as INST_DIM2, rasterize2d_fwd)
    inst_data = _assemble_inst(fields, inst, inst_dim=INST_DIM2)
    out = rasterize2d_fwd(inst_data, inst.tile_starts, n_tiles_x,
                          n_tiles_y, interpret=interpret)
    acc, aux = out
    return out, (inst_data, inst, aux)


def _raster2d_core_bwd(n_tiles_x, n_tiles_y, interpret, res, d_out):
    from horizongs_tpu.ops.pallas.raster2d import rasterize2d_bwd
    inst_data, inst, aux = res
    d_acc, d_aux = d_out
    ifin = aux[:, 6, 0].astype(jnp.int32)                  # (n_tiles,)
    ginst = rasterize2d_bwd(inst_data, inst.tile_starts, inst.out_starts,
                            ifin, d_acc, d_aux, aux,
                            n_tiles_x, n_tiles_y, interpret=interpret)
    d_inst = jax.tree.map(lambda x: np.zeros(x.shape, float0), inst)
    return (_instance_grads_to_fields(ginst, inst,
                                      n_fields=N_FIELDS_2D),
            d_inst)


_raster2d_core.defvjp(_raster2d_core_fwd, _raster2d_core_bwd)


def rasterize_pallas_2dgs(
    means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
    opacities: jnp.ndarray, colors: jnp.ndarray,
    viewmat: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
    background: jnp.ndarray, sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    means2d_override: Optional[jnp.ndarray] = None,
    cap: Optional[int] = None, interpret: bool = False,
):
    """Pallas-backed 2DGS rasterization. Output tuple mirrors the dense
    oracle `render_dense_2dgs` (and gsplat's `rasterization_2dgs`,
    reference `gaussian_renderer/render.py:55-76`): (render, alphas,
    normals, normals_from_depth, distort, median_depth, info)."""
    from horizongs_tpu.ops.pallas.raster2d import (
        TILE_H as TILE_H2, TILE_W as TILE_W2)
    from horizongs_tpu.ops.projection import project_2dgs
    from horizongs_tpu.ops.reference import depth_to_normals

    if render_mode not in ("RGB", "RGB+D", "RGB+ED"):
        raise ValueError(f"Unknown render_mode: {render_mode}")
    N = means.shape[0]
    grid = _make_grid(width, height, TILE_W2, TILE_H2)
    cap = cap if cap is not None else max(4 * N, G)
    cap = -(-cap // G) * G

    proj = project_2dgs(means, quats, scales, viewmat, K, width, height)
    means2d = proj.means2d if means2d_override is None else means2d_override
    cam_pos = jnp.linalg.inv(viewmat)[:3, 3]
    rgb = _sh_colors(colors, sh_degree, means, cam_pos)

    radii = jnp.where(opacities >= 1.0 / 255.0,
                      cull_radius(proj.radii, opacities, guard_px=2.2),
                      0.0)
    inst = build_tile_instances(jax.lax.stop_gradient(means2d), radii,
                                proj.depths, grid.n_tiles_x, grid.n_tiles_y,
                                TILE_W2, TILE_H2, cap)

    M = proj.transforms                                    # (N, 3, 3)
    fields = jnp.concatenate([
        M[:, 0, :], M[:, 1, :], M[:, 2, :], means2d,
        opacities[:, None], rgb, proj.normals,
    ], axis=-1)                                            # (N, 18)

    acc, aux = _raster2d_core(fields, inst, grid.n_tiles_x, grid.n_tiles_y,
                              interpret)

    color_t = jnp.swapaxes(acc[:, 12:15, :], 1, 2)         # (n_tiles, P, 3)
    normal_t = jnp.swapaxes(acc[:, 15:18, :], 1, 2)
    alpha_t = jnp.swapaxes(acc[:, 18:19, :], 1, 2)
    logT_t = jnp.swapaxes(aux[:, 0:1, :], 1, 2)
    depth_t = jnp.swapaxes(aux[:, 1:2, :], 1, 2)
    dist_t = jnp.swapaxes(aux[:, 2:3, :], 1, 2)
    med_t = jnp.swapaxes(aux[:, 3:4, :], 1, 2)
    T_final = jnp.exp(logT_t)

    render = _tiles_to_image(color_t + T_final * background[None, None, :],
                             grid, height, width)
    alphas = _tiles_to_image(alpha_t, grid, height, width)
    normals = _tiles_to_image(normal_t, grid, height, width)
    distort = _tiles_to_image(dist_t, grid, height, width)
    median = _tiles_to_image(med_t, grid, height, width)

    if render_mode == "RGB+D":
        depth_img = _tiles_to_image(depth_t, grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)
    elif render_mode == "RGB+ED":
        ed = depth_t / jnp.clip(alpha_t, 1e-10, None)
        depth_img = _tiles_to_image(ed, grid, height, width)
        render = jnp.concatenate([render, depth_img], axis=-1)

    normals_from_depth = depth_to_normals(median[..., 0], K)

    info = {"radii": proj.radii, "means2d": means2d, "depths": proj.depths,
            "n_instances": inst.n_instances, "n_dropped": inst.n_dropped}
    return render, alphas, normals, normals_from_depth, distort, median, info
