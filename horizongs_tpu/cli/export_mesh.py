"""`python -m horizongs_tpu.cli.export_mesh -m PATH` — TSDF mesh export.

Reference equivalent: `export_mesh.py` + `utils/mesh_utils.py`: render all
train views with the 2DGS model (SH degree forced 0,
`export_mesh.py:45-46`), fuse alpha-masked depth maps into a TSDF volume
sized from the aerial camera bounding sphere, extract + keep the largest
cluster, write mesh.ply.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--voxel_size", type=float, default=None)
    parser.add_argument("--sdf_trunc", type=float, default=None)
    parser.add_argument("--depth_trunc", type=float, default=None)
    parser.add_argument("--resolution", type=int, default=128,
                        help="TSDF grid resolution along the largest axis")
    parser.add_argument("--use_median_depth", action="store_true")
    parser.add_argument("--unbounded", action="store_true",
                        help="contracted-space TSDF for unbounded scenes "
                        "(the reference's experimental "
                        "extract_mesh_unbounded, utils/mesh_utils.py:179 "
                        "— shipped truncated upstream; ours is complete)")
    parser.add_argument("--rasterizer", default="auto")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from horizongs_tpu.cli.common import get_logger, load_config
    from horizongs_tpu.data.scene import Scene
    from horizongs_tpu.render import render as render_fn
    from horizongs_tpu.train.optim import mlps_from_params
    from horizongs_tpu.train.trainer import pick_rasterizer
    from horizongs_tpu.utils.meshing import (
        estimate_bounding_sphere, fuse_tsdf, largest_component,
        marching_tetrahedra, write_mesh_ply)

    lp, op, pp, cfg = load_config(
        os.path.join(args.model_path, "config.yaml"), args.model_path)
    logger = get_logger("mesh", args.model_path)
    scene = Scene(lp, cfg, load_iteration=args.iteration, logger=logger)
    state = scene.train_state
    rasterizer = pick_rasterizer(args.rasterizer)
    cams = scene.get_train_cameras()

    depths, alphas, viewmats, Ks = [], [], [], []
    mlps = mlps_from_params(state.params)
    fns = {}
    for cam in cams:
        key = (cam.height, cam.width)
        if key not in fns:
            fns[key] = jax.jit(lambda vm, K, cc, ast, c=cam: render_fn(
                c._replace(viewmat=vm, K=K, cam_center=cc), scene.cfg,
                mlps, ast, scene.background, add_prefilter=pp.add_prefilter,
                active_sh_degree=0, rasterizer=rasterizer))
        pkg = fns[key](cam.viewmat, cam.K, cam.cam_center,
                       state.anchor_state())
        if args.use_median_depth and "render_median_depth" in pkg:
            depth = np.asarray(pkg["render_median_depth"][..., 0])
        else:
            depth = np.asarray(pkg["render_depth"][..., 0])
        depths.append(depth)
        alphas.append(np.asarray(pkg["render_alphas"][..., 0]))
        viewmats.append(np.asarray(cam.viewmat))
        Ks.append(np.asarray(cam.K))

    aerial = [np.asarray(c.cam_center) for c in cams
              if c.image_type == "aerial"]
    centers = np.array(aerial if aerial
                       else [np.asarray(c.cam_center) for c in cams])
    center, radius = estimate_bounding_sphere(centers)
    depth_trunc = args.depth_trunc or (radius * 2.0)

    if args.unbounded:
        from horizongs_tpu.utils.meshing import extract_mesh_unbounded
        logger.info(f"unbounded TSDF: center={center}, radius={radius:.3f}"
                    f", contracted grid {args.resolution}^3")
        verts, faces = extract_mesh_unbounded(
            depths, alphas, viewmats, Ks, centers,
            resolution=args.resolution, depth_trunc=args.depth_trunc or 1e9)
    else:
        voxel_size = args.voxel_size or (depth_trunc / args.resolution)
        sdf_trunc = args.sdf_trunc or (5.0 * voxel_size)
        half = depth_trunc / 2.0
        origin = center - half
        dims = (int(2 * half / voxel_size),) * 3
        logger.info(f"TSDF: center={center}, voxel={voxel_size:.4f}, "
                    f"dims={dims}, trunc={sdf_trunc:.4f}")
        tsdf, weight = fuse_tsdf(depths, alphas, viewmats, Ks, origin,
                                 voxel_size, dims, sdf_trunc, depth_trunc)
        verts, faces = marching_tetrahedra(tsdf, weight, origin, voxel_size)
        logger.info(f"raw mesh: {verts.shape[0]} verts, "
                    f"{faces.shape[0]} faces")
    verts, faces = largest_component(verts, faces)
    out = os.path.join(args.model_path,
                       f"mesh_iteration_{scene.loaded_iter}.ply")
    write_mesh_ply(out, verts, faces)
    logger.info(f"mesh ({verts.shape[0]} verts, {faces.shape[0]} faces) "
                f"-> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
