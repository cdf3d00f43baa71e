"""Synthetic scenes for tests and benchmarks (no dataset dependency).

The reference has no test assets at all (SURVEY.md §4); we generate
procedural gaussian clouds and camera rigs so every kernel and the full
training loop can be exercised hermetically.
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from horizongs_tpu.core.cameras import Camera, make_camera


def random_gaussians(n: int, seed: int = 0, extent: float = 1.0,
                     scale_range: Tuple[float, float] = (0.01, 0.05),
                     center: Tuple[float, float, float] = (0.0, 0.0, 0.0)):
    """Random gaussian cloud in a cube of half-size `extent` around `center`.

    Returns dict of numpy arrays: means (n,3), quats (n,4) normalized wxyz,
    scales (n,3) positive, opacities (n,), colors (n,3) in [0,1].
    """
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, size=(n, 3)) + np.asarray(center)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(*scale_range, size=(n, 3))
    opacities = rng.uniform(0.3, 0.95, size=(n,))
    colors = rng.uniform(0.0, 1.0, size=(n, 3))
    return {
        "means": means.astype(np.float32),
        "quats": quats.astype(np.float32),
        "scales": scales.astype(np.float32),
        "opacities": opacities.astype(np.float32),
        "colors": colors.astype(np.float32),
    }


def lookat_camera(width: int = 128, height: int = 128,
                  eye: Tuple[float, float, float] = (0.0, 0.0, -4.0),
                  target: Tuple[float, float, float] = (0.0, 0.0, 0.0),
                  up: Tuple[float, float, float] = (0.0, -1.0, 0.0),
                  fovx: float = math.radians(60.0),
                  image_type: str = "aerial", uid: int = 0) -> Camera:
    """Camera at `eye` looking at `target` (OpenCV convention: +z forward)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns = camera axes
    # reference convention: R stored as c2w rotation, t = w2c translation
    t_w2c = -R_c2w.T @ eye
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    return make_camera(R=R_c2w, t=t_w2c, fovx=fovx, fovy=fovy,
                       width=width, height=height, image_type=image_type,
                       uid=uid)


def orbit_cameras(n_cams: int, radius: float = 4.0, height_z: float = -1.5,
                  width: int = 128, height: int = 128,
                  image_type: str = "aerial"):
    """Ring of cameras orbiting the origin (aerial-ish if height_z < 0)."""
    cams = []
    for i in range(n_cams):
        theta = 2 * math.pi * i / n_cams
        eye = (radius * math.cos(theta), radius * math.sin(theta), height_z)
        cams.append(lookat_camera(width=width, height=height, eye=eye,
                                  image_type=image_type, uid=i))
    return cams


def write_synthetic_blender_dataset(path: str, n_train: int = 6,
                                    n_test: int = 2, width: int = 64,
                                    height: int = 64, n_gauss: int = 40,
                                    seed: int = 0, with_street: bool = True):
    """Write a tiny on-disk Blender-format dataset (transforms_*.json +
    RGBA PNGs + points3d.ply) rendered from a known gaussian cloud, so the
    full CLI pipeline can be exercised hermetically."""
    import json
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from horizongs_tpu.io.plyio import write_points_ply
    from horizongs_tpu.ops.reference import render_dense_3dgs

    os.makedirs(os.path.join(path, "aerial"), exist_ok=True)
    if with_street:
        os.makedirs(os.path.join(path, "street"), exist_ok=True)

    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(n_gauss, seed=seed, extent=0.7,
                          scale_range=(0.08, 0.2)).items()}
    fovx = math.radians(60.0)
    rfn = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, width, height, jnp.zeros(3)))

    def frames_for(cams, subdir, prefix):
        frames = []
        for i, cam in enumerate(cams):
            render, alphas, _ = rfn(cam.viewmat, cam.K)
            rgba = np.concatenate([
                np.clip(np.asarray(render), 0, 1),
                np.clip(np.asarray(alphas), 0, 1)], axis=-1)
            rel = f"{subdir}/{prefix}_{i:03d}.png"
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(path, rel))
            w2c = np.asarray(cam.viewmat, dtype=np.float64)
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1          # COLMAP -> Blender axes
            frames.append({"file_path": rel,
                           "transform_matrix": c2w.tolist()})
        return frames

    n_aerial = n_train if not with_street else max(n_train * 2 // 3, 1)
    n_street = n_train - n_aerial if with_street else 0
    aerial = orbit_cameras(n_aerial, radius=4.0, height_z=-2.5,
                           width=width, height=height)
    street = orbit_cameras(max(n_street, 1), radius=3.0, height_z=0.3,
                           width=width, height=height)[:n_street]
    test = orbit_cameras(max(n_test, 1), radius=3.8, height_z=-1.8,
                         width=width, height=height)[:n_test]

    train_frames = frames_for(aerial, "aerial", "a")
    if n_street:
        train_frames += frames_for(street, "street", "s")
    test_frames = frames_for(test, "aerial", "t")

    for name, frames in (("transforms_train.json", train_frames),
                         ("transforms_test.json", test_frames)):
        with open(os.path.join(path, name), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    pts = np.asarray(g["means"])
    cols = np.asarray(g["colors"])
    write_points_ply(os.path.join(path, "points3d.ply"), pts, cols)
    return g
