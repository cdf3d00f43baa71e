"""Scene orchestration: dataset -> cameras -> model state.

Functional port of `scene/__init__.py`: loads the dataset via the format
callbacks, builds camera lists per resolution scale, dumps input.ply /
cameras.json, and initializes the model — from the point cloud (coarse
stage), from a pretrained coarse checkpoint (fine stage,
`create_from_pretrained` + frozen MLPs + rollback base copies), from a
saved iteration, or from a baked explicit PLY.
"""
from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from horizongs_tpu.data.camera_build import camera_list, camera_to_json
from horizongs_tpu.data.readers import scene_load_callbacks
from horizongs_tpu.io.checkpoints import (
    load_anchor_ply,
    load_explicit_ply,
    load_mlp_checkpoints,
    save_anchor_ply,
    save_explicit_ply,
    save_mlp_checkpoints,
    search_max_iteration,
)
from horizongs_tpu.io.plyio import write_points_ply
from horizongs_tpu.models.anchors import (
    init_anchor_state_from_points,
    weed_out_mask,
)
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.explicit import bake_explicit, explicit_state_from_arrays
from horizongs_tpu.models.factory import base_copies, make_train_state, new_mlps
from horizongs_tpu.train.optim import mlps_from_params


class Scene:
    def __init__(self, lp, cfg: ModelConfig, load_iteration=None,
                 shuffle: bool = False, explicit: bool = False,
                 weed_ratio: float = 0.0, logger=None, seed: int = 0):
        self.lp = lp
        self.cfg = cfg
        self.model_path = lp.model_path
        self.explicit = explicit
        self.weed_ratio = weed_ratio
        self.stage = "coarse"
        self.base = None             # fine-stage rollback copies
        self.frozen_mlps = False
        log = logger.info if logger else print

        if getattr(lp, "random_background", False):
            self.background = jnp.asarray(np.random.rand(3), dtype=jnp.float32)
        elif getattr(lp, "white_background", False):
            self.background = jnp.ones(3)
        else:
            self.background = jnp.zeros(3)

        self.loaded_iter = None
        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = search_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            log(f"Loading trained model at iteration {self.loaded_iter}")

        fmt = lp.data_format
        loader = scene_load_callbacks[fmt]
        kwargs = dict(eval=lp.eval, add_mask=lp.add_mask,
                      add_depth=lp.add_depth, add_aerial=lp.add_aerial,
                      add_street=lp.add_street, center=lp.center,
                      scale=lp.scale, llffhold=getattr(lp, "llffhold", 32),
                      images=lp.images)
        scene_info = loader(lp.source_path, **kwargs)
        self.scene_info = scene_info
        self.cameras_extent = scene_info.nerf_normalization["radius"]

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            log(f"Train cameras: {len(scene_info.train_cameras)}")
            log(f"Test cameras: {len(scene_info.test_cameras)}")
            ratio = max(int(getattr(lp, "ratio", 1)), 1)
            pts = scene_info.point_cloud.points[::ratio]
            cols = scene_info.point_cloud.colors[::ratio]
            write_points_ply(os.path.join(self.model_path, "input.ply"),
                             pts, cols)
            cam_json = [camera_to_json(i, c) for i, c in enumerate(
                scene_info.test_cameras + scene_info.train_cameras)]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)
        else:
            ratio = max(int(getattr(lp, "ratio", 1)), 1)
            pts = scene_info.point_cloud.points[::ratio]

        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(scene_info.train_cameras)
            rng.shuffle(scene_info.test_cameras)

        self.train_cameras: Dict[float, list] = {}
        self.test_cameras: Dict[float, list] = {}
        for rs in lp.resolution_scales:
            self.train_cameras[rs] = camera_list(scene_info.train_cameras,
                                                 lp, rs)
            self.test_cameras[rs] = camera_list(scene_info.test_cameras,
                                                lp, rs)

        # camera info rows for weed-out (`scene/__init__.py:114-118`)
        self.cam_infos = np.array(
            [[*np.asarray(c.cam_center), c.resolution_scale]
             for c in self.get_train_cameras()], dtype=np.float32) \
            if self.get_train_cameras() else np.zeros((0, 4), np.float32)

        # ---- model state ----
        self.train_state = None
        self.explicit_state = None
        if self.loaded_iter:
            it_dir = os.path.join(self.model_path, "point_cloud",
                                  f"iteration_{self.loaded_iter}")
            if explicit:
                arrays, info = load_explicit_ply(
                    os.path.join(it_dir, "point_cloud_explicit.ply"))
                self.cfg = _fold_obj_info(self.cfg, info)
                self.explicit_state = explicit_state_from_arrays(arrays)
            else:
                state, info = load_anchor_ply(
                    os.path.join(it_dir, "point_cloud.ply"), self.cfg)
                self.cfg = _fold_obj_info(self.cfg, info)
                mlps = load_mlp_checkpoints(it_dir)
                self.train_state = make_train_state(self.cfg, state, mlps)
        elif getattr(lp, "pretrained_checkpoint", "") not in ("", None):
            # fine stage (`create_from_pretrained`, lod_model.py:619-671)
            self.stage = "fine"
            self.frozen_mlps = True
            ckpt = lp.pretrained_checkpoint
            state, info = load_anchor_ply(
                os.path.join(ckpt, "point_cloud.ply"), self.cfg)
            self.cfg = _fold_obj_info(self.cfg, info)
            mlps = load_mlp_checkpoints(ckpt)
            self.base = base_copies(state)
            self.train_state = make_train_state(self.cfg, state, mlps)
        else:
            weed_fn = None
            if weed_ratio > 0 and cfg.is_lod:
                weed_fn = lambda pos, lv: weed_out_mask(
                    cfg, pos, lv, self.cam_infos, weed_ratio)
            state = init_anchor_state_from_points(cfg, pts, weed_fn=weed_fn)
            log(f"Initial Voxel Number: {int(state.n)}")
            mlps = new_mlps(cfg, num_cameras=len(scene_info.train_cameras),
                            seed=seed)
            if getattr(lp, "global_appearance", "") not in ("", None):
                it = search_max_iteration(
                    os.path.join(lp.global_appearance, "point_cloud"))
                mlps = load_mlp_checkpoints(os.path.join(
                    lp.global_appearance, "point_cloud", f"iteration_{it}"))
                self.frozen_appearance = True
            self.train_state = make_train_state(cfg, state, mlps)

    # ------------------------------------------------------------------
    def get_train_cameras(self) -> list:
        out = []
        for rs in self.lp.resolution_scales:
            out.extend(self.train_cameras[rs])
        return out

    def get_test_cameras(self) -> list:
        out = []
        for rs in self.lp.resolution_scales:
            out.extend(self.test_cameras[rs])
        return out

    def save(self, iteration: int, train_state) -> None:
        """`Scene.save` (`scene/__init__.py:155-164`): anchor PLY + MLP
        weights (+ explicit bake when SH and view-independent)."""
        it_dir = os.path.join(self.model_path, "point_cloud",
                              f"iteration_{iteration}")
        os.makedirs(it_dir, exist_ok=True)
        astate = train_state.anchor_state()
        save_anchor_ply(os.path.join(it_dir, "point_cloud.ply"),
                        self.cfg, astate)
        mlps = mlps_from_params(train_state.params)
        save_mlp_checkpoints(it_dir, mlps)
        if self.cfg.color_attr == "RGB":
            pass  # "Neural Gaussians do not have the SH property."
        elif self.cfg.view_dim != 0:
            pass  # "Neural Gaussians are affected by viewpoint."
        else:
            arrays = bake_explicit(self.cfg, mlps, astate)
            save_explicit_ply(
                os.path.join(it_dir, "point_cloud_explicit.ply"),
                self.cfg, arrays)


def _fold_obj_info(cfg: ModelConfig, info: dict) -> ModelConfig:
    updates = {}
    if "standard_dist" in info:
        updates["standard_dist"] = float(info["standard_dist"])
    if "aerial_levels" in info:
        updates["aerial_levels"] = int(round(info["aerial_levels"]))
    if "street_levels" in info:
        updates["street_levels"] = int(round(info["street_levels"]))
    return dataclasses.replace(cfg, **updates) if updates else cfg
