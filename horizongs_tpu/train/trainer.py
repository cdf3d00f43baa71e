"""Training driver: the host-side loop around the jitted train step.

Port of the reference trainer semantics (`train.py:83-285`):
  * aerial/street-balanced camera sampling (`camera_proportion` "a-s",
    `train.py:134-148`)
  * densification statistics gated per view type
    (`aerial_densify`/`street_densify`, `train.py:259-260`)
  * densify every `update_interval` inside (update_from, update_until),
    with fine-stage rollback before each epoch and a final rollback +
    stats clean at update_until (`train.py:265-273`)
  * SH degree bump every 1000 iterations (`update_learning_rate` tail)
  * periodic save / checkpoint / vis dumps
  * optional in-train remote-viewer poll (`train.py:113-127`; the
    reference ships this disabled — ours works, gated on `viewer_port`)

Cameras are grouped by resolution; each (H, W, capacity, sh_degree)
combination compiles one step.
"""
from __future__ import annotations

import functools
import os
import random
import time
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.train.densify import clean_stats, roll_back, run_densify
from horizongs_tpu.train.step import build_train_step, camera_tensors
from horizongs_tpu.io.checkpoints import save_train_checkpoint


def pick_rasterizer(requested: str = "auto") -> str:
    if requested != "auto":
        return requested
    return "pallas" if jax.default_backend() != "cpu" else "tiled"


class Trainer:
    # recalibration-margin ceiling: growth stops once another 1.5x
    # widening would exceed this (on the 1.25 * 1.5^k schedule the last
    # margin actually reached is 9.49 = 7.6x initial); past it the
    # trainer keeps the step (and stops recompiling) and lets the
    # counted overflow trimming handle the pathological view
    MARGIN_CEIL = 8 * 1.25

    def __init__(self, cfg: ModelConfig, op, pp, scene, logger=None,
                 rasterizer: str = "auto", seed: int = 0,
                 wandb_run=None, viewer_port: Optional[int] = None,
                 tb_writer=None,
                 profile_steps: Optional[tuple] = None,
                 mesh=None, band_cap: Optional[int] = None,
                 checkpoint_format: str = "npz",
                 balanced_bands: Optional[bool] = None,
                 balanced_batches: Optional[bool] = None):
        self.cfg = cfg
        self.op = op
        self.pp = pp
        self.scene = scene
        self.log = logger.info if logger else print
        self.rasterizer = pick_rasterizer(rasterizer)
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)
        self.wandb = wandb_run
        self.tb = tb_writer
        self._steps = {}
        # multi-chip: a jax.sharding.Mesh ("data" x "model") switches the
        # trainer onto the sharded step — anchors tensor-parallel over
        # "model" with tile-band rasterization, n_data cameras per step
        # (`parallel/step.py`; replaces the reference's single-GPU-only
        # driver `train.py:83-285` at N devices)
        self.mesh = mesh
        self.band_cap = band_cap
        # load-balanced band boundaries: cut the image's tile rows at
        # equal routed-record quantiles instead of uniformly. OPT-IN:
        # the r5 per-band step-TIME measurement (SCALING.json
        # band_time_skew) found production step time rows-bound, not
        # record-bound (t = c0 + c_row*rows + ~0*records — static caps
        # flatten binning cost and saturated tiles bound kernel work),
        # so the 1.5-1.8x routed-RECORD skew of street views converts
        # to only ~1.1x time skew, while balanced cuts make the tallest
        # band taller — a static-height cost every device pays. Uniform
        # bounds win time on saturated scenes; balancing helps only
        # record-bound (sparse, unsaturated) workloads.
        self.balanced_bands = (False if balanced_bands is None
                               else balanced_bands)
        # load-balanced data-parallel batches: fill each step's n_data
        # camera batch with views of similar estimated instance cost
        # (the synchronous step waits on the heaviest view — measured
        # 1.33x worst/mean on random street batches). Epoch coverage is
        # unchanged: the batch leader is still drawn by the reference
        # sampling rules; only the FILL picks are cost-nearest.
        self.balanced_batches = (mesh is not None if balanced_batches
                                 is None else balanced_batches)
        self._view_costs = {}
        self._cost_res_done = set()
        # "npz": host-gathered single-file capture (portable, resumable
        # on any topology). "sharded": orbax directory — every device
        # writes its own shards, no host gather; the city-scale format
        # (SURVEY §5 sharded pytree checkpoints).
        self.checkpoint_format = checkpoint_format
        if mesh is not None:
            from horizongs_tpu.parallel.step import shard_state
            n_model = mesh.shape["model"]
            C = int(scene.train_state.params.anchor.shape[0])
            if C % n_model:
                from horizongs_tpu.train.densify import pad_state_capacity
                C_new = -(-C // n_model) * n_model
                scene.train_state = pad_state_capacity(
                    scene.train_state, C_new)
                self.log(f"padded anchor capacity {C} -> {C_new} "
                         f"(divisible by model={n_model})")
            scene.train_state = shard_state(scene.train_state, mesh)
        # per-resolution capacity margins: one overflowing view at one
        # resolution must not recompile the step functions of the others.
        # Initial 1.15 (r5; was 1.25): capacity slack is priced at a
        # measured 3.55 ms/100k slots per step (ROOFLINE.json
        # capacity_cost) while an overflow costs one counted
        # recalibration recompile — at production step counts the
        # tighter margin wins by minutes, and the x1.5 widening schedule
        # still absorbs genuinely heavy unsampled views
        self._cap_margin = defaultdict(lambda: 1.15)
        # band-exchange capacity margin (sharded step only) — tracked
        # separately from the instance margin so an undersized band_cap
        # recalibrates the exchange, not the instance list
        self._band_margin = defaultdict(lambda: 1.25)
        self._margin_capped = set()
        # live prefilter flag: the reference flips it off for the last
        # `no_prefilter_step` iterations (`train.py:280-281`)
        self.add_prefilter = pp.add_prefilter
        # (first_iter, n_steps): capture a jax.profiler device trace of
        # n_steps training iterations into <model_path>/profile/
        # (the TPU analog of the reference's CUDA-event iter timing,
        # `train.py:96-97` — but a full XLA/TensorBoard trace)
        self.profile_steps = profile_steps
        self.state = scene.train_state
        self.active_sh_degree = 0 if cfg.max_sh_degree is not None else None
        if scene.stage == "fine":
            self.active_sh_degree = cfg.max_sh_degree
        self.viewer = None
        if viewer_port is not None:
            from horizongs_tpu.viewer.server import ViewerServer
            self.viewer = ViewerServer(port=viewer_port)
            self.log(f"viewer listening on :{self.viewer.bound_port}")

    def _host_state(self):
        """Replicated host view of the train state (identity when not
        sharded) — for densify epochs, checkpoints, vis and eval."""
        if self.mesh is None:
            return self.state
        from horizongs_tpu.parallel.step import unshard_state
        return unshard_state(self.state)

    def _capacity_block(self) -> int:
        """Densify repack block: keeps the padded capacity divisible by
        the mesh's "model" axis (anchor rows shard evenly)."""
        import math
        base = 4096
        if self.mesh is None:
            return base
        return math.lcm(base, self.mesh.shape["model"])

    def _place_state(self, host_state):
        """Host state -> training placement (shard onto the mesh when
        multi-chip; identity otherwise)."""
        if self.mesh is None:
            return host_state
        from horizongs_tpu.parallel.step import shard_state
        return shard_state(host_state, self.mesh)

    def restore(self, checkpoint_path: str) -> int:
        """Resume training state from a checkpoint — an orbax sharded
        directory (restored straight into the current, possibly sharded,
        placement: no host gather) or a single-file npz capture. Owns
        the capacity fix-up every mesh consumer needs: the restore comes
        back at the STORED capacity (resume after densify growth), which
        may no longer divide the mesh's "model" axis — re-pad so anchor
        rows shard evenly. Returns the checkpoint's iteration."""
        import os

        from horizongs_tpu.train.densify import pad_state_capacity
        n_model = self.mesh.shape["model"] if self.mesh is not None else 1
        if os.path.isdir(checkpoint_path):
            from horizongs_tpu.io.checkpoints import load_sharded_checkpoint
            self.state, ckpt_it = load_sharded_checkpoint(
                checkpoint_path, self.state)
            C = int(self.state.params.anchor.shape[0])
            if C % n_model:
                host = pad_state_capacity(self._host_state(),
                                          -(-C // n_model) * n_model)
                self.state = self._place_state(host)
                self.log(f"re-padded restored capacity {C} -> "
                         f"{int(self.state.params.anchor.shape[0])} "
                         f"(divisible by model={n_model})")
        else:
            from horizongs_tpu.io.checkpoints import load_train_checkpoint
            host, ckpt_it = load_train_checkpoint(
                checkpoint_path, self._host_state())
            C = int(host.params.anchor.shape[0])
            if C % n_model:
                host = pad_state_capacity(host, -(-C // n_model) * n_model)
            self.state = self._place_state(host)
        return ckpt_it

    def _calib_views(self, H, W, samples: int = 6):
        """Evenly-strided sample of train views at this resolution."""
        cams = [c for c in self.scene.get_train_cameras()
                if (c.height, c.width) == (H, W)]
        return cams[:: max(len(cams) // samples, 1)][:samples]

    def _calib_host_inputs(self):
        """(mlps, anchor_state) on the host for capacity calibration —
        ONE device->host gather, shared by all calibrators of a step
        build (at city scale `unshard_state` is a multi-GB transfer;
        `_step_fn` passes this to each `_calibrate_*` so a rebuild pays
        it once, not three times)."""
        from horizongs_tpu.train.optim import mlps_from_params
        st = self._host_state()
        return mlps_from_params(st.params), st.anchor_state()

    def _calibrate_cap(self, H, W, samples: int = 6, host=None):
        """Calibrated tile-instance capacity for (H, W): max measured
        count over sample train views x margin, rounded to a geometric
        bucket (gsplat sizes its instance list exactly per frame; this
        is the static-shape analog — the binning/routing stages scale
        with the capacity, so the worst-case default wastes ~30%)."""
        if self.rasterizer not in ("pallas", "pallas_interpret", "tiled"):
            return None
        from horizongs_tpu.ops.raster_pallas import suggest_instance_cap
        from horizongs_tpu.render import count_render_instances
        cams = self._calib_views(H, W, samples)
        if not cams:
            return None
        mlps, astate = host if host is not None else \
            self._calib_host_inputs()
        # count with the backend's OWN tile shape (scan tiles are 16x16,
        # Pallas 32x32 — a pallas-tile count under-sizes the scan cap 4x)
        backend = ("pallas" if self.rasterizer in
                   ("pallas", "pallas_interpret") else "scan")
        n = max(int(count_render_instances(
                c, self.cfg, mlps, astate,
                add_prefilter=self.add_prefilter,
                backend=backend)) for c in cams)
        if self.mesh is not None and self.mesh.shape["model"] > 1:
            # band-sharded step: each device bins only its own band —
            # ~1/n_model of the full-image instances (margin + counted
            # overflow recalibration absorb band imbalance)
            n = -(-n // self.mesh.shape["model"])
        return suggest_instance_cap(n, margin=self._cap_margin[(H, W)])

    def _calibrate_band_bounds(self, H, W, samples: int = 6, host=None):
        """Load-balanced band boundaries for (H, W): per-tile-row
        routed-record loads summed over sample train views, cut at equal
        quantiles (`suggest_band_bounds`). None = uniform."""
        if (not self.balanced_bands or self.mesh is None
                or self.mesh.shape["model"] == 1):
            return None
        from horizongs_tpu.parallel.step import (
            _rasterizer_backend, count_view_row_loads)
        from horizongs_tpu.parallel.tile_exchange import \
            suggest_band_bounds
        cams = self._calib_views(H, W, samples)
        if not cams:
            return None
        mlps, astate = host if host is not None else \
            self._calib_host_inputs()
        backend = _rasterizer_backend(
            "tiled" if self.rasterizer == "dense" else self.rasterizer)
        loads = sum(np.asarray(count_view_row_loads(
            c, self.cfg, mlps, astate, backend=backend,
            add_prefilter=self.add_prefilter)) for c in cams)
        bounds = suggest_band_bounds(loads, self.mesh.shape["model"])
        self.log(f"balanced band bounds for {W}x{H}: {bounds} "
                 f"(tile rows)")
        return bounds

    def _calibrate_band_cap(self, H, W, samples: int = 6,
                            band_bounds=None, host=None):
        """Calibrated per-(src shard, dst band) record capacity for the
        sharded step's band exchange: max measured routing over sample
        train views x margin, geometric bucket (`suggest_band_cap`).
        This is what makes the exchange recv buffer (n_model * cap rows)
        scale ~1/n_model instead of full-scene-sized (the uncalibrated
        default). An explicit `--band_cap` short-circuits it."""
        if self.mesh is None or self.mesh.shape["model"] == 1:
            return None
        if self.band_cap is not None:
            return self.band_cap
        from horizongs_tpu.parallel.step import (
            _rasterizer_backend, count_band_records)
        from horizongs_tpu.parallel.tile_exchange import suggest_band_cap
        cams = self._calib_views(H, W, samples)
        if not cams:
            return None
        mlps, astate = host if host is not None else \
            self._calib_host_inputs()
        backend = _rasterizer_backend(
            "tiled" if self.rasterizer == "dense" else self.rasterizer)
        n = max(int(count_band_records(
                c, self.cfg, mlps, astate, self.mesh.shape["model"],
                backend=backend, add_prefilter=self.add_prefilter,
                band_bounds=band_bounds))
                for c in cams)
        return suggest_band_cap(n, margin=self._band_margin[(H, W)])

    def _handle_overflow(self, res, d_inst: int, d_exch: int,
                         it: int) -> bool:
        """A calibrated capacity overflowed (anchors grew/moved): widen
        THE MATCHING margin for this resolution and rebuild only its step
        functions — overflow is counted, never silent, and an undersized
        band_cap recalibrates the exchange rather than looping on the
        instance list. Margin growth is CAPPED by `MARGIN_CEIL` (the
        1.5x-per-overflow schedule stops at 9.49, 7.6x initial):
        without a ceiling a pathological view ratchets capacity 1.5x per
        overflow straight past HBM; at the ceiling the step is kept
        (overflow records keep being trimmed + counted) instead of
        wedging on recompiles. Returns whether a rebuild was triggered."""
        widened = False
        if d_inst > 0:
            if self._cap_margin[res] * 1.5 <= self.MARGIN_CEIL:
                self._cap_margin[res] *= 1.5
                widened = True
                self.log(f"[it {it}] {d_inst} tile instances dropped — "
                         f"recalibrating instance capacity for "
                         f"{res[1]}x{res[0]} "
                         f"(margin {self._cap_margin[res]:.2f})")
            elif res not in self._margin_capped:
                self._margin_capped.add(res)
                self.log(f"[it {it}] instance-capacity margin for "
                         f"{res[1]}x{res[0]} ceiling (margin "
                         f"{self._cap_margin[res]:.2f}) — keeping the "
                         f"step; overflow records will be trimmed "
                         f"(counted, not silent)")
        if d_exch > 0:
            if self.band_cap is not None:
                self.log(f"[it {it}] explicit --band_cap {self.band_cap} "
                         f"overflowed — switching to measured calibration")
                self.band_cap = None
            if self._band_margin[res] * 1.5 <= self.MARGIN_CEIL:
                self._band_margin[res] *= 1.5
                widened = True
                self.log(f"[it {it}] {d_exch} band-exchange records "
                         f"dropped — recalibrating band capacity for "
                         f"{res[1]}x{res[0]} "
                         f"(margin {self._band_margin[res]:.2f})")
            elif ("band", res) not in self._margin_capped:
                self._margin_capped.add(("band", res))
                self.log(f"[it {it}] band-capacity margin for "
                         f"{res[1]}x{res[0]} ceiling (margin "
                         f"{self._band_margin[res]:.2f}) — keeping the "
                         f"step; overflow records will be trimmed "
                         f"(counted, not silent)")
        if widened:
            for k in [k for k in self._steps if k[:2] == res]:
                del self._steps[k]
        return widened

    def _step_fn(self, H, W):
        key = (H, W, self.state.params.anchor.shape[0],
               self.active_sh_degree, self.add_prefilter)
        if key not in self._steps:
            host = self._calib_host_inputs()
            cap = self._calibrate_cap(H, W, host=host)
            if cap is not None:
                self.log(f"instance capacity for {W}x{H}: {cap}")
            if self.mesh is None:
                self._steps[key] = build_train_step(
                    self.cfg, self.op, H, W,
                    spatial_lr_scale=self.scene.cameras_extent,
                    frozen_mlps=self.scene.frozen_mlps,
                    add_prefilter=self.add_prefilter,
                    rasterizer=self.rasterizer,
                    active_sh_degree=self.active_sh_degree,
                    background=self.scene.background,
                    frozen_appearance=getattr(self.scene,
                                              "frozen_appearance", False),
                    instance_cap=cap)
            else:
                from horizongs_tpu.parallel.step import (
                    build_sharded_train_step)
                # the sharded step composites via the field-level API —
                # the dense oracle has no record boundary to exchange
                rast = ("tiled" if self.rasterizer == "dense"
                        else self.rasterizer)
                band_bounds = self._calibrate_band_bounds(H, W, host=host)
                band_cap = self._calibrate_band_cap(
                    H, W, band_bounds=band_bounds, host=host)
                if band_cap is not None:
                    self.log(f"band-exchange capacity for {W}x{H}: "
                             f"{band_cap}")
                self._steps[key] = build_sharded_train_step(
                    self.cfg, self.op, self.mesh, H, W,
                    spatial_lr_scale=self.scene.cameras_extent,
                    frozen_mlps=self.scene.frozen_mlps,
                    frozen_appearance=getattr(self.scene,
                                              "frozen_appearance", False),
                    add_prefilter=self.add_prefilter,
                    rasterizer=rast,
                    active_sh_degree=self.active_sh_degree,
                    background=self.scene.background,
                    instance_cap=cap, shard_tiles=True,
                    band_cap=band_cap, band_bounds=band_bounds)
        return self._steps[key]

    def _ensure_view_costs(self, H, W):
        """Estimated tile-instance count per train view at (H, W) — the
        DP-dealing key (`_pick_batch`). One host gather + one jitted
        count per view, ONCE per resolution: the absolute counts drift
        as anchors grow, but dealing only needs the views' relative
        ordering, which is a property of the camera poses."""
        if (H, W) in self._cost_res_done:
            return
        self._cost_res_done.add((H, W))
        if self.rasterizer not in ("pallas", "pallas_interpret", "tiled"):
            return
        from horizongs_tpu.render import count_render_instances
        mlps, astate = self._calib_host_inputs()
        backend = ("pallas" if self.rasterizer in
                   ("pallas", "pallas_interpret") else "scan")
        for c in self.scene.get_train_cameras():
            if (c.height, c.width) == (H, W) \
                    and int(c.uid) not in self._view_costs:
                self._view_costs[int(c.uid)] = int(count_render_instances(
                    c, self.cfg, mlps, astate,
                    add_prefilter=self.add_prefilter, backend=backend))

    def _pick_camera(self, stacks, cost_hint=None):
        pp = self.pp
        if pp.camera_balance:
            if not stacks["aerial"]:
                stacks["aerial"] = [c for c in self.scene.get_train_cameras()
                                    if c.image_type == "aerial"]
            if not stacks["street"]:
                stacks["street"] = [c for c in self.scene.get_train_cameras()
                                    if c.image_type == "street"]
            a, s = pp.camera_proportion.split("-")
            have_a, have_s = bool(stacks["aerial"]), bool(stacks["street"])
            r = float(a) / (float(a) + float(s))
            if have_a and (not have_s or self.np_rng.random() < r):
                stack = stacks["aerial"]
            else:
                stack = stacks["street"]
        else:
            if not stacks["all"]:
                stacks["all"] = list(self.scene.get_train_cameras())
            stack = stacks["all"]
        if cost_hint is not None:
            # cost-nearest fill pick (balanced DP batches): still a
            # without-replacement pop, so epoch coverage is unchanged
            i = min(range(len(stack)), key=lambda j: abs(
                self._view_costs.get(int(stack[j].uid), cost_hint)
                - cost_hint))
            return stack.pop(i)
        return stack.pop(self.rng.randint(0, len(stack) - 1))

    def _pick_batch(self, stacks, n: int):
        """n same-resolution cameras for one data-parallel step, with a
        per-camera loss weight. Sampling rules (aerial/street proportion)
        are per camera; cameras of other resolutions drawn along the way
        go back to their stacks. With `balanced_batches` (default under
        a mesh) the n-1 fill picks are cost-NEAREST to the leader's
        estimated instance count instead of random: the synchronous DP
        step waits on the heaviest view, and random batches of street
        views measure 1.33x worst/mean instance skew (SCALING.json).
        If the dataset can't fill the batch at this resolution, existing
        picks repeat with weight 1/k so a view duplicated k times still
        weighs once in the mean gradient (logged once)."""
        cams = [self._pick_camera(stacks)]
        H, W = cams[0].height, cams[0].width
        hint = None
        if self.balanced_batches and n > 1:
            self._ensure_view_costs(H, W)
            hint = self._view_costs.get(int(cams[0].uid))
        putback, tries = [], 0
        while len(cams) < n and tries < 8 * n:
            c = self._pick_camera(stacks, cost_hint=hint)
            tries += 1
            if (c.height, c.width) == (H, W):
                cams.append(c)
            else:
                putback.append(c)
        for c in putback:
            key = (c.image_type if self.pp.camera_balance else "all")
            stacks[key].append(c)
        weights = [1.0] * n
        if len(cams) < n:
            if not getattr(self, "_warned_batch_fill", False):
                self.log(f"only {len(cams)} cameras at {W}x{H} — "
                         f"repeating views (downweighted 1/k) to fill "
                         f"the {n}-camera batch")
                self._warned_batch_fill = True
            k = len(cams)
            cams = [cams[i % k] for i in range(n)]
            counts = [sum(1 for j in range(n) if j % k == i % k)
                      for i in range(n)]
            weights = [1.0 / c for c in counts]
        return cams, weights

    def _dump_vis(self, cam, it: int) -> None:
        """Side-by-side gt | render (| depth | normals) grid."""
        from horizongs_tpu.render import render as render_fn
        from horizongs_tpu.train.evaluate import save_image
        from horizongs_tpu.train.optim import mlps_from_params
        from horizongs_tpu.utils.viz import image_grid, vis_depth, vis_normal
        st = self._host_state()
        pkg = render_fn(cam, self.cfg, mlps_from_params(st.params),
                        st.anchor_state(), self.scene.background,
                        add_prefilter=self.add_prefilter,
                        active_sh_degree=self.active_sh_degree,
                        rasterizer=self.rasterizer)
        panels = [np.asarray(cam.image), np.asarray(pkg["render"])]
        if pkg.get("render_depth") is not None:
            panels.append(vis_depth(np.asarray(pkg["render_depth"])[..., 0]))
        if pkg.get("render_normals") is not None:
            panels.append(vis_normal(np.asarray(pkg["render_normals"])))
        out_dir = os.path.join(self.scene.model_path, "vis")
        os.makedirs(out_dir, exist_ok=True)
        save_image(os.path.join(out_dir, f"iter_{it:06d}.png"),
                   image_grid(panels, cols=2))

    def _viewer_render(self, cam_d: dict) -> np.ndarray:
        """Render callback for the in-train viewer poll."""
        import jax.numpy as jnp
        from horizongs_tpu.core.cameras import Camera
        from horizongs_tpu.render import render as render_fn
        from horizongs_tpu.train.optim import mlps_from_params
        cam = Camera(viewmat=jnp.asarray(cam_d["viewmat"]),
                     K=jnp.asarray(cam_d["K"]),
                     width=cam_d["width"], height=cam_d["height"],
                     cam_center=jnp.asarray(
                         np.linalg.inv(cam_d["viewmat"])[:3, 3]))
        st = self._host_state()
        pkg = render_fn(cam, self.cfg, mlps_from_params(st.params),
                        st.anchor_state(), self.scene.background,
                        add_prefilter=self.add_prefilter,
                        active_sh_degree=self.active_sh_degree,
                        rasterizer=self.rasterizer,
                        scaling_modifier=cam_d.get("scaling_modifier", 1.0))
        return np.asarray(pkg["render"])

    def _report(self, it: int, max_views: int = 5) -> dict:
        """In-train milestone evaluation (`training_report`,
        `train.py:309-383`): L1/PSNR over a sample of test cameras and
        every-5th train camera, logged and returned."""
        from horizongs_tpu.render import render as render_fn
        from horizongs_tpu.train.losses import l1_loss, psnr
        from horizongs_tpu.train.optim import mlps_from_params
        host = self._host_state()
        mlps = mlps_from_params(host.params)
        results = {}
        test = self.scene.get_test_cameras()[:max_views]
        train = self.scene.get_train_cameras()[::5][:max_views]
        for name, cams in (("test", test), ("train", train)):
            if not cams:
                continue
            l1s, psnrs = [], []
            for vi, cam in enumerate(cams):
                pkg = render_fn(cam, self.cfg, mlps,
                                host.anchor_state(),
                                self.scene.background,
                                add_prefilter=self.add_prefilter,
                                active_sh_degree=self.active_sh_degree,
                                rasterizer=self.rasterizer)
                img = jnp.clip(pkg["render"], 0.0, 1.0)
                gt = cam.image
                l1s.append(float(l1_loss(img, gt)))
                psnrs.append(float(psnr(img, gt)))
                # render/gt images at milestones (`train.py:348-359`)
                if vi < 3:
                    chw = np.transpose(np.asarray(img), (2, 0, 1))
                    gt_chw = np.transpose(np.asarray(gt), (2, 0, 1))
                    if self.tb is not None:
                        self.tb.add_image(
                            f"{name}_view_{int(cam.uid)}/render", chw, it)
                        self.tb.add_image(
                            f"{name}_view_{int(cam.uid)}/ground_truth",
                            gt_chw, it)
                    if self.wandb is not None:
                        try:
                            import wandb as _wandb
                            self.wandb.log(
                                {f"{name}_view_{int(cam.uid)}/render":
                                 _wandb.Image(np.asarray(img))}, step=it)
                        except Exception:
                            pass
            results[name] = {"l1": float(np.mean(l1s)),
                             "psnr": float(np.mean(psnrs))}
            self.log(f"[ITER {it}] Evaluating {name}: "
                     f"L1 {results[name]['l1']:.4f} "
                     f"PSNR {results[name]['psnr']:.2f}")
            if self.wandb is not None:
                self.wandb.log({f"{name}_l1": results[name]["l1"],
                                f"{name}_psnr": results[name]["psnr"]},
                               step=it)
            if self.tb is not None:
                self.tb.add_scalar(f"{name}/l1", results[name]["l1"], it)
                self.tb.add_scalar(f"{name}/psnr", results[name]["psnr"], it)
        return results

    def train(self, iterations: Optional[int] = None,
              save_iterations=(), checkpoint_iterations=(),
              test_iterations=(),
              first_iter: int = 1, progress_every: int = 50):
        op, pp, cfg = self.op, self.pp, self.cfg
        iterations = iterations or op.iterations
        stacks = defaultdict(list)
        ema_loss = 0.0
        densify_cnt = 0
        densify_epochs = 0
        history = []
        t_start = time.time()

        for it in range(first_iter, iterations + 1):
            if self.viewer is not None:
                self.viewer.poll(self._viewer_render, self.scene.model_path)

            # drop the frustum prefilter for the last no_prefilter_step
            # iterations (`train.py:280-281`: `iteration >= iterations -
            # no_prefilter_step` flips pipe.add_prefilter off)
            n_noprefilter = int(getattr(pp, "no_prefilter_step", 0) or 0)
            if (self.add_prefilter and n_noprefilter > 0
                    and it >= iterations - n_noprefilter):
                self.add_prefilter = False
                self.log(f"[it {it}] prefilter disabled for the final "
                         f"{n_noprefilter} iterations")

            # SH degree progression (`update_learning_rate`, every 1000)
            if (self.active_sh_degree is not None and it % 1000 == 0
                    and self.scene.stage != "fine"
                    and self.active_sh_degree < cfg.max_sh_degree):
                self.active_sh_degree += 1

            if self.profile_steps is not None:
                p0, pn = self.profile_steps
                if it == p0:
                    trace_dir = os.path.join(self.scene.model_path,
                                             "profile")
                    self.log(f"profiler trace start -> {trace_dir}")
                    jax.profiler.start_trace(trace_dir)
                elif it == p0 + pn:
                    jax.block_until_ready(self.state.params.anchor)
                    jax.profiler.stop_trace()
                    self.log("profiler trace stopped")

            in_stat_window = op.start_stat < it < op.update_until

            def _gate(c):
                return in_stat_window and (
                    (c.image_type == "aerial" and pp.aerial_densify)
                    or (c.image_type == "street" and pp.street_densify))

            if self.mesh is None:
                cam = self._pick_camera(stacks)
                do_stats = _gate(cam)
                ct = camera_tensors(cam, do_stats=do_stats)
                n_stat_views = int(do_stats)
            else:
                cams, wts = self._pick_batch(stacks, self.mesh.shape["data"])
                cam = cams[0]
                cts = [camera_tensors(c, do_stats=_gate(c), loss_weight=w)
                       for c, w in zip(cams, wts)]
                ct = jax.tree.map(lambda *xs: jnp.stack(xs), *cts)
                n_stat_views = sum(_gate(c) for c in cams)
            step = self._step_fn(cam.height, cam.width)
            self.state, metrics = step(self.state, ct, it)
            densify_cnt += n_stat_views

            loss = float(metrics["loss"])
            d_inst = int(metrics.get("n_dropped_instances",
                                     metrics.get("n_dropped", 0)))
            d_exch = int(metrics.get("n_dropped_exchange", 0))
            if d_inst > 0 or d_exch > 0:
                self._handle_overflow((cam.height, cam.width),
                                      d_inst, d_exch, it)
            ema_loss = 0.4 * loss + 0.6 * ema_loss if it > first_iter else loss
            history.append(loss)
            if it % progress_every == 0 or it == iterations:
                self.log(f"[it {it:6d}] loss={ema_loss:.5f} "
                         f"psnr={float(metrics['psnr']):.2f} "
                         f"anchors={int(self.state.n)} "
                         f"({(time.time() - t_start):.0f}s)")
                if self.wandb is not None:
                    self.wandb.log({"train_total_loss": loss,
                                    "psnr": float(metrics["psnr"]),
                                    "anchors": int(self.state.n)}, step=it)
                if self.tb is not None:
                    # reference tensorboard scalars (`train.py:309-316`)
                    self.tb.add_scalar("train/total_loss", loss, it)
                    self.tb.add_scalar("train/psnr",
                                       float(metrics["psnr"]), it)
                    self.tb.add_scalar("train/anchors",
                                       int(self.state.n), it)
                    self.tb.add_scalar(
                        "train/iter_time",
                        (time.time() - t_start) / max(it - first_iter + 1, 1),
                        it)

            # densification epochs (`train.py:256-273`). The trigger
            # matches the reference exactly: densify_cnt counts only
            # stat-accumulating views (`train.py:260-264` — NOT raw
            # iterations; n_data views per step when sharded), so with
            # aerial_densify only and a 2-1 camera proportion an epoch
            # fires every ~1.5 * update_interval iterations, same as
            # upstream. One deliberate deviation: the reference re-fires
            # every subsequent non-stat iteration while densify_cnt sits
            # on a multiple; we fire exactly once per interval crossing.
            if in_stat_window:
                if (op.densification and it > op.update_from
                        and densify_cnt // op.update_interval
                        > densify_epochs):
                    densify_epochs = densify_cnt // op.update_interval
                    # run_densify works directly on the (sharded) device
                    # state: only decision arrays and candidate rows
                    # cross the host boundary; the big tables repack on
                    # device (no _host_state gather — at city scale the
                    # full round-trip cost minutes per epoch)
                    st = self.state
                    if self.scene.base is not None:
                        st = roll_back(st, self.scene.base, cfg)
                    st = run_densify(
                        cfg, op, st, it, stage=self.scene.stage,
                        rng=self.np_rng, cam_infos=self.scene.cam_infos,
                        weed_ratio=self.scene.weed_ratio,
                        capacity_block=self._capacity_block())
                    self.state = self._place_state(st)
            elif it == op.update_until:
                st = self._host_state()
                if self.scene.base is not None:
                    st = roll_back(st, self.scene.base, cfg)
                self.state = self._place_state(clean_stats(st, cfg))

            # periodic train-view vis grid (`train.py:230-254`)
            vis_step = int(getattr(pp, "vis_step", 0) or 0)
            if vis_step > 0 and it % vis_step == 0:
                try:
                    self._dump_vis(cam, it)
                except Exception as e:  # vis must never kill training
                    self.log(f"vis dump failed: {e}")

            if it in test_iterations:
                self._report(it)
            if it in save_iterations:
                self.log(f"[ITER {it}] Saving Gaussians")
                self.scene.save(it, self._host_state())
            if it in checkpoint_iterations:
                self.log(f"[ITER {it}] Saving Checkpoint")
                if self.checkpoint_format == "sharded":
                    from horizongs_tpu.io.checkpoints import (
                        save_sharded_checkpoint)
                    save_sharded_checkpoint(
                        os.path.join(self.scene.model_path,
                                     f"chkpnt{it}_sharded"),
                        self.state, it)
                else:
                    save_train_checkpoint(
                        os.path.join(self.scene.model_path,
                                     f"chkpnt{it}.npz"),
                        self._host_state(), it)

        return history
