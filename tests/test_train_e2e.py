"""End-to-end tiny training: the train step optimizes a scaffold model to
fit target renders, and densification keeps state consistent."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.config import make_optim
from horizongs_tpu.data.synthetic import lookat_camera, orbit_cameras, random_gaussians
from horizongs_tpu.models import ModelConfig, init_mlps, init_anchor_state_from_points
from horizongs_tpu.ops.reference import render_dense_3dgs
from horizongs_tpu.train.optim import TrainableParams, init_adam
from horizongs_tpu.train.step import (
    TrainState, build_train_step, camera_tensors, init_stats)
from horizongs_tpu.train.densify import run_densify, clean_stats


W = H = 48


def _make_targets(n_cams=4, seed=0):
    """Ground-truth images: renders of a known gaussian cloud."""
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(40, seed=seed, extent=0.7,
                          scale_range=(0.08, 0.2)).items()}
    cams = orbit_cameras(n_cams, radius=3.5, height_z=-1.0, width=W, height=H)
    bg = jnp.zeros(3)
    out = []
    rfn = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, W, H, bg))
    for cam in cams:
        render, alphas, _ = rfn(cam.viewmat, cam.K)
        out.append(cam._replace(image=render,
                                alpha_mask=jnp.ones((H, W, 1))))
    return out, g


def _init_train_state(cfg, points, seed=0, capacity=None):
    state = init_anchor_state_from_points(cfg, points, capacity=capacity)
    key = jax.random.PRNGKey(seed)
    mlps = init_mlps(key, cfg.feat_dim, cfg.view_dim, cfg.appearance_dim,
                     cfg.n_offsets, cfg.color_dim, num_cameras=8)
    params = TrainableParams(
        anchor=state.anchor, offset=state.offset, feat=state.feat,
        scaling_log=state.scaling_log, mlp_opacity=mlps.opacity,
        mlp_cov=mlps.cov, mlp_color=mlps.color, appearance=mlps.appearance)
    return TrainState(params=params, rotation=state.rotation,
                      level=state.level, extra_level=state.extra_level,
                      n=state.n, opt=init_adam(params),
                      stats=init_stats(state.capacity, cfg.n_offsets))


def test_training_reduces_loss():
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _make_targets()
    opt = make_optim(iterations=2000, lambda_dreg=0.0, lambda_sky_opa=0.0,
                     lambda_opacity_entropy=0.0, start_stat=0,
                     feature_lr=0.03, mlp_color_lr_init=0.02,
                     mlp_opacity_lr_init=0.01)
    pts = np.asarray(g["means"])  # init anchors near ground truth
    ts = _init_train_state(cfg, pts, capacity=256)

    step = build_train_step(cfg, opt, H, W, spatial_lr_scale=1.0,
                            add_prefilter=False)
    cam_ts = [camera_tensors(c, do_stats=True) for c in cams]

    losses = []
    for it in range(1, 121):
        ts, metrics = step(ts, cam_ts[it % len(cam_ts)], it)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:8])
    last = np.mean(losses[-8:])
    assert last < first * 0.7, f"loss did not decrease: {first} -> {last}"
    # stats accumulated
    assert float(jnp.sum(ts.stats.anchor_demon)) > 0
    assert float(jnp.sum(ts.stats.offset_denom)) > 0


def test_densify_grow_and_prune_consistency():
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1, update_depth=2, update_init_factor=4,
                      update_hierachy_factor=4)
    cams, g = _make_targets()
    opt = make_optim(update_interval=10, success_threshold=0.1,
                     densify_grad_threshold=1e-6, min_opacity=0.005,
                     start_stat=0)
    ts = _init_train_state(cfg, np.asarray(g["means"]), capacity=256)
    step = build_train_step(cfg, opt, H, W, add_prefilter=False)
    cam_ts = [camera_tensors(c, do_stats=True) for c in cams]
    for it in range(1, 21):
        ts, _ = step(ts, cam_ts[it % len(cam_ts)], it)
    n_before = int(ts.n)
    ts2 = run_densify(cfg, opt, ts, 20, stage="coarse",
                      rng=np.random.default_rng(0))
    n_after = int(ts2.n)
    C = ts2.params.anchor.shape[0]
    assert n_after > 0
    assert C >= n_after
    # tables remain finite, padding rows zeroed
    for leaf in (ts2.params.anchor, ts2.params.offset, ts2.params.feat,
                 ts2.params.scaling_log):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.allclose(np.asarray(ts2.params.anchor[n_after:]), 0.0)
    # stats shapes track capacity
    assert ts2.stats.anchor_demon.shape[0] == C
    assert ts2.stats.offset_denom.shape[0] == C * cfg.n_offsets
    # grown with threshold ~0 and plenty of grads: expect growth
    assert n_after >= n_before
    # training continues fine after surgery
    for it in range(21, 26):
        ts2, m = step(ts2, cam_ts[it % len(cam_ts)], it)
    assert np.isfinite(float(m["loss"]))


def test_densify_lod_stage_restrictions():
    cfg = ModelConfig(name="GaussianLoDModel", feat_dim=8, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.3, fork=2, aerial_levels=2,
                      street_levels=4, standard_dist=8.0)
    cams, g = _make_targets()
    opt = make_optim(update_interval=10, success_threshold=0.1,
                     densify_grad_threshold=1e-6, min_opacity=2.0,
                     start_stat=0, pruning_type="max")
    ts = _init_train_state(cfg, np.asarray(g["means"]), capacity=1024)
    step = build_train_step(cfg, opt, H, W, add_prefilter=False)
    cam_ts = [camera_tensors(c, do_stats=True) for c in cams]
    for it in range(1, 16):
        ts, _ = step(ts, cam_ts[it % len(cam_ts)], it)
    levels_before = np.asarray(ts.level)[:int(ts.n)]
    # coarse stage with absurd min_opacity: prunes only aerial levels
    ts2 = run_densify(cfg, opt, ts, 15, stage="coarse")
    levels_after = np.asarray(ts2.level)[:int(ts2.n)]
    # street-level anchors (>= aerial_levels) never pruned in coarse stage
    n_street_before = (levels_before >= cfg.aerial_levels).sum()
    n_street_after = (levels_after >= cfg.aerial_levels).sum()
    assert n_street_after >= n_street_before


def test_clean_stats():
    cfg = ModelConfig(name="GaussianModel", feat_dim=8, n_offsets=4,
                      view_dim=0, color_attr="RGB", voxel_size=0.1)
    cams, g = _make_targets()
    ts = _init_train_state(cfg, np.asarray(g["means"]), capacity=256)
    ts = ts._replace(stats=ts.stats._replace(
        anchor_demon=ts.stats.anchor_demon + 5))
    ts2 = clean_stats(ts, cfg)
    assert float(jnp.sum(ts2.stats.anchor_demon)) == 0.0


def test_overflow_margin_ceiling():
    """The recalibration margins are bounded: a pathological view that
    overflows every step must not ratchet capacity (1.5x per overflow)
    past HBM — at 8x the initial margin the trainer keeps the compiled
    step and relies on counted overflow trimming."""
    from collections import defaultdict
    from horizongs_tpu.train.trainer import Trainer

    t = object.__new__(Trainer)   # margin logic only — no Scene needed
    t._cap_margin = defaultdict(lambda: 1.25)
    t._band_margin = defaultdict(lambda: 1.25)
    t._margin_capped = set()
    t._steps = {(32, 32, 256, None, True): "step"}
    t.band_cap = 64
    t.log = lambda *a, **k: None
    res = (32, 32)
    rebuilds = 0
    for i in range(50):
        if t._handle_overflow(res, d_inst=100, d_exch=100, it=i):
            rebuilds += 1
    assert t._cap_margin[res] <= Trainer.MARGIN_CEIL
    assert t._band_margin[res] <= Trainer.MARGIN_CEIL
    assert rebuilds <= 6          # log1.5(8) ~ 5.1 widenings per margin
    assert t.band_cap is None     # explicit cap demoted to calibration
    # once capped: no rebuild, the step function survives
    t._steps[(32, 32, 256, None, True)] = "step"
    assert not t._handle_overflow(res, 100, 100, 99)
    assert (32, 32, 256, None, True) in t._steps


def test_balanced_dp_batches():
    """Cost-balanced DP batches (default under a mesh): the batch
    leader is drawn by the normal sampling rules, the fill picks are
    cost-NEAREST — with views designed in near-equal-cost pairs, every
    2-view batch must be one of those pairs (worst/mean ~1.0 instead of
    the measured 1.33 of random street batches), while epoch coverage
    (each view once per epoch) is unchanged."""
    import random
    from collections import defaultdict
    from types import SimpleNamespace
    from horizongs_tpu.data.synthetic import orbit_cameras
    from horizongs_tpu.train.trainer import Trainer

    cams = [c._replace(uid=i) for i, c in enumerate(
        orbit_cameras(8, width=W, height=H))]
    costs = {0: 100, 1: 1000, 2: 30, 3: 500, 4: 105, 5: 510, 6: 32,
             7: 1010}
    pairs = [{100, 105}, {500, 510}, {1000, 1010}, {30, 32}]

    t = object.__new__(Trainer)   # sampling logic only — no Scene
    t.pp = SimpleNamespace(camera_balance=False)
    t.scene = SimpleNamespace(get_train_cameras=lambda: list(cams))
    t.rng = random.Random(0)
    t.balanced_batches = True
    t._view_costs = dict(costs)
    t._cost_res_done = {(H, W)}   # pre-filled: skip the jitted counts
    t.log = lambda *a, **k: None

    stacks = defaultdict(list)
    seen = []
    for _ in range(4):            # one epoch of 2-view batches
        batch, wts = t._pick_batch(stacks, 2)
        assert wts == [1.0, 1.0]
        got = {costs[int(c.uid)] for c in batch}
        assert got in pairs, got
        seen += [int(c.uid) for c in batch]
    assert sorted(seen) == list(range(8))   # full epoch coverage

    # disabled -> random fill (no pairing guarantee needed; just check
    # the path doesn't consult the cost cache)
    t.balanced_batches = False
    t._view_costs = {}
    stacks = defaultdict(list)
    batch, _ = t._pick_batch(stacks, 2)
    assert len(batch) == 2
