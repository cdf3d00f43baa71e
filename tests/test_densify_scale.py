"""Scale-sensitive densify helpers: row dedup and camera-weed-out must be
vectorized (the reference does both on GPU: `basic_model.py:179-190`,
`lod_model.py:236-249`) — a Python-set / per-camera loop would dominate
the densify epoch at city scale."""
import math
import time

import numpy as np

from horizongs_tpu.models import ModelConfig
from horizongs_tpu.models.anchors import weed_out_mask
from horizongs_tpu.train.densify import _dedup_against


def _dedup_reference(existing, candidates):
    ex = {tuple(r) for r in existing.tolist()}
    return np.fromiter((tuple(r) in ex for r in candidates.tolist()),
                       dtype=bool, count=candidates.shape[0])


def test_dedup_matches_set_semantics():
    rng = np.random.default_rng(0)
    existing = rng.integers(-50, 50, size=(500, 3)).astype(np.int64)
    candidates = rng.integers(-50, 50, size=(800, 3)).astype(np.int64)
    np.testing.assert_array_equal(
        _dedup_against(existing, candidates),
        _dedup_reference(existing, candidates))
    # empties
    assert _dedup_against(existing[:0], candidates).sum() == 0
    assert _dedup_against(existing, candidates[:0]).shape == (0,)
    # negative coords and exact duplicates
    ex = np.array([[-1, -2, -3], [0, 0, 0]], dtype=np.int64)
    cand = np.array([[-1, -2, -3], [1, 2, 3], [0, 0, 0]], dtype=np.int64)
    np.testing.assert_array_equal(_dedup_against(ex, cand),
                                  [True, False, True])


def test_dedup_fast_at_city_scale():
    """1M existing anchors x 200k candidates in seconds, not minutes."""
    rng = np.random.default_rng(1)
    existing = rng.integers(0, 400, size=(1_000_000, 3)).astype(np.int64)
    candidates = rng.integers(0, 400, size=(200_000, 3)).astype(np.int64)
    t0 = time.time()
    mask = _dedup_against(existing, candidates)
    dt = time.time() - t0
    assert dt < 5.0, f"dedup took {dt:.1f}s at 1M anchors"
    # spot-check correctness on a sample against the set oracle
    idx = rng.choice(len(candidates), 300, replace=False)
    np.testing.assert_array_equal(
        mask[idx], _dedup_reference(existing, candidates[idx]))


def _weed_reference(cfg, positions, levels, cam_infos, weed_ratio):
    """The original per-camera loop (pre-vectorization oracle)."""
    count = np.zeros(positions.shape[0], dtype=np.int64)
    logfork = math.log2(cfg.fork)
    for cam in cam_infos:
        center, scale = cam[:3], cam[3]
        dist = np.clip(
            np.linalg.norm(positions - center[None], axis=1) * scale,
            1e-8, None)
        pred = np.log2(cfg.standard_dist / dist) / logfork
        if cfg.dist2level == "floor":
            int_level = np.clip(np.floor(pred), 0, cfg.street_levels - 1)
        elif cfg.dist2level == "round":
            int_level = np.clip(np.round(pred), 0, cfg.street_levels - 1)
        elif cfg.dist2level == "ceil":
            int_level = np.clip(np.ceil(pred), 0, cfg.street_levels - 1)
        else:
            p = np.clip(pred + 1.0, 0.9999, cfg.street_levels - 1 + 0.9999)
            int_level = np.floor(p)
        count += (levels <= int_level)
    return count / float(len(cam_infos)) > weed_ratio


def test_weed_out_vectorized_matches_loop():
    cfg = ModelConfig(name="GaussianLoDModel", fork=2, aerial_levels=2,
                      street_levels=5, standard_dist=16.0, voxel_size=0.3)
    rng = np.random.default_rng(2)
    positions = rng.normal(0, 8, size=(4000, 3)).astype(np.float32)
    levels = rng.integers(0, 5, size=4000).astype(np.int32)
    cam_infos = np.concatenate(
        [rng.normal(0, 6, size=(150, 3)), rng.uniform(0.5, 2.0, (150, 1))],
        axis=1).astype(np.float32)
    import dataclasses
    for d2l in ("floor", "round", "ceil", "progressive"):
        c = dataclasses.replace(cfg, dist2level=d2l)
        got = weed_out_mask(c, positions, levels, cam_infos, 0.4)
        want = _weed_reference(c, positions, levels, cam_infos, 0.4)
        np.testing.assert_array_equal(got, want, err_msg=f"dist2level={d2l}")
