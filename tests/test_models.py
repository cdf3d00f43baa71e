"""Model layer tests: decode masking, LOD rules, Adam parity with torch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.models import (
    ModelConfig, init_mlps, init_anchor_state_from_points,
    decode_neural_gaussians, anchor_lod_mask)
from horizongs_tpu.models.anchors import AnchorState


def _flat_cfg(**kw):
    base = dict(name="GaussianModel", feat_dim=8, n_offsets=4, view_dim=3,
                appearance_dim=0, color_attr="RGB", voxel_size=0.05)
    base.update(kw)
    return ModelConfig(**base)


def _lod_cfg(**kw):
    base = dict(name="GaussianLoDModel", feat_dim=8, n_offsets=4, view_dim=3,
                appearance_dim=0, color_attr="RGB", voxel_size=0.2,
                fork=2, aerial_levels=2, street_levels=4, standard_dist=8.0)
    base.update(kw)
    return ModelConfig(**base)


def _state_and_mlps(cfg, n_pts=50, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(n_pts, 3)).astype(np.float32)
    state = init_anchor_state_from_points(cfg, pts, capacity=256)
    key = jax.random.PRNGKey(seed)
    mlps = init_mlps(key, cfg.feat_dim, cfg.view_dim, cfg.appearance_dim,
                     cfg.n_offsets, cfg.color_dim)
    # non-zero features so decode outputs vary
    state = state._replace(feat=jax.random.normal(key, state.feat.shape) * 0.1)
    return state, mlps


def test_init_state_padding():
    cfg = _flat_cfg()
    state, _ = _state_and_mlps(cfg)
    n = int(state.n)
    assert 0 < n <= 50
    assert state.capacity == 256
    # padding rows are zero anchors
    assert np.allclose(np.asarray(state.anchor[n:]), 0.0)
    # valid mask
    vm = np.asarray(state.valid_mask())
    assert vm[:n].all() and not vm[n:].any()


def test_decode_shapes_and_masking():
    cfg = _flat_cfg()
    state, mlps = _state_and_mlps(cfg)
    C, k = state.capacity, cfg.n_offsets
    mask = np.asarray(state.valid_mask())
    dec = decode_neural_gaussians(cfg, mlps, state, jnp.zeros(3),
                                  jnp.asarray(mask))
    assert dec.means.shape == (C * k, 3)
    assert dec.opacities.shape == (C * k,)
    # dead rows must have zero opacity
    dead = ~np.repeat(mask, k)
    assert np.allclose(np.asarray(dec.opacities)[dead], 0.0)
    # selection mask implies positive opacity
    sel = np.asarray(dec.selection_mask)
    ops = np.asarray(dec.opacities)
    assert (ops[sel] > 0).all()
    assert np.allclose(ops[~sel], 0.0)


def test_decode_opacity_matches_manual_mlp():
    cfg = _flat_cfg(view_dim=0)
    state, mlps = _state_and_mlps(cfg)
    from horizongs_tpu.models.mlp import mlp_apply
    dec = decode_neural_gaussians(cfg, mlps, state, jnp.zeros(3),
                                  state.valid_mask())
    manual = np.tanh(np.asarray(mlp_apply(mlps.opacity, state.feat)))
    got = np.asarray(dec.opacities).reshape(state.capacity, cfg.n_offsets)
    keep = manual > 0
    vm = np.asarray(state.valid_mask())[:, None] & keep
    np.testing.assert_allclose(got[vm], manual[vm], rtol=1e-5)


def test_lod_mask_distance_rule():
    cfg = _lod_cfg()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    state = init_anchor_state_from_points(cfg, pts, capacity=1024)
    # nearby camera sees all levels; far camera only coarse levels
    near_mask, _ = anchor_lod_mask(cfg, state, jnp.array([0.0, 0.0, 0.0]))
    far_mask, _ = anchor_lod_mask(cfg, state, jnp.array([100.0, 0.0, 0.0]))
    n = int(state.n)
    levels = np.asarray(state.level)[:n]
    nm = np.asarray(near_mask)[:n]
    fm = np.asarray(far_mask)[:n]
    assert nm.sum() >= fm.sum()
    # far: pred_level = log2(8/100)/1 < 0 -> only level 0 anchors would pass
    assert not fm[levels > 0].any()


def test_lod_octree_levels_exist():
    cfg = _lod_cfg()
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    state = init_anchor_state_from_points(cfg, pts, capacity=2048)
    levels = np.asarray(state.level)[:int(state.n)]
    assert set(np.unique(levels)) == set(range(cfg.aerial_levels))


def test_adam_matches_torch():
    import torch
    from horizongs_tpu.train.optim import (
        TrainableParams, init_adam, adam_step, lr_tree)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(5, 3)).astype(np.float32)
    g = rng.normal(size=(5, 3)).astype(np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w))
    opt = torch.optim.Adam([wt], lr=0.01, eps=1e-15)
    wt.grad = torch.tensor(g)
    opt.step()
    wt.grad = torch.tensor(g * 0.5)
    opt.step()

    # ours: single-leaf pytree via the anchor slot
    def mk(x):
        return TrainableParams(anchor=jnp.asarray(x), offset=jnp.zeros((1,)),
                               feat=jnp.zeros((1,)), scaling_log=jnp.zeros((1,)),
                               mlp_opacity={}, mlp_cov={}, mlp_color={},
                               appearance=None)
    params = mk(w)
    state = init_adam(params)
    lrs = {"anchor": jnp.asarray(0.01), "offset": 0.0, "feat": 0.0,
           "scaling_log": 0.0, "mlp_opacity": 0.0, "mlp_cov": 0.0,
           "mlp_color": 0.0, "appearance": 0.0}
    lt = lr_tree(params, lrs)
    params, state = adam_step(params, mk(g), state, lt)
    params, state = adam_step(params, mk(g * 0.5), state, lt)
    np.testing.assert_allclose(np.asarray(params.anchor),
                               wt.detach().numpy(), atol=1e-6)


def test_expon_lr_endpoints():
    from horizongs_tpu.train.schedules import expon_lr
    assert float(expon_lr(0, 0.01, 0.0001, max_steps=100)) == pytest.approx(0.01, rel=1e-4)
    assert float(expon_lr(100, 0.01, 0.0001, max_steps=100)) == pytest.approx(0.0001, rel=1e-4)
    assert float(expon_lr(50, 0.01, 0.0001, max_steps=100)) == pytest.approx(0.001, rel=1e-3)
    assert float(expon_lr(10, 0.0, 0.0, max_steps=100)) == 0.0


def test_ssim_basics():
    from horizongs_tpu.train.losses import ssim
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
    noisy = img + 0.3 * jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32))
    assert float(ssim(img, noisy)) < 0.9


def test_ssim_matches_torch_reference_impl():
    """Compare against the reference's torch SSIM (loss_utils.py:30-60)."""
    import torch
    import torch.nn.functional as F
    from math import exp as _exp

    def gaussian(window_size, sigma):
        gauss = torch.Tensor([_exp(-(x - window_size // 2) ** 2 / float(2 * sigma ** 2)) for x in range(window_size)])
        return gauss / gauss.sum()

    def create_window(window_size, channel):
        _1D = gaussian(window_size, 1.5).unsqueeze(1)
        _2D = _1D.mm(_1D.t()).float().unsqueeze(0).unsqueeze(0)
        return _2D.expand(channel, 1, window_size, window_size).contiguous()

    def torch_ssim(img1, img2, window_size=11):
        channel = img1.size(-3)
        window = create_window(window_size, channel)
        mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
        mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean()

    from horizongs_tpu.train.losses import ssim
    rng = np.random.default_rng(5)
    a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    b = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(torch_ssim(torch.tensor(a).permute(2, 0, 1)[None],
                              torch.tensor(b).permute(2, 0, 1)[None]))
    assert ours == pytest.approx(theirs, abs=2e-3)
