"""Multi-chip sharded training on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horizongs_tpu.config import make_optim
from horizongs_tpu.data.synthetic import orbit_cameras, random_gaussians
from horizongs_tpu.models import ModelConfig, init_mlps, init_anchor_state_from_points
from horizongs_tpu.ops.reference import render_dense_3dgs
from horizongs_tpu.parallel.mesh import make_mesh
from horizongs_tpu.parallel.step import build_sharded_train_step, shard_state
from horizongs_tpu.train.optim import TrainableParams, init_adam
from horizongs_tpu.train.step import (
    TrainState, build_train_step, camera_tensors, init_stats)

W = H = 32


def _targets(n_cams, seed=0):
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(30, seed=seed, extent=0.7,
                          scale_range=(0.1, 0.25)).items()}
    cams = orbit_cameras(n_cams, radius=3.5, height_z=-1.0, width=W, height=H)
    rfn = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, W, H, jnp.zeros(3)))
    return [c._replace(image=rfn(c.viewmat, c.K)[0],
                       alpha_mask=jnp.ones((H, W, 1))) for c in cams], g


def _state(cfg, pts, capacity=256, seed=0):
    st = init_anchor_state_from_points(cfg, pts, capacity=capacity)
    mlps = init_mlps(jax.random.PRNGKey(seed), cfg.feat_dim, cfg.view_dim,
                     cfg.appearance_dim, cfg.n_offsets, cfg.color_dim)
    params = TrainableParams(
        anchor=st.anchor, offset=st.offset, feat=st.feat,
        scaling_log=st.scaling_log, mlp_opacity=mlps.opacity,
        mlp_cov=mlps.cov, mlp_color=mlps.color, appearance=mlps.appearance)
    return TrainState(params=params, rotation=st.rotation, level=st.level,
                      extra_level=st.extra_level, n=st.n,
                      opt=init_adam(params),
                      stats=init_stats(st.capacity, cfg.n_offsets))


def _stack_cams(cams, do_stats=True):
    cts = [camera_tensors(c, do_stats=do_stats) for c in cams]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cts)


def test_sharded_step_matches_single_device():
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))

    # single-device reference step
    step1 = build_train_step(cfg, opt, H, W, add_prefilter=False)
    ref_state, ref_metrics = step1(jax.tree.map(jnp.copy, ts),
                                   camera_tensors(cams[0], do_stats=True), 1)

    # 1 data x 2 model shards
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    stepN = build_sharded_train_step(cfg, opt, mesh, H, W,
                                     add_prefilter=False)
    shard_ts = shard_state(ts, mesh)
    new_state, metrics = stepN(shard_ts, _stack_cams(cams[:1]), 1)

    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.params.anchor),
                               np.asarray(ref_state.params.anchor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.params.feat),
                               np.asarray(ref_state.params.feat), atol=1e-5)
    for leaf_ref, leaf_new in zip(
            jax.tree.leaves(ref_state.params.mlp_color),
            jax.tree.leaves(new_state.params.mlp_color)):
        np.testing.assert_allclose(np.asarray(leaf_new),
                                   np.asarray(leaf_ref), atol=1e-5)
    # densify stats match
    np.testing.assert_allclose(np.asarray(new_state.stats.anchor_demon),
                               np.asarray(ref_state.stats.anchor_demon),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.offset_gradient_accum),
        np.asarray(ref_state.stats.offset_gradient_accum), atol=1e-6)
    # Adam second moments expose the raw gradient SCALE (params after one
    # step do not — Adam's first update is scale-invariant): catches the
    # n_model x factor from the all_gather transpose if left unrescaled
    np.testing.assert_allclose(np.asarray(new_state.opt.nu.feat),
                               np.asarray(ref_state.opt.nu.feat),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_state.opt.nu.anchor),
                               np.asarray(ref_state.opt.nu.anchor),
                               atol=1e-10)
    for leaf_ref, leaf_new in zip(
            jax.tree.leaves(ref_state.opt.nu.mlp_color),
            jax.tree.leaves(new_state.opt.nu.mlp_color)):
        np.testing.assert_allclose(np.asarray(leaf_new),
                                   np.asarray(leaf_ref), atol=1e-10)


def test_sharded_training_4x2_reduces_loss():
    cfg = ModelConfig(name="GaussianLoDModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.3, fork=2, aerial_levels=2,
                      street_levels=4, standard_dist=8.0)
    cams, g = _targets(8)
    opt = make_optim(start_stat=0, feature_lr=0.03, mlp_color_lr_init=0.02)
    ts = _state(cfg, np.asarray(g["means"]), capacity=512)

    mesh = make_mesh(data=4, model=2)
    step = build_sharded_train_step(cfg, opt, mesh, H, W,
                                    add_prefilter=False)
    ts = shard_state(ts, mesh)
    losses = []
    for it in range(1, 31):
        batch = _stack_cams([cams[(4 * it + j) % 8] for j in range(4)])
        ts, m = step(ts, batch, it)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    # stats accumulated on shards
    assert float(jnp.sum(ts.stats.anchor_demon)) > 0


def test_sharded_step_pallas_rasterizer():
    """The Pallas kernels run per device inside shard_map (interpret mode
    on the CPU mesh) and agree with the scan-backend sharded step."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(2)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])

    step_t = build_sharded_train_step(cfg, opt, mesh, H, W,
                                      add_prefilter=False)
    st_t, m_t = step_t(shard_state(jax.tree.map(jnp.copy, ts), mesh),
                       _stack_cams(cams[:2]), 1)

    step_p = build_sharded_train_step(cfg, opt, mesh, H, W,
                                      add_prefilter=False,
                                      rasterizer="pallas_interpret",
                                      instance_cap=4096)
    st_p, m_p = step_p(shard_state(ts, mesh), _stack_cams(cams[:2]), 1)

    assert float(m_p["loss"]) == pytest.approx(float(m_t["loss"]), rel=2e-3)
    np.testing.assert_allclose(np.asarray(st_p.params.anchor),
                               np.asarray(st_t.params.anchor), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_p.params.feat),
                               np.asarray(st_t.params.feat), atol=1e-4)


# ---------------------------------------------------------------------------
# tile-band-sharded rasterization (round 2): no device holds the full
# decoded gaussian set; records are exchanged by band ownership
# ---------------------------------------------------------------------------

def test_band_sharded_step_matches_single_device():
    """Band exchange + per-band compositing reproduces the single-device
    step bit-for-bit-ish (<=1e-5), incl. Adam second moments (gradient
    scale) and densify statistics (probe gradients)."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB+ED",
                      voxel_size=0.1)
    cams, g = _targets(1)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))

    step1 = build_train_step(cfg, opt, H, W, add_prefilter=False,
                             rasterizer="tiled")
    ref_state, ref_metrics = step1(jax.tree.map(jnp.copy, ts),
                                   camera_tensors(cams[0], do_stats=True), 1)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    stepN = build_sharded_train_step(cfg, opt, mesh, H, W,
                                     add_prefilter=False, shard_tiles=True)
    new_state, m = stepN(shard_state(ts, mesh), _stack_cams(cams[:1]), 1)

    assert float(m["loss"]) == pytest.approx(float(ref_metrics["loss"]),
                                             rel=1e-5)
    assert int(m["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(new_state.params.anchor),
                               np.asarray(ref_state.params.anchor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.opt.nu.feat),
                               np.asarray(ref_state.opt.nu.feat),
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.offset_gradient_accum),
        np.asarray(ref_state.stats.offset_gradient_accum), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.stats.max_radii2d),
                               np.asarray(ref_state.stats.max_radii2d),
                               atol=1e-6)


def test_band_sharded_step_2dgs():
    """2DGS (normals / distortion / median-depth losses) through the
    band-sharded step matches the single-device step."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB+ED",
                      voxel_size=0.1, gs_attr="2D")
    cams, g = _targets(1)
    opt = make_optim(start_stat=0, lambda_normal=0.05, lambda_dist=100.0,
                     normal_start_iter=0, dist_start_iter=0)
    ts = _state(cfg, np.asarray(g["means"]))

    step1 = build_train_step(cfg, opt, H, W, add_prefilter=False,
                             rasterizer="tiled")
    ref_state, ref_metrics = step1(jax.tree.map(jnp.copy, ts),
                                   camera_tensors(cams[0], do_stats=True), 1)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    stepN = build_sharded_train_step(cfg, opt, mesh, H, W,
                                     add_prefilter=False, shard_tiles=True)
    new_state, m = stepN(shard_state(ts, mesh), _stack_cams(cams[:1]), 1)

    assert float(m["loss"]) == pytest.approx(float(ref_metrics["loss"]),
                                             rel=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.params.anchor),
                               np.asarray(ref_state.params.anchor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.opt.nu.feat),
                               np.asarray(ref_state.opt.nu.feat),
                               atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.offset_gradient_accum),
        np.asarray(ref_state.stats.offset_gradient_accum), atol=1e-6)


def test_band_sharded_pallas_matches_scan():
    """The Pallas kernels composite exchanged records per band inside
    shard_map (interpret mode on the CPU mesh)."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(2)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])

    step_t = build_sharded_train_step(cfg, opt, mesh, H, W,
                                      add_prefilter=False, shard_tiles=True)
    st_t, m_t = step_t(shard_state(jax.tree.map(jnp.copy, ts), mesh),
                       _stack_cams(cams[:2]), 1)

    step_p = build_sharded_train_step(cfg, opt, mesh, H, W,
                                      add_prefilter=False, shard_tiles=True,
                                      rasterizer="pallas_interpret",
                                      instance_cap=4096)
    st_p, m_p = step_p(shard_state(ts, mesh), _stack_cams(cams[:2]), 1)

    assert float(m_p["loss"]) == pytest.approx(float(m_t["loss"]), rel=2e-3)
    np.testing.assert_allclose(np.asarray(st_p.params.anchor),
                               np.asarray(st_t.params.anchor), atol=1e-4)


def test_band_cap_overflow_counted():
    """A too-small band_cap drops records but reports them in
    metrics["n_dropped_exchange"] — never silent, and never conflated
    with instance-capacity overflow (the trainer recalibrates whichever
    capacity actually overflowed)."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    step = build_sharded_train_step(cfg, opt, mesh, H, W,
                                    add_prefilter=False, shard_tiles=True,
                                    band_cap=1)
    st, m = step(shard_state(jax.tree.map(jnp.copy, ts), mesh),
                 _stack_cams(cams[:1]), 1)
    assert int(m["n_dropped_exchange"]) > 0
    assert int(m["n_dropped"]) >= int(m["n_dropped_exchange"])
    assert np.isfinite(float(m["loss"]))

    # conversely: a generous band_cap with a starved instance_cap blames
    # the instance list, not the exchange
    step_i = build_sharded_train_step(cfg, opt, mesh, H, W,
                                      add_prefilter=False,
                                      shard_tiles=True, instance_cap=16,
                                      raster_chunk=16)
    st_i, m_i = step_i(shard_state(ts, mesh), _stack_cams(cams[:1]), 1)
    assert int(m_i["n_dropped_instances"]) > 0
    assert int(m_i["n_dropped_exchange"]) == 0


def test_band_cap_calibration_no_drops_and_scales():
    """`count_band_records` + `suggest_band_cap` produce a capacity that
    (a) the band step runs drop-free at, and (b) keeps the exchange recv
    buffer (n_model * cap rows) well under the full record count — the
    1/n_model instance-memory scaling claim, now calibrated instead of
    hand-tuned (round-2 VERDICT missing #3)."""
    from horizongs_tpu.models.factory import new_mlps
    from horizongs_tpu.parallel.step import count_band_records
    from horizongs_tpu.parallel.tile_exchange import suggest_band_cap
    from horizongs_tpu.train.optim import mlps_from_params

    Wb, Hb = 64, 128                      # 8 tile rows -> 2 per band
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.02)
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(200, seed=1, extent=0.9,
                          scale_range=(0.004, 0.01)).items()}
    from horizongs_tpu.data.synthetic import lookat_camera
    cam = lookat_camera(width=Wb, height=Hb, eye=(0, 0, -3.5))
    cam = cam._replace(image=jnp.zeros((Hb, Wb, 3)),
                       alpha_mask=jnp.ones((Hb, Wb, 1)))
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]), capacity=256)
    n_model = 4
    mesh = make_mesh(data=1, model=n_model, devices=jax.devices()[:4])

    mlps = mlps_from_params(ts.params)
    astate = ts.anchor_state()
    n_routed = int(count_band_records(cam, cfg, mlps, astate, n_model,
                                      backend="scan",
                                      add_prefilter=False))
    cap = suggest_band_cap(n_routed, margin=1.25)
    assert cap >= n_routed
    K_full = ts.params.anchor.shape[0] * cfg.n_offsets
    assert n_model * cap < K_full, (
        f"recv buffer {n_model * cap} rows >= full set {K_full}: "
        f"memory does not scale")

    step = build_sharded_train_step(cfg, opt, mesh, Hb, Wb,
                                    add_prefilter=False, shard_tiles=True,
                                    band_cap=cap)
    st, m = step(shard_state(ts, mesh), _stack_cams([cam]), 1)
    assert int(m["n_dropped_exchange"]) == 0
    assert np.isfinite(float(m["loss"]))


def test_band_sharded_three_real_bands_odd_height():
    """Parity at a geometry with >=3 REAL bands, interior halos on both
    sides of the middle band, and an image height that is NOT a multiple
    of n_model * band_px (96x80, model=3: scan tiles give bands of 32 px
    with the last band half phantom). Round-2 VERDICT weak #8 — the
    32x32/band_rows=1 cases exercised row masking but never an interior
    band with real halos on both sides."""
    Wo, Ho = 96, 80
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB+ED",
                      voxel_size=0.1)
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(40, seed=2, extent=0.8,
                          scale_range=(0.1, 0.25)).items()}
    from horizongs_tpu.data.synthetic import lookat_camera
    from horizongs_tpu.ops.reference import render_dense_3dgs
    cam = lookat_camera(width=Wo, height=Ho, eye=(0, 0, -3.2))
    img, _, _ = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, Wo, Ho, jnp.zeros(3)))(cam.viewmat, cam.K)
    cam = cam._replace(image=img, alpha_mask=jnp.ones((Ho, Wo, 1)))
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]), capacity=258)  # 258 = 3*86

    step1 = build_train_step(cfg, opt, Ho, Wo, add_prefilter=False,
                             rasterizer="tiled")
    ref_state, ref_metrics = step1(jax.tree.map(jnp.copy, ts),
                                   camera_tensors(cam, do_stats=True), 1)

    mesh = make_mesh(data=1, model=3, devices=jax.devices()[:3])
    stepN = build_sharded_train_step(cfg, opt, mesh, Ho, Wo,
                                     add_prefilter=False, shard_tiles=True)
    new_state, m = stepN(shard_state(jax.tree.map(jnp.copy, ts), mesh),
                         _stack_cams([cam]), 1)

    assert float(m["loss"]) == pytest.approx(float(ref_metrics["loss"]),
                                             rel=1e-5)
    assert int(m["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(new_state.params.anchor),
                               np.asarray(ref_state.params.anchor),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.opt.nu.feat),
                               np.asarray(ref_state.opt.nu.feat),
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.offset_gradient_accum),
        np.asarray(ref_state.stats.offset_gradient_accum), atol=1e-6)

    # same geometry through the Pallas kernels (interpret mode): 32-px
    # tiles -> band_rows=1, still 3 real bands, last one half phantom
    step_p = build_sharded_train_step(cfg, opt, mesh, Ho, Wo,
                                      add_prefilter=False,
                                      shard_tiles=True,
                                      rasterizer="pallas_interpret",
                                      instance_cap=4096)
    st_p, m_p = step_p(shard_state(ts, mesh), _stack_cams([cam]), 1)
    assert float(m_p["loss"]) == pytest.approx(float(m["loss"]), rel=2e-3)
    np.testing.assert_allclose(np.asarray(st_p.params.anchor),
                               np.asarray(new_state.params.anchor),
                               atol=1e-4)


def test_dp_duplicate_views_downweighted():
    """A view duplicated to fill the data-parallel batch with
    loss_weight 1/k produces the same parameter/optimizer update as a
    batch containing it once — duplicates no longer weigh k x in the
    mean gradient (round-2 VERDICT weak #7)."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))

    mesh1 = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    step1 = build_sharded_train_step(cfg, opt, mesh1, H, W,
                                     add_prefilter=False, shard_tiles=True)
    ref, mref = step1(shard_state(jax.tree.map(jnp.copy, ts), mesh1),
                      _stack_cams(cams[:1]), 1)

    mesh2 = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    step2 = build_sharded_train_step(cfg, opt, mesh2, H, W,
                                     add_prefilter=False, shard_tiles=True)
    cts = [camera_tensors(cams[0], do_stats=True, loss_weight=0.5)
           for _ in range(2)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cts)
    dup, mdup = step2(shard_state(ts, mesh2), batch, 1)

    assert float(mdup["loss"]) == pytest.approx(float(mref["loss"]),
                                                rel=1e-6)
    np.testing.assert_allclose(np.asarray(dup.params.anchor),
                               np.asarray(ref.params.anchor), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dup.opt.nu.feat),
                               np.asarray(ref.opt.nu.feat), atol=1e-10)


def test_band_step_1x1_matches_plain():
    """Degenerate 1x1 mesh: the band step's exchange fast path (no
    routing sort) reproduces the plain single-device step — the config
    the real-chip overhead benchmark measures."""
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB+ED",
                      voxel_size=0.1)
    cams, g = _targets(1)
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]))
    step1 = build_train_step(cfg, opt, H, W, add_prefilter=False,
                             rasterizer="tiled")
    r1, m1 = step1(jax.tree.map(jnp.copy, ts),
                   camera_tensors(cams[0], do_stats=True), 1)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    stepb = build_sharded_train_step(cfg, opt, mesh, H, W,
                                     add_prefilter=False, shard_tiles=True)
    rb, mb = stepb(shard_state(ts, mesh), _stack_cams(cams[:1]), 1)
    assert float(mb["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(rb.params.anchor),
                               np.asarray(r1.params.anchor), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.opt.nu.feat),
                               np.asarray(r1.opt.nu.feat), atol=1e-10)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded checkpoint: save from a mesh-sharded TrainState
    (every device writes its shards, no host gather), restore into the
    sharded template with placement preserved (SURVEY §5)."""
    from horizongs_tpu.io.checkpoints import (
        load_sharded_checkpoint, save_sharded_checkpoint)

    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    ts = _state(cfg, np.asarray(g["means"]))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = shard_state(ts, mesh)
    path = str(tmp_path / "ckpt_sharded")
    save_sharded_checkpoint(path, sharded, 42)

    template = shard_state(jax.tree.map(jnp.zeros_like, ts), mesh)
    restored, it = load_sharded_checkpoint(path, template)
    assert it == 42
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # placement preserved: anchor rows still sharded over "model"
    assert restored.params.anchor.sharding == sharded.params.anchor.sharding


def test_sharded_checkpoint_resume_after_growth(tmp_path):
    """Resume from a sharded checkpoint whose padded anchor capacity
    differs from the freshly-initialized template — the normal case
    after any densify capacity growth. The restore must come back at the
    STORED capacity with values intact (orbax refuses shape mismatches,
    so the loader re-templates from checkpoint metadata)."""
    from horizongs_tpu.io.checkpoints import (
        load_sharded_checkpoint, save_sharded_checkpoint,
        sharded_checkpoint_capacity)
    from horizongs_tpu.train.densify import pad_state_capacity

    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    grown = pad_state_capacity(_state(cfg, np.asarray(g["means"])), 512)
    sharded = shard_state(grown, mesh)
    path = str(tmp_path / "ckpt_grown")
    save_sharded_checkpoint(path, sharded, 7)
    assert sharded_checkpoint_capacity(path) == 512

    # fresh trainer template at the ORIGINAL (smaller) capacity
    template = shard_state(_state(cfg, np.asarray(g["means"])), mesh)
    assert template.params.anchor.shape[0] == 256
    restored, it = load_sharded_checkpoint(path, template)
    assert it == 7
    assert restored.params.anchor.shape[0] == 512
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert restored.params.anchor.sharding.is_equivalent_to(
        sharded.params.anchor.sharding, 2)

    # shrink direction too (template larger than the checkpoint)
    big = shard_state(pad_state_capacity(
        _state(cfg, np.asarray(g["means"])), 1024), mesh)
    restored2, _ = load_sharded_checkpoint(path, big)
    assert restored2.params.anchor.shape[0] == 512


def test_sharded_checkpoint_cross_mesh_restore(tmp_path):
    """Train-on-pod -> render-on-one-chip (and mesh-reshape resume): a
    checkpoint saved from a 4x2 mesh restores onto a 2x4 mesh and onto a
    single device, values intact, placement following the TEMPLATE's
    mesh in each case. Orbax shards are sliced per save-time placement;
    the loader re-templates from checkpoint metadata, so any
    target sharding whose global shape matches works (SURVEY §5;
    round-4 VERDICT ask #7)."""
    from horizongs_tpu.io.checkpoints import (
        load_sharded_checkpoint, save_sharded_checkpoint)

    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(1)
    ts = _state(cfg, np.asarray(g["means"]))
    mesh42 = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    sharded = shard_state(ts, mesh42)
    path = str(tmp_path / "ckpt_42")
    save_sharded_checkpoint(path, sharded, 11)

    # restore onto a transposed 2x4 mesh
    mesh24 = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    tmpl24 = shard_state(jax.tree.map(jnp.zeros_like, ts), mesh24)
    r24, it = load_sharded_checkpoint(path, tmpl24)
    assert it == 11
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(r24)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert r24.params.anchor.sharding == tmpl24.params.anchor.sharding

    # restore onto ONE device (the render-on-one-chip workflow): the
    # unsharded host template places everything on the default device
    tmpl1 = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), jax.devices()[0]), ts)
    r1, it = load_sharded_checkpoint(path, tmpl1)
    assert it == 11
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(r1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert len(r1.params.anchor.devices()) == 1

    # and the restored single-device state actually trains
    opt = make_optim(start_stat=0)
    step = build_train_step(cfg, opt, H, W, add_prefilter=False,
                            rasterizer="tiled")
    out, m = step(r1, camera_tensors(cams[0], do_stats=True), 1)
    assert np.isfinite(float(m["loss"]))


def test_route_records_compaction():
    """Unit: per-destination compaction routes each record to exactly the
    bands its vertical extent touches, in original order, and counts
    overflow."""
    from horizongs_tpu.parallel.tile_exchange import (
        band_layout, route_records, count_routed_records)
    layout = band_layout(height=64, width=32, n_model=4, tile_h=16)
    assert layout.band_rows == 1 and layout.band_px == 16
    my = jnp.asarray([8.0, 24.0, 30.0, 62.0, 8.0])
    ry = jnp.asarray([2.0, 2.0, 12.0, 2.0, 2.0])   # row2 spans bands 1-2
    valid = jnp.asarray([True, True, True, True, False])
    records = jnp.arange(5, dtype=jnp.float32)[:, None] + 1.0  # (5,1)
    send, dropped = route_records(records, my, ry, valid, layout,
                                  send_cap=2)
    send = np.asarray(send).reshape(4, 2)
    assert int(dropped) == 0
    np.testing.assert_array_equal(send[0], [1.0, 0.0])   # band 0: rec0
    np.testing.assert_array_equal(send[1], [2.0, 3.0])   # band 1: rec1+2
    np.testing.assert_array_equal(send[2], [3.0, 0.0])   # band 2: rec2
    np.testing.assert_array_equal(send[3], [4.0, 0.0])   # band 3: rec3
    assert int(count_routed_records(my, ry, valid, layout)) == 2
    # overflow: cap 1 drops one of band 1's two records
    send1, dropped1 = route_records(records, my, ry, valid, layout,
                                    send_cap=1)
    assert int(dropped1) == 1


def test_band_sharded_balanced_bounds_parity():
    """Load-balanced (non-uniform) band boundaries reproduce the plain
    single-device step exactly: 96x80 at model=3 with scan tiles
    (n_tiles_y=5, tile_h=16) cut at bounds (0,1,3,5) — band heights
    16/32/32 px, so shorter bands mask their composite tail and every
    device's dy/interior comes from the per-band tables."""
    Wo, Ho = 96, 80
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB+ED",
                      voxel_size=0.1)
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(40, seed=3, extent=0.8,
                          scale_range=(0.1, 0.25)).items()}
    from horizongs_tpu.data.synthetic import lookat_camera
    from horizongs_tpu.ops.reference import render_dense_3dgs
    cam = lookat_camera(width=Wo, height=Ho, eye=(0, 0, -3.2))
    img, _, _ = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, Wo, Ho, jnp.zeros(3)))(cam.viewmat, cam.K)
    cam = cam._replace(image=img, alpha_mask=jnp.ones((Ho, Wo, 1)))
    opt = make_optim(start_stat=0)
    ts = _state(cfg, np.asarray(g["means"]), capacity=258)

    step1 = build_train_step(cfg, opt, Ho, Wo, add_prefilter=False,
                             rasterizer="tiled")
    ref_state, ref_metrics = step1(jax.tree.map(jnp.copy, ts),
                                   camera_tensors(cam, do_stats=True), 1)

    mesh = make_mesh(data=1, model=3, devices=jax.devices()[:3])
    stepN = build_sharded_train_step(cfg, opt, mesh, Ho, Wo,
                                     add_prefilter=False,
                                     shard_tiles=True,
                                     band_bounds=(0, 1, 3, 5))
    new_state, m = stepN(shard_state(jax.tree.map(jnp.copy, ts), mesh),
                         _stack_cams([cam]), 1)
    assert float(m["loss"]) == pytest.approx(float(ref_metrics["loss"]),
                                             rel=1e-5)
    assert int(m["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(new_state.params.anchor),
                               np.asarray(ref_state.params.anchor),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.offset_gradient_accum),
        np.asarray(ref_state.stats.offset_gradient_accum), atol=1e-6)


def test_suggest_band_bounds_balances_loads():
    """Quantile cuts equalize a horizon-peaked load profile; uniform
    bounds on the same profile are heavily skewed."""
    from horizongs_tpu.parallel.tile_exchange import suggest_band_bounds
    rows = 32
    loads = np.ones(rows)
    loads[12:16] = 40.0            # horizon spike
    bounds = suggest_band_bounds(loads, 4)
    assert bounds[0] == 0 and bounds[-1] >= rows and len(bounds) == 5
    assert all(b1 > b0 for b0, b1 in zip(bounds[:-1], bounds[1:]))
    per_band = [loads[b0:b1].sum() for b0, b1 in
                zip(bounds[:-1], bounds[1:])]
    worst_bal = max(per_band) / (sum(per_band) / 4)
    uni = [loads[m * 8:(m + 1) * 8].sum() for m in range(4)]
    worst_uni = max(uni) / (sum(uni) / 4)
    assert worst_bal < 1.35 < worst_uni
    # degenerate: fewer rows than bands still yields valid phantom cuts
    b2 = suggest_band_bounds(np.ones(2), 4)
    assert len(b2) == 5 and all(y > x for x, y in zip(b2[:-1], b2[1:]))


def test_count_tile_row_loads():
    """Unit: per-tile-row touch counts match the AABB span rule that
    routing uses (the profile suggest_band_bounds balances over)."""
    from horizongs_tpu.parallel.tile_exchange import count_tile_row_loads
    my = jnp.asarray([8.0, 24.0, 30.0, 100.0])
    ry = jnp.asarray([2.0, 2.0, 12.0, 2.0])
    valid = jnp.asarray([True, True, True, False])
    # tile_h=16, 4 rows: splat0 -> row 0; splat1 -> row 1;
    # splat2 spans rows 1-2; splat3 invalid
    loads = np.asarray(count_tile_row_loads(my, ry, valid, 4, 16))
    np.testing.assert_array_equal(loads, [1, 2, 1, 0])


def test_band_times_analytic_crop_counts():
    """The band-times tool's analytic per-crop instance counts
    (`tools.bench_scaling.flagship_view_spans` + `crop_counts`) must
    agree with the production counter at full height and partition
    sensibly across bands (the r5 first measurement run oversized every
    band cap 3-5x by counting splats the projection culls — this is the
    CPU guard for that methodology)."""
    import sys
    sys.path.insert(0, ".")
    from tools.bench_scaling import crop_counts, flagship_view_spans
    from horizongs_tpu.models import (
        ModelConfig, init_mlps, init_anchor_state_from_points)
    from horizongs_tpu.render import count_render_instances
    from horizongs_tpu.train.optim import mlps_from_params

    W2, H2, tile = 128, 128, 16
    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    cams, g = _targets(3)
    ts = _state(cfg, np.asarray(g["means"]))
    cams = [c._replace(width=W2, height=H2,
                       K=c.K.at[0, 2].set(W2 / 2).at[1, 2].set(H2 / 2))
            for c in cams]
    mlps = mlps_from_params(ts.params)
    astate = ts.anchor_state()
    spans = flagship_view_spans(cfg, mlps, astate, cams, W2, H2,
                                tile, tile)
    rows = H2 // tile
    for v, c in enumerate(cams):
        ana = crop_counts(spans[v], 0, rows)
        ref = int(count_render_instances(c, cfg, mlps, astate,
                                         add_prefilter=False,
                                         backend="scan"))
        assert ref > 0
        assert abs(ana - ref) <= max(0.05 * ref, 4), (ana, ref)
        # band partition: within-crop rows sum back to the full count
        # for splats fully inside; boundary-spanning splats double-count
        # across bands (they ARE routed to both) so the sum >= full
        halves = (crop_counts(spans[v], 0, rows // 2)
                  + crop_counts(spans[v], rows // 2, rows))
        assert halves >= ana
        assert halves <= 2 * ana
