"""One process of an N-process `jax.distributed` band-sharded training run.

Launched by tests/test_multiprocess.py as

    python tests/mp_worker.py <process_id> <num_processes> <port> \
        <out.json> <local_devices> <steps>

Exercises the REAL multi-host product path on CPU: the coordinator env
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) is set
the way a launcher would, `maybe_init_distributed` performs the
bring-up, each process owns <local_devices> virtual devices, the global
(data x model) mesh spans all processes, and the band-sharded training
step runs with splat records and halo rows crossing the process boundary
over the Gloo CPU collectives. BASELINE.md bar: ">=80% scaling 1 chip ->
N>=2 hosts" — this is the N>=2-hosts execution path (simulated hosts).

The scenario builder is shared with the single-process reference run in
the test so loss parity is apples-to-apples.
"""
import json
import os
import sys

W = H = 32
N_DATA, N_MODEL = 4, 2


def build_scenario():
    """Deterministic tiny scene + camera schedule — identical on every
    process (same seeds), as multi-host training requires: every process
    must construct the same global arrays and pick the same cameras."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from horizongs_tpu.config import make_optim
    from horizongs_tpu.data.synthetic import orbit_cameras, random_gaussians
    from horizongs_tpu.models import (
        ModelConfig, init_mlps, init_anchor_state_from_points)
    from horizongs_tpu.ops.reference import render_dense_3dgs
    from horizongs_tpu.train.optim import TrainableParams, init_adam
    from horizongs_tpu.train.step import TrainState, init_stats

    cfg = ModelConfig(name="GaussianModel", feat_dim=16, n_offsets=4,
                      view_dim=3, color_attr="RGB", render_mode="RGB",
                      voxel_size=0.1)
    g = {k: jnp.asarray(v) for k, v in
         random_gaussians(30, seed=0, extent=0.7,
                          scale_range=(0.1, 0.25)).items()}
    cams = orbit_cameras(8, radius=3.5, height_z=-1.0, width=W, height=H)
    rfn = jax.jit(lambda vm, K: render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        vm, K, W, H, jnp.zeros(3)))
    cams = [c._replace(image=rfn(c.viewmat, c.K)[0],
                       alpha_mask=jnp.ones((H, W, 1))) for c in cams]

    st = init_anchor_state_from_points(cfg, np.asarray(g["means"]),
                                       capacity=256)
    mlps = init_mlps(jax.random.PRNGKey(0), cfg.feat_dim, cfg.view_dim,
                     cfg.appearance_dim, cfg.n_offsets, cfg.color_dim)
    params = TrainableParams(
        anchor=st.anchor, offset=st.offset, feat=st.feat,
        scaling_log=st.scaling_log, mlp_opacity=mlps.opacity,
        mlp_cov=mlps.cov, mlp_color=mlps.color, appearance=mlps.appearance)
    ts = TrainState(params=params, rotation=st.rotation, level=st.level,
                    extra_level=st.extra_level, n=st.n,
                    opt=init_adam(params),
                    stats=init_stats(st.capacity, cfg.n_offsets))
    opt = make_optim(start_stat=0)

    # deterministic camera schedule: same seed => same picks everywhere
    rng = random.Random(17)
    def pick_batch():
        return [rng.randrange(len(cams)) for _ in range(N_DATA)]
    return cfg, opt, ts, cams, pick_batch


def run_steps(mesh, steps: int):
    """Run `steps` band-sharded training steps on `mesh`; returns a JSON-
    able result dict (losses, camera-pick fingerprint, state checksums)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from horizongs_tpu.parallel.step import (
        build_sharded_train_step, shard_state)
    from horizongs_tpu.train.step import camera_tensors

    cfg, opt, ts, cams, pick_batch = build_scenario()
    step = build_sharded_train_step(cfg, opt, mesh, H, W,
                                    add_prefilter=False, shard_tiles=True)
    # host-replicated numpy leaves shard cleanly across processes
    ts = jax.tree.map(lambda x: np.asarray(x), ts)
    ts = shard_state(ts, mesh)

    def scalar(x):
        return float(np.asarray(x.addressable_shards[0].data))

    losses, picks = [], []
    for it in range(1, steps + 1):
        idxs = pick_batch()
        picks.append(idxs)
        cts = [camera_tensors(cams[i], do_stats=True) for i in idxs]
        batch = jax.tree.map(lambda *xs: np.stack(xs), *cts)
        ts, m = step(ts, batch, it)
        losses.append(scalar(m["loss"]))

    sums = jax.jit(lambda t: {
        "anchor_sumsq": jnp.sum(t.params.anchor ** 2),
        "feat_sumsq": jnp.sum(t.params.feat ** 2),
        "nu_feat_sumsq": jnp.sum(t.opt.nu.feat ** 2),
        "stats_demon_sum": jnp.sum(t.stats.anchor_demon),
    })(ts)
    return {"losses": losses, "picks": picks,
            "checks": {k: scalar(v) for k, v in sums.items()}}


def run_trainer_cli(dataset: str, model_path: str, steps: int) -> dict:
    """Drive the FULL train CLI (Scene build -> band-sharded trainer on
    the global 4x2 mesh -> densify epochs -> sharded orbax checkpoint ->
    eval) in this process of the multi-process run. Every process runs
    the identical deterministic driver; orbax coordinates the shared
    checkpoint directory; results land in the shared model_path."""
    import json as _json

    from horizongs_tpu.cli.train import main as train_main
    rc = train_main([
        "--config", os.path.join(dataset, "mp_config.yaml"),
        "--model_path", model_path, "--rasterizer", "tiled",
        "--mesh", "4x2", "--iterations", str(steps),
        "--checkpoint_iterations", str(steps),
        "--checkpoint_format", "sharded", "--disable_tb"])
    with open(os.path.join(model_path, f"results_test.json")) as f:
        results = _json.load(f)
    return {"rc": rc, "results": results}


def main():
    pid, nproc, port, out_path, local_devices, steps = sys.argv[1:7]
    mode = sys.argv[7] if len(sys.argv) > 7 else "step"
    dataset = sys.argv[8] if len(sys.argv) > 8 else ""
    model_path = sys.argv[9] if len(sys.argv) > 9 else ""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = pid
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    if mode == "trainer":
        # the CLI performs the distributed bring-up itself (--mesh)
        out = run_trainer_cli(dataset, model_path, int(steps))
        out["process_id"] = int(pid)
        out["process_count"] = jax.process_count()
        with open(out_path, "w") as f:
            json.dump(out, f)
        print(f"proc {pid}: trainer done rc={out['rc']}", flush=True)
        return

    from horizongs_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    assert jax.process_count() == int(nproc), (
        f"distributed init failed: process_count={jax.process_count()}")
    assert len(jax.devices()) == int(nproc) * int(local_devices)

    from horizongs_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=N_DATA, model=N_MODEL)
    out = run_steps(mesh, int(steps))
    out["process_id"] = int(pid)
    out["process_count"] = jax.process_count()
    out["n_global_devices"] = len(jax.devices())
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"proc {pid}: done, final loss {out['losses'][-1]:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
