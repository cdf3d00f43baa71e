"""Real multi-process (simulated multi-host) execution of the band-
sharded training step: 2 processes x 4 CPU devices over a localhost
coordinator, global 4x2 (data x model) mesh, compared step-for-step with
the same scenario on the single-process 8-device mesh.

This is the SURVEY.md §4 multi-host test strategy executed for real —
`jax.distributed.initialize` bring-up through the product path
(`maybe_init_distributed`), cross-process record exchange + halo
ppermutes over the Gloo CPU collectives, and per-process camera-batch
agreement. The reference has no multi-host code at all (SURVEY.md §2.3).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


STEPS = 10


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    """Launch the 2-process run once; both tests read its artifacts."""
    out_dir = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    outs = [str(out_dir / f"proc{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_DIR, "mp_worker.py"),
         str(i), "2", str(port), outs[i], "4", str(STEPS)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{logs[i][-4000:]}")
    return [json.load(open(o)) for o in outs]


def test_two_process_band_step_runs_and_agrees(mp_results):
    r0, r1 = mp_results
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["n_global_devices"] == 8
    # per-process camera-batch agreement: same seed => same picks
    assert r0["picks"] == r1["picks"]
    # both processes observe the identical (replicated) loss stream
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert np.isfinite(r0["losses"]).all()
    # training makes progress across the 10 steps
    assert r0["losses"][-1] < r0["losses"][0]


def test_two_process_matches_single_process(mp_results):
    """The 2-process 4x2 run reproduces the single-process 8-device run:
    same losses, same final parameter/optimizer/stats checksums."""
    sys.path.insert(0, _DIR)
    import mp_worker

    from horizongs_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=mp_worker.N_DATA, model=mp_worker.N_MODEL)
    ref = mp_worker.run_steps(mesh, STEPS)

    r0 = mp_results[0]
    assert ref["picks"] == r0["picks"]
    np.testing.assert_allclose(r0["losses"], ref["losses"],
                               rtol=1e-5, atol=1e-7)
    for k, v in ref["checks"].items():
        assert r0["checks"][k] == pytest.approx(v, rel=1e-4), k
