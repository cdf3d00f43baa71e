"""Device mesh construction for multi-chip / multi-host training.

The reference has no communication layer at all (SURVEY.md §2.3) — its
only scale-out is one process per scene chunk plus an offline merge. Here
scale-out is a first-class `jax.sharding.Mesh` with two axes:

  "data"  — cameras (views) are batched and sharded across this axis;
            every step renders n_data views in parallel and gradients
            are mean-reduced (the DP axis).
  "model" — the anchor table is sharded row-wise across this axis; the
            neural-gaussian decode runs on local rows and the decoded
            gaussians are all-gathered for rasterization (the TP axis).
            Gradients flow back through the transposed collective
            (reduce-scatter) automatically.

On a pod slice, "data" should map to ICI-adjacent chips and chunk
parallelism (whole scenes) to hosts over DCN — see parallel/chunks.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (
        f"mesh {data}x{model} does not match {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_spec(spec: Optional[str]) -> Optional[Mesh]:
    """CLI mesh spec -> Mesh. `None`/"" -> no mesh (single-device step);
    "auto" -> all devices as data x 1 if <= 2, else (n/2) x 2;
    "DxM" (e.g. "4x2") -> explicit data x model."""
    if not spec:
        return None
    n = len(jax.devices())
    if spec == "auto":
        if n == 1:
            return None
        model = 2 if n % 2 == 0 and n > 2 else 1
        return make_mesh(data=n // model, model=model)
    data_s, model_s = spec.lower().split("x")
    data, model = int(data_s), int(model_s)
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} "
                         f"devices, only {n} visible")
    return make_mesh(data=data, model=model,
                     devices=jax.devices()[:data * model])


# Environment markers of a multi-process launch that
# `jax.distributed.initialize()` can auto-detect with no arguments
# (cloud TPU pod slices, Slurm, Open MPI). Checked WITHOUT touching the
# JAX backend — initialize() must run before anything else does.
# (TPU_WORKER_HOSTNAMES is handled separately: single-worker TPU VMs
# export it too, so it only counts when it lists >1 host.)
_POD_ENV_MARKERS = ("MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID",
                    "OMPI_COMM_WORLD_SIZE")


def maybe_init_distributed(logger=None) -> int:
    """Multi-host bring-up. Call FIRST, before any JAX API that touches
    the backend (`jax.devices`, any computation): `initialize()` hard-
    fails afterwards. Attempts `jax.distributed.initialize()` when either

      * the explicit coordinator env is present — JAX_COORDINATOR_ADDRESS
        [+ JAX_NUM_PROCESSES, JAX_PROCESS_ID], passed through as explicit
        arguments (no-arg initialize() does NOT read these); or
      * a TPU-pod / Slurm / Open MPI launch is detectable from its
        standard env markers, in which case no-arg auto-detection runs —
        the standard TPU pod case, where none of the JAX_* vars exist.

    Returns the process index (0 when single-process / not launched
    distributed). Safe to call twice (the second call logs and moves on).
    Exercised for real by tests/test_multiprocess.py (2 processes x 4
    CPU devices over a localhost coordinator).

    The reference has no multi-host story at all (SURVEY.md §2.3); its
    closest analog is launching one training job per chunk by hand."""
    import os
    log = logger.info if logger else print
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    pod = any(m in os.environ for m in _POD_ENV_MARKERS)
    # single-worker TPU VMs also export TPU_WORKER_HOSTNAMES — only a
    # multi-host list warrants the auto-detected bring-up
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod = pod or len([h for h in hosts.split(",") if h]) > 1
    if not addr and not pod:
        return jax.process_index()
    try:
        if addr:
            nproc = os.environ.get("JAX_NUM_PROCESSES")
            pid = os.environ.get("JAX_PROCESS_ID")
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc) if nproc else None,
                process_id=int(pid) if pid else None)
        else:
            jax.distributed.initialize()
        log(f"jax.distributed initialized: process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.devices())} global devices")
    except (RuntimeError, ValueError) as e:
        # already initialized / backend started / auto-detection could
        # not produce a coordinator (e.g. misleading env markers)
        log(f"jax.distributed.initialize skipped: {e}")
    return jax.process_index()
