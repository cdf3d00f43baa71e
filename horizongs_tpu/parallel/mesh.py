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
