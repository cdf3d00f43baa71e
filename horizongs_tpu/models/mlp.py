"""Tiny decode MLPs as plain parameter pytrees.

The reference's three decoders are 2-layer MLPs (Linear-ReLU-Linear, the
opacity head tanh-capped), `scene/base_model.py:64-81`. We keep them as
raw (w1, b1, w2, b2) dicts — trivially jittable, shardable, and easy to
freeze (fine stage) or surgically update. Init matches torch
`nn.Linear` defaults (Kaiming-uniform weights, fan-in uniform bias).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, fan_in: int, fan_out: int):
    k1, k2 = jax.random.split(key)
    bound_w = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)  # kaiming_uniform(a=sqrt(5))
    w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound_w, maxval=bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound_b, maxval=bound_b)
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def init_2layer(key, d_in: int, d_hidden: int, d_out: int):
    k1, k2 = jax.random.split(key)
    return {"l1": _linear_init(k1, d_in, d_hidden),
            "l2": _linear_init(k2, d_hidden, d_out)}


def mlp_apply(params, x: jnp.ndarray, final_tanh: bool = False) -> jnp.ndarray:
    h = x @ params["l1"]["w"] + params["l1"]["b"]
    h = jax.nn.relu(h)
    out = h @ params["l2"]["w"] + params["l2"]["b"]
    if final_tanh:
        out = jnp.tanh(out)
    return out


class MlpParams(NamedTuple):
    opacity: dict      # (F+view) -> F -> n_offsets, tanh
    cov: dict          # (F+view) -> F -> 7*n_offsets
    color: dict        # (F+view+appearance) -> F -> color_dim*n_offsets
    appearance: Optional[jnp.ndarray] = None  # (num_cameras, appearance_dim)


def init_mlps(key, feat_dim: int, view_dim: int, appearance_dim: int,
              n_offsets: int, color_dim: int,
              num_cameras: int = 0) -> MlpParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    opacity = init_2layer(k1, feat_dim + view_dim, feat_dim, n_offsets)
    cov = init_2layer(k2, feat_dim + view_dim, feat_dim, 7 * n_offsets)
    color = init_2layer(k3, feat_dim + view_dim + appearance_dim, feat_dim,
                        color_dim * n_offsets)
    appearance = None
    if appearance_dim > 0:
        # nerfstudio-style Embedding init (reference scene/embedding.py)
        appearance = jax.random.normal(k4, (max(num_cameras, 1), appearance_dim)).astype(jnp.float32)
    return MlpParams(opacity=opacity, cov=cov, color=color, appearance=appearance)
