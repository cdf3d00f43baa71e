"""Functional Adam with per-group LRs and row-surgery support.

Replaces the reference's torch Adam + optimizer surgery
(`base_model.py:236-310`, `basic_model.py:52-93,146-177`): parameters are
a NamedTuple pytree; moments are pytrees of the same structure, so
densification (grow/prune of anchor rows) is plain host-side array
surgery on params and moments alike — no optimizer internals to mutate.

Adam numerics match torch (`torch.optim.Adam(..., eps=1e-15)`): bias
correction on both moments, eps added *after* the sqrt.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from horizongs_tpu.models.mlp import MlpParams


class TrainableParams(NamedTuple):
    """The 9 optimizer groups of `training_setup` (`base_model.py:245-256`),
    minus rotation (stored but `requires_grad_(False)` in the reference)."""
    anchor: jnp.ndarray        # (C, 3)
    offset: jnp.ndarray        # (C, k, 3)
    feat: jnp.ndarray          # (C, F)
    scaling_log: jnp.ndarray   # (C, 6)
    mlp_opacity: dict
    mlp_cov: dict
    mlp_color: dict
    appearance: Optional[jnp.ndarray]  # (num_cams, A) or None


class AdamState(NamedTuple):
    mu: TrainableParams
    nu: TrainableParams
    t: jnp.ndarray             # () int32 step counter


def init_adam(params: TrainableParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     t=jnp.asarray(0, dtype=jnp.int32))


def lr_tree(params: TrainableParams, lrs: dict,
            frozen_mlps: bool = False,
            frozen_appearance: bool = False) -> TrainableParams:
    """Broadcast the per-group LR dict onto the param pytree structure."""
    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)
    zero = jnp.asarray(0.0, dtype=jnp.float32)
    mlp_o = fill(params.mlp_opacity, zero if frozen_mlps else lrs["mlp_opacity"])
    mlp_cv = fill(params.mlp_cov, zero if frozen_mlps else lrs["mlp_cov"])
    mlp_cl = fill(params.mlp_color, zero if frozen_mlps else lrs["mlp_color"])
    app = None
    if params.appearance is not None:
        app = zero if frozen_appearance else lrs["appearance"]
    return TrainableParams(
        anchor=lrs["anchor"], offset=lrs["offset"], feat=lrs["feat"],
        scaling_log=lrs["scaling_log"], mlp_opacity=mlp_o, mlp_cov=mlp_cv,
        mlp_color=mlp_cl, appearance=app)


def adam_step(params: TrainableParams, grads: TrainableParams,
              opt_state: AdamState, lrs: TrainableParams,
              b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-15) -> tuple[TrainableParams, AdamState]:
    t = opt_state.t + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - b1 ** tf
    bc2 = 1.0 - b2 ** tf

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(opt_state.mu)
    flat_v = jax.tree.leaves(opt_state.nu)
    flat_lr = jax.tree.leaves(lrs)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        pn, mn, vn = upd(p, g, m, v, lr)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (jax.tree.unflatten(treedef, new_p),
            AdamState(mu=jax.tree.unflatten(treedef, new_m),
                      nu=jax.tree.unflatten(treedef, new_v), t=t))


def params_from_model(state_anchor, state_offset, state_feat,
                      state_scaling_log, mlps: MlpParams) -> TrainableParams:
    return TrainableParams(
        anchor=state_anchor, offset=state_offset, feat=state_feat,
        scaling_log=state_scaling_log, mlp_opacity=mlps.opacity,
        mlp_cov=mlps.cov, mlp_color=mlps.color, appearance=mlps.appearance)


def mlps_from_params(p: TrainableParams) -> MlpParams:
    return MlpParams(opacity=p.mlp_opacity, cov=p.mlp_cov,
                     color=p.mlp_color, appearance=p.appearance)
