"""Model/TrainState assembly helpers shared by Scene, trainer, and tests."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.models.anchors import AnchorState
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams, init_mlps
from horizongs_tpu.train.optim import TrainableParams, init_adam
from horizongs_tpu.train.step import TrainState, init_stats


def make_train_state(cfg: ModelConfig, state: AnchorState,
                     mlps: MlpParams) -> TrainState:
    params = TrainableParams(
        anchor=state.anchor, offset=state.offset, feat=state.feat,
        scaling_log=state.scaling_log, mlp_opacity=mlps.opacity,
        mlp_cov=mlps.cov, mlp_color=mlps.color, appearance=mlps.appearance)
    return TrainState(params=params, rotation=state.rotation,
                      level=state.level, extra_level=state.extra_level,
                      n=state.n, opt=init_adam(params),
                      stats=init_stats(state.capacity, cfg.n_offsets))


def new_mlps(cfg: ModelConfig, num_cameras: int = 0,
             seed: int = 0) -> MlpParams:
    return init_mlps(jax.random.PRNGKey(seed), cfg.feat_dim, cfg.view_dim,
                     cfg.appearance_dim, cfg.n_offsets, cfg.color_dim,
                     num_cameras=num_cameras)


def base_copies(state: AnchorState) -> dict:
    """Host-side copies of the live rows for fine-stage rollback
    (`create_from_pretrained` base_* params, `lod_model.py:657-661`)."""
    n = int(state.n)
    return {
        "anchor": np.asarray(state.anchor[:n]).copy(),
        "offset": np.asarray(state.offset[:n]).copy(),
        "feat": np.asarray(state.feat[:n]).copy(),
        "scaling_log": np.asarray(state.scaling_log[:n]).copy(),
        "rotation": np.asarray(state.rotation[:n]).copy(),
    }
