from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams, init_mlps, mlp_apply
from horizongs_tpu.models.anchors import (
    AnchorState,
    DecodedGaussians,
    decode_neural_gaussians,
    anchor_lod_mask,
    init_anchor_state_from_points,
)
