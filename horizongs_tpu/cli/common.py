"""Shared CLI plumbing: config loading, logging, output dirs."""
from __future__ import annotations

import logging
import os

from horizongs_tpu.config import load_yaml, parse_cfg
from horizongs_tpu.models.config import ModelConfig


def get_logger(name: str, model_path: str | None = None):
    """File+console logger (`train.py:671-687`)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers = []
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(sh)
    if model_path:
        os.makedirs(model_path, exist_ok=True)
        fh = logging.FileHandler(os.path.join(model_path, "outputs.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
    return logger


def load_config(path: str, model_path_override: str | None = None):
    """YAML -> (lp, op, pp, cfg). Fills model_path from dataset/scene
    names when absent (mirrors reference output layout outputs/<ds>/<scene>)."""
    raw = load_yaml(path)
    lp, op, pp = parse_cfg(raw)
    cfg = ModelConfig.from_dict(lp.model_config)
    if model_path_override:
        lp.model_path = model_path_override
    elif not getattr(lp, "model_path", ""):
        lp.model_path = os.path.join("outputs", str(lp.dataset_name),
                                     str(lp.scene_name))
    return lp, op, pp, cfg
