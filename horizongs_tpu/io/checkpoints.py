"""Model checkpoint I/O: anchor PLYs, explicit PLYs, MLP weights, full
optimizer-state checkpoints.

File-format parity with the reference so its artifacts interoperate:
  * anchor PLY schema exactly matches `save_ply`/`load_ply`
    (`base_model.py:312-380`, `lod_model.py:374-464`): offsets stored
    transposed channel-major (f_offset_i = dim*k + offset), LOD adds
    level/extra_level columns + obj_info scalars standard_dist /
    aerial_levels / street_levels.
  * explicit PLY matches `save_explicit`/`load_explicit`
    (`base_model.py:566-697`): f_dc / f_rest channel-major, raw opacity,
    linear scales.
  * MLP checkpoints are .npz pytrees (replacing TorchScript traces).
  * full training checkpoints (capture/restore, which the reference
    ships broken — SURVEY.md §4) are a flat .npz of the whole
    TrainState pytree keyed by tree path.
"""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from horizongs_tpu.io.plyio import read_ply, write_ply
from horizongs_tpu.models.anchors import AnchorState, round_capacity
from horizongs_tpu.models.config import ModelConfig
from horizongs_tpu.models.mlp import MlpParams


# ---------------------------------------------------------------------------
# anchor PLY
# ---------------------------------------------------------------------------

def save_anchor_ply(path: str, cfg: ModelConfig, state: AnchorState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = int(state.n)
    k = state.n_offsets
    anchor = np.asarray(state.anchor[:n])
    offset = np.asarray(state.offset[:n])                  # (n, k, 3)
    offset_t = offset.transpose(0, 2, 1).reshape(n, 3 * k)  # channel-major
    feat = np.asarray(state.feat[:n])
    scaling = np.asarray(state.scaling_log[:n])
    rot = np.asarray(state.rotation[:n])

    props = {"x": anchor[:, 0], "y": anchor[:, 1], "z": anchor[:, 2]}
    obj_info = [f"num_anchor {n:.6f}"]
    if cfg.is_lod:
        props["level"] = np.asarray(state.level[:n]).astype(np.float32)
        props["extra_level"] = np.asarray(state.extra_level[:n])
        obj_info = [f"standard_dist {cfg.standard_dist:.6f}",
                    f"aerial_levels {cfg.aerial_levels:.6f}",
                    f"street_levels {cfg.street_levels:.6f}"]
    for i in range(3 * k):
        props[f"f_offset_{i}"] = offset_t[:, i]
    for i in range(feat.shape[1]):
        props[f"f_anchor_feat_{i}"] = feat[:, i]
    for i in range(6):
        props[f"scale_{i}"] = scaling[:, i]
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    write_ply(path, props, obj_info)


def _sorted_cols(props: dict, prefix: str) -> np.ndarray:
    names = sorted((k for k in props if k.startswith(prefix)),
                   key=lambda s: int(s.split("_")[-1]))
    return np.stack([props[k] for k in names], axis=1).astype(np.float32)


def load_anchor_ply(path: str, cfg: ModelConfig,
                    capacity: Optional[int] = None
                    ) -> Tuple[AnchorState, dict]:
    """Returns (state, obj_info dict). obj_info carries the LOD scalars —
    callers should fold them back into the config."""
    props, info_lines = read_ply(path)
    info = {}
    for line in info_lines:
        key, val = line.split()[0], line.split()[1]
        info[key] = float(val)

    anchor = np.stack([props["x"], props["y"], props["z"]], axis=1).astype(np.float32)
    n = anchor.shape[0]
    offsets = _sorted_cols(props, "f_offset_")
    k = offsets.shape[1] // 3
    offsets = offsets.reshape(n, 3, k).transpose(0, 2, 1)  # back to (n, k, 3)
    feat = _sorted_cols(props, "f_anchor_feat_")
    scaling = _sorted_cols(props, "scale_")
    rot = _sorted_cols(props, "rot_")
    level = props.get("level")
    level = (np.zeros(n, np.int32) if level is None
             else np.asarray(level).astype(np.int32))
    extra = props.get("extra_level")
    extra = (np.zeros(n, np.float32) if extra is None
             else np.asarray(extra).astype(np.float32))

    C = capacity or round_capacity(n)

    def pad(a):
        out = np.zeros((C,) + a.shape[1:], dtype=a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    rot_pad = np.zeros((C, 4), np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rot
    state = AnchorState(anchor=pad(anchor), offset=pad(offsets),
                        feat=pad(feat), scaling_log=pad(scaling),
                        rotation=jnp.asarray(rot_pad), level=pad(level),
                        extra_level=pad(extra),
                        n=jnp.asarray(n, dtype=jnp.int32))
    return state, info


# ---------------------------------------------------------------------------
# explicit PLY
# ---------------------------------------------------------------------------

def explicit_ply_props(cfg: ModelConfig, arrays: dict
                       ) -> Tuple[dict, list]:
    """Explicit-gaussian arrays -> (ordered PLY props, obj_info) in the
    reference's schema (`base_model.py:566-697`: f_dc/f_rest
    channel-major, raw opacity, linear scales). Shared by the one-shot
    writer and the streaming chunk merger."""
    xyz = arrays["xyz"]
    n = xyz.shape[0]
    feats = arrays["features"]                     # (n, K, 3)
    f_dc = feats[:, 0:1, :].transpose(0, 2, 1).reshape(n, 3)
    f_rest = feats[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    props = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
    obj_info = []
    if cfg.is_lod:
        props["level"] = arrays["level"].astype(np.float32)
        props["extra_level"] = arrays["extra_level"]
        obj_info = [f"standard_dist {cfg.standard_dist:.6f}",
                    f"aerial_levels {cfg.aerial_levels:.6f}",
                    f"street_levels {cfg.street_levels:.6f}"]
    for i in range(3):
        props[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i]
    props["opacity"] = arrays["opacity"]
    for i in range(3):
        props[f"scale_{i}"] = arrays["scaling"][:, i]
    for i in range(4):
        props[f"rot_{i}"] = arrays["rotation"][:, i]
    return props, obj_info


def save_explicit_ply(path: str, cfg: ModelConfig, arrays: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    props, obj_info = explicit_ply_props(cfg, arrays)
    write_ply(path, props, obj_info)


def load_explicit_ply(path: str) -> Tuple[dict, dict]:
    props, info_lines = read_ply(path)
    info = {}
    for line in info_lines:
        parts = line.split()
        info[parts[0]] = float(parts[1])
    xyz = np.stack([props["x"], props["y"], props["z"]], axis=1).astype(np.float32)
    n = xyz.shape[0]
    f_dc = np.stack([props["f_dc_0"], props["f_dc_1"], props["f_dc_2"]],
                    axis=1).astype(np.float32)[:, None, :]     # (n, 1, 3)
    rest = _sorted_cols(props, "f_rest_")
    K_rest = rest.shape[1] // 3
    # stored channel-major: (n, 3, K_rest) -> (n, K_rest, 3)
    rest = rest.reshape(n, 3, K_rest).transpose(0, 2, 1)
    feats = np.concatenate([f_dc.transpose(0, 1, 2), rest], axis=1)
    arrays = {
        "xyz": xyz,
        "features": feats.astype(np.float32),
        "opacity": np.asarray(props["opacity"]).astype(np.float32),
        "scaling": _sorted_cols(props, "scale_"),
        "rotation": _sorted_cols(props, "rot_"),
    }
    if "level" in props:
        arrays["level"] = np.asarray(props["level"]).astype(np.int32)
        arrays["extra_level"] = np.asarray(props["extra_level"]).astype(np.float32)
    else:
        arrays["level"] = np.zeros(n, np.int32)
        arrays["extra_level"] = np.zeros(n, np.float32)
    return arrays, info


# ---------------------------------------------------------------------------
# MLP weights + full checkpoints (flat npz of pytrees)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif hasattr(tree, "_fields"):
        for k in tree._fields:
            out.update(_flatten(getattr(tree, k), f"{prefix}{k}/"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_mlp_checkpoints(dirpath: str, mlps: MlpParams) -> None:
    os.makedirs(dirpath, exist_ok=True)
    np.savez(os.path.join(dirpath, "mlps.npz"),
             **_flatten({"opacity": mlps.opacity, "cov": mlps.cov,
                         "color": mlps.color,
                         **({"appearance": mlps.appearance}
                            if mlps.appearance is not None else {})}))


def load_mlp_checkpoints(dirpath: str) -> MlpParams:
    z = np.load(os.path.join(dirpath, "mlps.npz"))

    def layer(name):
        return {"l1": {"w": jnp.asarray(z[f"{name}/l1/w"]),
                       "b": jnp.asarray(z[f"{name}/l1/b"])},
                "l2": {"w": jnp.asarray(z[f"{name}/l2/w"]),
                       "b": jnp.asarray(z[f"{name}/l2/b"])}}
    appearance = (jnp.asarray(z["appearance"]) if "appearance" in z.files
                  else None)
    return MlpParams(opacity=layer("opacity"), cov=layer("cov"),
                     color=layer("color"), appearance=appearance)


def save_train_checkpoint(path: str, state, iteration: int) -> None:
    """Full capture(): params + moments + stats + counters, one npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    flat["__iteration__"] = np.asarray(iteration)
    np.savez(path, **flat)


def load_train_checkpoint(path: str, template):
    """restore(): rebuild a TrainState shaped like `template`."""
    z = np.load(path)

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if hasattr(tree, "_fields"):
            return type(tree)(*(rebuild(getattr(tree, k), f"{prefix}{k}/")
                                for k in tree._fields))
        if tree is None:
            return None
        return jnp.asarray(z[prefix.rstrip("/")])
    state = rebuild(template)
    return state, int(z["__iteration__"])


def save_sharded_checkpoint(path: str, state, iteration: int) -> None:
    """Sharded pytree checkpoint (orbax/OCDBT): every device writes its
    own parameter shards directly — no host gather, no single 1-GB npz.
    This is the SURVEY §5 "orbax-style sharded pytree checkpoints" item:
    at city scale (10^6+ anchors) the npz path first pulls the entire
    state through host memory, which costs ~a minute per save over a
    remote-accelerator transport; the sharded writer is bounded by
    per-device shard size and works multi-host. `path` is a directory."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"state": state, "iteration": np.asarray(iteration)}
    ckptr.save(path, args=ocp.args.PyTreeSave(payload), force=True)
    ckptr.close()


def sharded_checkpoint_capacity(path: str) -> int:
    """Padded anchor capacity stored in a sharded checkpoint, read from
    orbax metadata without restoring anything — resume code uses it to
    decide whether the trainer's state template must be re-padded (the
    normal case after any densify capacity growth)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(os.path.abspath(path)).item_metadata.tree
    ckptr.close()
    return int(tree["state"]["params"]["anchor"].shape[0])


def _adapt_template(tmpl, stored):
    """Swap template leaves whose shape differs from the stored array's
    for ShapeDtypeStructs at the STORED shape (keeping the template's
    sharding): orbax refuses shape mismatches on jax.Array leaves
    ('Truncating/padding is disabled'), so a resume after densify
    capacity growth must restore at the checkpoint's own capacity.
    numpy-template leaves already restore at the stored shape."""
    if tmpl is None:
        return None
    if isinstance(tmpl, dict):
        return {k: _adapt_template(v, stored[k]) for k, v in tmpl.items()}
    if hasattr(tmpl, "_fields"):
        return type(tmpl)(*(_adapt_template(getattr(tmpl, f), stored[f])
                            for f in tmpl._fields))
    shape = tuple(stored.shape)
    if not isinstance(tmpl, jax.Array) or tuple(tmpl.shape) == shape:
        return tmpl
    return jax.ShapeDtypeStruct(shape, tmpl.dtype, sharding=tmpl.sharding)


def load_sharded_checkpoint(path: str, template):
    """Restore a sharded checkpoint into the template's structure AND
    placement: leaves come back with the template's sharding (so a mesh
    run resumes sharded without ever materializing the full table on one
    host). Capacity-adaptive: leaves whose padded (anchor) dims differ
    from the stored shapes restore at the STORED capacity — the returned
    state's capacity is the checkpoint's, not the template's, and callers
    on a mesh must re-pad if it no longer divides the model axis.
    Returns (state, iteration)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    stored = ckptr.metadata(path).item_metadata.tree
    template = _adapt_template(template, stored["state"])
    payload_t = {"state": template, "iteration": np.asarray(0)}
    restore_args = ocp.checkpoint_utils.construct_restore_args(payload_t)
    out = ckptr.restore(path,
                        args=ocp.args.PyTreeRestore(
                            item=payload_t, restore_args=restore_args))
    ckptr.close()
    return out["state"], int(np.asarray(out["iteration"]))


def search_max_iteration(point_cloud_dir: str) -> int:
    """`searchForMaxIteration` (`utils/system_utils.py:26-28`)."""
    best = -1
    if not os.path.isdir(point_cloud_dir):
        return best
    for name in os.listdir(point_cloud_dir):
        m = re.match(r"iteration_(\d+)", name)
        if m:
            best = max(best, int(m.group(1)))
    return best
