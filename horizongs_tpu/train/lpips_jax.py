"""LPIPS (VGG-16) in pure JAX — TPU-native replacement of the vendored
`lpipsPyTorch/` metric (reference `lpipsPyTorch/modules/lpips.py`,
loaded at `train.py:50` and `metrics.py:151`).

The network is the standard LPIPS pipeline: images in [-1, 1] pass a
fixed shift/scale normalization, run through the VGG-16 feature stack,
and the five tap activations (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3) are channel-unit-normalized; squared differences are reduced by
learned 1x1 "linear" weights and averaged over space, then summed over
taps.

Pretrained weights cannot be downloaded in a zero-egress image, so they
load from an .npz produced by `tools/convert_lpips_weights.py` (run once
on any machine with torch + torchvision + the `lpips` pip package). The
search order is: explicit path -> $HGS_LPIPS_WEIGHTS -> ~/.cache/
horizongs_tpu/lpips_vgg.npz. `lpips_fn(...)` returns a jitted scorer or
None when no weights are found.

npz schema: conv kernels `conv{i}_w` (kh, kw, cin, cout) + `conv{i}_b`
for the 13 VGG convs in order, and `lin{j}_w` (C_j,) for the 5 taps.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG-16 feature stack: channel widths, "M" = 2x2 maxpool. Taps are the
# relu activations immediately before each pool + the final relu.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]
TAP_AFTER_CONV = (1, 3, 6, 9, 12)   # conv indices (0-based) of the taps
TAP_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling layer constants (images come in as [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

DEFAULT_CACHE = os.path.join(os.path.expanduser("~"), ".cache",
                             "horizongs_tpu", "lpips_vgg.npz")


def init_random_weights(seed: int = 0) -> dict:
    """Random weights with the correct shapes — for shape/pipeline tests
    only; scores are meaningless without the pretrained checkpoint."""
    rng = np.random.default_rng(seed)
    params = {}
    cin = 3
    i = 0
    for v in VGG16_CFG:
        if v == "M":
            continue
        params[f"conv{i}_w"] = rng.normal(
            0, np.sqrt(2.0 / (9 * cin)), (3, 3, cin, v)).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros(v, dtype=np.float32)
        cin = v
        i += 1
    for j, c in enumerate(TAP_CHANNELS):
        params[f"lin{j}_w"] = rng.uniform(0, 0.01, c).astype(np.float32)
    return params


def load_weights(path: Optional[str] = None) -> Optional[dict]:
    path = path or os.environ.get("HGS_LPIPS_WEIGHTS") or DEFAULT_CACHE
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _vgg_taps(params: dict, x: jnp.ndarray):
    """x: (N, H, W, 3) normalized input -> list of 5 tap activations."""
    taps = []
    i = 0
    for v in VGG16_CFG:
        if v == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            continue
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(params[f"conv{i}_w"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + jnp.asarray(params[f"conv{i}_b"])
        x = jax.nn.relu(x)
        if i in TAP_AFTER_CONV:
            taps.append(x)
        i += 1
    return taps


def lpips_distance(params: dict, img0: jnp.ndarray,
                   img1: jnp.ndarray) -> jnp.ndarray:
    """img0/img1: (N, H, W, 3) in [-1, 1] -> (N,) LPIPS distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    t0 = _vgg_taps(params, (img0 - shift) / scale)
    t1 = _vgg_taps(params, (img1 - shift) / scale)
    total = 0.0
    for j, (a, b) in enumerate(zip(t0, t1)):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2
        w = jnp.asarray(params[f"lin{j}_w"])
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total


def lpips_fn(path: Optional[str] = None, params: Optional[dict] = None):
    """Jitted (img0, img1) -> scalar scorer over [0,1]-range HWC images,
    or None when no weights are available. Signature-compatible with the
    torch fallback in `train/evaluate.py` when called on numpy images."""
    params = params if params is not None else load_weights(path)
    if params is None:
        return None

    @jax.jit
    def score(img0, img1):
        a = jnp.asarray(img0, jnp.float32)[None] * 2.0 - 1.0
        b = jnp.asarray(img1, jnp.float32)[None] * 2.0 - 1.0
        return lpips_distance(params, a, b)[0]

    return score
