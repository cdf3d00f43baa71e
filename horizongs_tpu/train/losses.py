"""Losses: L1, gaussian-window SSIM, and the full assembly.

Numerics match the reference: `utils/loss_utils.py:17-60` (11x11 gaussian
window, sigma 1.5) and the training-loop assembly `train.py:158-204`:

  total = (1-λ_dssim)·L1 + λ_dssim·(1-SSIM)
        + λ_dreg · mean(prod(scaling))                    [visible gaussians]
        + λ_sky_opa · mean(-(1-sky)·log(1-α))
        + λ_opacity_entropy · mean(-α·log α)
        + λ_normal · mean((1 - n·n_depth)·alpha_mask)     [2DGS, gated]
        + λ_dist · mean(distort·alpha_mask)               [2DGS, gated]
        + w_depth(it) · mean(|1/D - invdepth_mono|·mask)  [gated]

Images are HWC float32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


_WINDOW = _gaussian_window()


def _trunc_bf16(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _dot3(a, b, dims):
    """~f32-accurate dot from three default-precision passes (bf16x3
    split) — TPU MXU matmuls round operands to bf16 at DEFAULT, and
    HIGHEST costs 2x this."""
    import functools
    a_hi, b_hi = _trunc_bf16(a), _trunc_bf16(b)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b - b_hi) + d(a - a_hi, b_hi)


def _blur_band(n: int, sigma: float = 1.5, k: int = 11) -> jnp.ndarray:
    """(n, n) banded gaussian-blur matrix, zero padded at the borders —
    exactly the separable depthwise conv the reference uses, expressed
    as a matmul so it runs on the MXU (a (C,1,H,W) depthwise conv at
    1080p costs ~18 ms on TPU; two banded matmuls cost ~3 ms). Built
    from iota on device: no multi-MB weight constants in the
    executable."""
    pad = k // 2
    xs = np.arange(k) - pad
    norm = float(np.exp(-(xs ** 2) / (2 * sigma ** 2)).sum())
    d = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
         - jax.lax.broadcasted_iota(jnp.int32, (n, n), 0))
    g = jnp.exp(-(d.astype(jnp.float32) ** 2) / (2 * sigma ** 2))
    return jnp.where(jnp.abs(d) <= pad, g, 0.0) / norm


def _blur5(img1: jnp.ndarray, img2: jnp.ndarray):
    """Gaussian-blur the five SSIM moment images in one batched pair of
    banded matmuls. Returns (mu1, mu2, m11, m22, m12), each HWC."""
    H, W, C = img1.shape
    X = jnp.concatenate([img1, img2, img1 * img1, img2 * img2,
                         img1 * img2], axis=-1)            # (H, W, 5C)
    Bw = _blur_band(W)
    Bh = _blur_band(H)
    Y = _dot3(X, Bw, (((1,), (0,)), ((), ())))             # (H, 5C, W)
    Z = _dot3(Y, Bh, (((0,), (0,)), ((), ())))             # (5C, W, H)
    Z = jnp.transpose(Z, (2, 1, 0))                        # (H, W, 5C)
    return jnp.split(Z, 5, axis=-1)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Per-pixel SSIM map of an HWC pair (11x11 gaussian window)."""
    mu1, mu2, m11, m22, m12 = _blur5(img1, img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu12
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Mean SSIM over an HWC pair, same window/constants as the reference."""
    return jnp.mean(ssim_map(img1, img2, c1, c2))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.clip(mse, 1e-12, None)))


def assemble_loss(opt, render_pkg: dict, gt_image: jnp.ndarray,
                  alpha_mask: Optional[jnp.ndarray],
                  invdepth_mono: Optional[jnp.ndarray],
                  depth_mask: Optional[jnp.ndarray],
                  iteration: jnp.ndarray,
                  depth_weight: jnp.ndarray,
                  render_mode: str) -> tuple[jnp.ndarray, dict]:
    """Full training loss (train.py:158-204). `opt` is the optim-params
    namespace; gating on iteration uses jnp.where so the step stays jittable.
    Returns (loss, aux dict)."""
    image = render_pkg["render"]
    alpha = render_pkg["render_alphas"]
    if alpha_mask is None:
        alpha_mask = jnp.ones_like(image[..., :1])
    image = image * alpha_mask
    gt = gt_image * alpha_mask

    ll1 = l1_loss(image, gt)
    ssim_val = ssim(image, gt)
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim_val)

    aux = {"l1": ll1, "ssim": ssim_val}

    if getattr(opt, "lambda_dreg", 0.0) > 0:
        scaling = render_pkg["scaling"]
        sel = render_pkg["selection_mask"]
        # mean over *selected* gaussians of prod(scaling) — masked mean
        prod = jnp.prod(scaling, axis=-1) * sel
        denom = jnp.clip(jnp.sum(sel), 1.0, None)
        loss = loss + opt.lambda_dreg * jnp.sum(prod) / denom

    if getattr(opt, "lambda_sky_opa", 0.0) > 0:
        o = jnp.clip(alpha, 1e-6, 1 - 1e-6)
        sky = alpha_mask
        loss = loss + opt.lambda_sky_opa * jnp.mean(-(1 - sky) * jnp.log(1 - o))

    if getattr(opt, "lambda_opacity_entropy", 0.0) > 0:
        o = jnp.clip(alpha, 1e-6, 1 - 1e-6)
        loss = loss + opt.lambda_opacity_entropy * jnp.mean(-o * jnp.log(o))

    if getattr(opt, "lambda_normal", 0.0) > 0 and "render_normals" in render_pkg:
        normals = render_pkg["render_normals"]                       # (H,W,3)
        nfd = render_pkg["render_normals_from_depth"]
        nfd = nfd * jax.lax.stop_gradient(alpha)
        n_err = (1.0 - jnp.sum(normals * nfd, axis=-1, keepdims=True))
        normal_loss = jnp.mean(n_err * alpha_mask)
        gate = (iteration > opt.normal_start_iter).astype(jnp.float32)
        loss = loss + opt.lambda_normal * gate * normal_loss

    if getattr(opt, "lambda_dist", 0.0) > 0 and "render_distort" in render_pkg:
        dist_loss = jnp.mean(render_pkg["render_distort"] * alpha_mask)
        gate = (iteration > opt.dist_start_iter).astype(jnp.float32)
        loss = loss + opt.lambda_dist * gate * dist_loss

    ll1depth = jnp.asarray(0.0)
    if invdepth_mono is not None and render_mode in ("RGB+D", "RGB+ED"):
        rdepth = render_pkg["render_depth"]
        inv = jnp.where(rdepth > 0.0, 1.0 / jnp.clip(rdepth, 1e-8, None), 0.0)
        dmask = depth_mask if depth_mask is not None else jnp.ones_like(inv)
        pure = jnp.mean(jnp.abs((inv - invdepth_mono) * dmask))
        gate = (iteration > opt.start_depth).astype(jnp.float32)
        ll1depth = depth_weight * gate * pure
        loss = loss + ll1depth

    aux["depth_l1"] = ll1depth
    aux["total"] = loss
    return loss, aux


def assemble_loss_band(opt, patch_pkg: dict, gt_patch: jnp.ndarray,
                       alpha_mask_patch: jnp.ndarray,
                       invdepth_patch: Optional[jnp.ndarray],
                       depth_mask_patch: Optional[jnp.ndarray],
                       iteration: jnp.ndarray,
                       depth_weight: jnp.ndarray, render_mode: str,
                       interior: jnp.ndarray,
                       height: int, width: int):
    """Band-local contribution to the full-image training loss.

    The tile-band-sharded step computes each loss term on this device's
    band only (extended with an `exchange_halo` strip so SSIM windows and
    depth-normal differences see real neighbor rows) — the global loss is
    then `const + psum(contrib) + dreg(num/den)` with NO device holding
    the full image and no replicated loss FLOPs. Every term reduces to a
    masked interior sum divided by the full-image denominator, so the
    psum-ed total is bit-comparable to `assemble_loss` on the gathered
    image (halo rows carry the same values the full image would).

    patch_pkg: render / render_alphas (+2DGS: render_normals,
    render_normals_from_depth, render_distort) as (Hp, W, C) patches.
    `interior` (Hp, 1, 1): 1.0 exactly on this band's real image rows.
    Returns (contrib, const, sums) — `sums` holds the quantities that
    need a psum before becoming aux metrics (l1_sum, ssim_sum, mse_sum,
    depth_sum)."""
    image = patch_pkg["render"]
    alpha = patch_pkg["render_alphas"]
    image = image * alpha_mask_patch
    gt = gt_patch * alpha_mask_patch

    D_px = float(height * width)
    D_c = D_px * image.shape[-1]

    l1_sum = jnp.sum(jnp.abs(image - gt) * interior)
    ssim_sum = jnp.sum(ssim_map(image, gt) * interior)
    mse_sum = jnp.sum((image - gt) ** 2 * interior)

    contrib = ((1.0 - opt.lambda_dssim) * l1_sum / D_c
               - opt.lambda_dssim * ssim_sum / D_c)
    const = opt.lambda_dssim * 1.0

    if getattr(opt, "lambda_sky_opa", 0.0) > 0:
        o = jnp.clip(alpha, 1e-6, 1 - 1e-6)
        sky = alpha_mask_patch
        contrib = contrib + opt.lambda_sky_opa * jnp.sum(
            -(1 - sky) * jnp.log(1 - o) * interior) / D_px

    if getattr(opt, "lambda_opacity_entropy", 0.0) > 0:
        o = jnp.clip(alpha, 1e-6, 1 - 1e-6)
        contrib = contrib + opt.lambda_opacity_entropy * jnp.sum(
            -o * jnp.log(o) * interior) / D_px

    if (getattr(opt, "lambda_normal", 0.0) > 0
            and "render_normals" in patch_pkg):
        normals = patch_pkg["render_normals"]
        nfd = patch_pkg["render_normals_from_depth"]
        nfd = nfd * jax.lax.stop_gradient(alpha)
        n_err = (1.0 - jnp.sum(normals * nfd, axis=-1, keepdims=True))
        gate = (iteration > opt.normal_start_iter).astype(jnp.float32)
        contrib = contrib + opt.lambda_normal * gate * jnp.sum(
            n_err * alpha_mask_patch * interior) / D_px

    if (getattr(opt, "lambda_dist", 0.0) > 0
            and "render_distort" in patch_pkg):
        gate = (iteration > opt.dist_start_iter).astype(jnp.float32)
        contrib = contrib + opt.lambda_dist * gate * jnp.sum(
            patch_pkg["render_distort"] * alpha_mask_patch * interior) / D_px

    depth_sum = jnp.asarray(0.0)
    if invdepth_patch is not None and render_mode in ("RGB+D", "RGB+ED"):
        rdepth = patch_pkg["render_depth"]
        inv = jnp.where(rdepth > 0.0,
                        1.0 / jnp.clip(rdepth, 1e-8, None), 0.0)
        dmask = (depth_mask_patch if depth_mask_patch is not None
                 else jnp.ones_like(inv))
        gate = (iteration > opt.start_depth).astype(jnp.float32)
        depth_sum = depth_weight * gate * jnp.sum(
            jnp.abs((inv - invdepth_patch) * dmask) * interior) / D_px
        contrib = contrib + depth_sum

    sums = {"l1_sum": l1_sum, "ssim_sum": ssim_sum, "mse_sum": mse_sum,
            "depth_sum": depth_sum}
    return contrib, const, sums
