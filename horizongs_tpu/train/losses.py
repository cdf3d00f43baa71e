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


def _filter2d_separable(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 11x11 gaussian blur of an HWC image (separable)."""
    H, W, C = img.shape
    k = window.shape[0]
    pad = k // 2
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    wrow = jnp.asarray(window).reshape(1, 1, 1, k)
    wcol = jnp.asarray(window).reshape(1, 1, k, 1)
    x = jax.lax.conv_general_dilated(x, wrow, (1, 1),
                                     [(0, 0), (pad, pad)])
    x = jax.lax.conv_general_dilated(x, wcol, (1, 1),
                                     [(pad, pad), (0, 0)])
    return jnp.moveaxis(x[:, 0], 0, -1)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Mean SSIM over an HWC pair, same window/constants as the reference."""
    w = jnp.asarray(_WINDOW)
    mu1 = _filter2d_separable(img1, w)
    mu2 = _filter2d_separable(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_separable(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter2d_separable(img2 * img2, w) - mu2_sq
    sigma12 = _filter2d_separable(img1 * img2, w) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


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
