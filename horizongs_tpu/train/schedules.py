"""Learning-rate schedules (Plenoxels-style log-lerp with delay warmup).

jnp port of `get_expon_lr_func` (`utils/general_utils.py:64-97`) so the
whole train step, including per-group LR computation, stays inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Continuous LR: lr_init at step 0, lr_final at max_steps, log-lerped.

    Returns 0 when both endpoints are 0 (parameter disabled) — same
    contract as the reference helper.
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    # guard log(0): endpoints are static floats, only one may be 0
    li = max(lr_init, 1e-32)
    lf = max(lr_final, 1e-32)
    log_lerp = jnp.exp(jnp.log(li) * (1 - t) + jnp.log(lf) * t)
    return delay_rate * log_lerp


def group_lrs(opt, step, spatial_lr_scale: float) -> dict:
    """All per-group LRs for one step (`training_setup`/`update_learning_rate`,
    `base_model.py:236-310`): anchor/offset scaled by spatial extent,
    feature/scaling/rotation constant, MLPs and appearance scheduled."""
    return {
        "anchor": expon_lr(step,
                           opt.position_lr_init * spatial_lr_scale,
                           opt.position_lr_final * spatial_lr_scale,
                           lr_delay_mult=opt.position_lr_delay_mult,
                           max_steps=opt.position_lr_max_steps),
        "offset": expon_lr(step,
                           opt.offset_lr_init * spatial_lr_scale,
                           opt.offset_lr_final * spatial_lr_scale,
                           lr_delay_mult=opt.offset_lr_delay_mult,
                           max_steps=opt.offset_lr_max_steps),
        "feat": jnp.asarray(opt.feature_lr, dtype=jnp.float32),
        "scaling_log": jnp.asarray(opt.scaling_lr, dtype=jnp.float32),
        "mlp_opacity": expon_lr(step, opt.mlp_opacity_lr_init,
                                opt.mlp_opacity_lr_final,
                                lr_delay_mult=opt.mlp_opacity_lr_delay_mult,
                                max_steps=opt.mlp_opacity_lr_max_steps),
        "mlp_cov": expon_lr(step, opt.mlp_cov_lr_init, opt.mlp_cov_lr_final,
                            lr_delay_mult=opt.mlp_cov_lr_delay_mult,
                            max_steps=opt.mlp_cov_lr_max_steps),
        "mlp_color": expon_lr(step, opt.mlp_color_lr_init,
                              opt.mlp_color_lr_final,
                              lr_delay_mult=opt.mlp_color_lr_delay_mult,
                              max_steps=opt.mlp_color_lr_max_steps),
        "appearance": expon_lr(step,
                               getattr(opt, "appearance_lr_init", 0.0),
                               getattr(opt, "appearance_lr_final", 0.0),
                               lr_delay_mult=getattr(opt, "appearance_lr_delay_mult", 0.01),
                               max_steps=getattr(opt, "appearance_lr_max_steps", 30000)),
    }
