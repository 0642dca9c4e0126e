"""Masked evaluation metrics: PSNR and MS-SSIM.

Reference: /root/reference/metric.py. PSNR uses a masked MSE normalized by
the per-image unmasked-pixel count times channels (metric.py:35-47); images
whose mask is empty produce NaN and are excluded from the batch mean
(`nanmean`, metric.py:66-68). The MS-SSIM metric is `ops.ssim.ms_ssim`
applied to mask-multiplied images, matching the evaluator's usage
(evaluate.py:104-105).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from curl_tpu.ops import ssim as ssim_ops


@jax.jit
def psnr_per_image(img_a: Array, img_b: Array, mask: Array, max_intensity: float = 1.0) -> Array:
    """Per-image masked PSNR in dB: (B,H,W,C) x2, (B,H,W,1) -> (B,).
    All-masked images yield NaN (0/0), as the reference (metric.py:47,63)."""
    img_a = jnp.clip(img_a, 0.0, 1.0)
    img_b = jnp.clip(img_b, 0.0, 1.0)
    mask = mask.astype(img_a.dtype)
    a, b = img_a * mask, img_b * mask
    channels = img_a.shape[-1]
    unmasked = channels * jnp.sum(mask[..., 0], axis=(1, 2))
    mse = jnp.sum((a - b) ** 2, axis=(1, 2, 3)) / unmasked
    return 10.0 * jnp.log10(max_intensity**2 / mse)


def psnr(img_a: Array, img_b: Array, mask: Array, max_intensity: float = 1.0) -> Array:
    """Batch-mean masked PSNR ignoring NaN entries (reference
    `compute_psnr`, metric.py:50-68). Returns NaN if every image is fully
    masked — callers treat NaN as "no measurement" (the reference returns
    None there)."""
    return jnp.nanmean(psnr_per_image(img_a, img_b, mask, max_intensity))


@partial(jax.jit, static_argnames=("window_size",))
def masked_ms_ssim(img_a: Array, img_b: Array, mask: Array, window_size: int = 11) -> Array:
    """Batch-mean MS-SSIM of mask-multiplied images — the evaluator's metric
    (reference evaluate.py:104-105)."""
    mask = mask.astype(img_a.dtype)
    return jnp.mean(
        ssim_ops.ms_ssim(img_a * mask, img_b * mask, window_size=window_size)
    )
