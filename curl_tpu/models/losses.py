"""The five-term multi-color-space CURL training loss.

Reference: `CURLLoss` (/root/reference/model.py:35-118). Terms, all masked:
  1. RGB L1, sum-normalized by channels x unmasked-pixel count
     (model.py:89-92).
  2. RGB cosine-similarity loss; masked pixels count as similarity 1
     (model.py:94-97 — the reference adds `logical_not(mask)` to the cosine
     map; since masked pixels have zero vectors and hence cosine 0, the
     scalar equals `1 - mean(cos) - mean(1-mask)`, which we compute
     directly).
  3. Lab L1 after rgb->lab conversion and [0,1] clamp (model.py:53-56,
     99-101).
  4. MS-SSIM on the Lab L channel only, weight 10 (model.py:103-105,115).
     Note the reference ctor takes `ssim_window_size=5` but never forwards
     it, so its SSIM always runs with window 11 (model.py:49 vs
     metric.py:76); our default replicates the *actual* behavior (11) and
     the parameter genuinely works.
  5. HSV L1 in hue-cone coordinates (V*S*cos 2piH, V*S*sin 2piH, V)
     (model.py:62-75,107-109).
Total = (sum of terms with SSIM weighted 10) / 5 (model.py:111-116).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from curl_tpu.ops import color, ssim as ssim_ops

_COS_EPS = 1e-8  # torch F.cosine_similarity default eps


def _safe_norm(x: Array) -> Array:
    """Channel-dim L2 norm whose gradient at the zero vector is 0 instead of
    NaN (sqrt'(0) guard — masked pixels are exactly zero)."""
    sq = jnp.sum(x * x, axis=-1)
    safe = jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq))
    return jnp.where(sq == 0.0, 0.0, safe)


def cosine_similarity_map(a: Array, b: Array) -> Array:
    """Channel-dim cosine similarity per pixel with torch's eps clamping:
    dot / max(|a||b|, eps). Zero vectors map to 0. (B,H,W,C) -> (B,H,W)."""
    dot = jnp.sum(a * b, axis=-1)
    denom = _safe_norm(a) * _safe_norm(b)
    return dot / jnp.maximum(denom, _COS_EPS)


def hsv_cone(img_rgb: Array) -> Array:
    """RGB -> hue-cone embedding used by the HSV loss term
    (reference `batch_hsv_convert`, model.py:62-75)."""
    hsv = jnp.clip(color.rgb_to_hsv(img_rgb), 0.0, 1.0)
    hue = 2.0 * jnp.pi * hsv[..., 0]
    sat = hsv[..., 1]
    val = hsv[..., 2]
    return jnp.stack(
        [val * sat * jnp.cos(hue), val * sat * jnp.sin(hue), val], axis=-1
    )


@partial(jax.jit, static_argnames=("ssim_window_size",))
def curl_loss(
    predicted: Array,
    target: Array,
    mask: Array,
    ssim_window_size: int = 11,
) -> Array:
    """Scalar CURL loss. `predicted`/`target` are (B,H,W,3) RGB in [0,1];
    `mask` is (B,H,W,1) in {0,1} (bool or float)."""
    mask = mask.astype(predicted.dtype)
    channels = predicted.shape[-1]
    # Global (not per-image) unmasked-pixel normalizer, as the reference
    # (model.py:89).
    unmasked = channels * jnp.sum(mask)
    pred = predicted * mask
    tgt = target * mask

    rgb_l1 = jnp.sum(jnp.abs(pred - tgt)) / unmasked

    cos = cosine_similarity_map(pred, tgt)
    cosine_loss = 1.0 - jnp.mean(cos) - jnp.mean(1.0 - mask)

    pred_lab = jnp.clip(color.rgb_to_lab(pred), 0.0, 1.0)
    tgt_lab = jnp.clip(color.rgb_to_lab(tgt), 0.0, 1.0)
    lab_l1 = jnp.sum(jnp.abs(pred_lab - tgt_lab)) / unmasked

    ssim_val = ssim_ops.ms_ssim(
        pred_lab[..., 0:1], tgt_lab[..., 0:1], window_size=ssim_window_size
    )
    ssim_loss = jnp.mean(1.0 - ssim_val)

    hsv_l1 = jnp.sum(jnp.abs(hsv_cone(pred) - hsv_cone(tgt))) / unmasked

    return (rgb_l1 + cosine_loss + lab_l1 + hsv_l1 + 10.0 * ssim_loss) / 5.0
