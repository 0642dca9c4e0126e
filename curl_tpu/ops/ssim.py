"""Differentiable SSIM / multi-scale SSIM over NHWC images.

Gaussian-window SSIM via depthwise convolution (the TPU-native equivalent of
the reference's grouped `F.conv2d` pyramid, /root/reference/metric.py:75-211),
doubling as both an eval metric and the loss's SSIM term.

Faithfully reproduced reference behaviors:
  * Gaussian window, sigma=1.5, zero padding of window_size//2
    (metric.py:98-103,130-146).
  * 5-level pyramid via non-overlapping 2x2 average pooling with weights
    [0.0448, 0.2856, 0.3001, 0.2363, 0.1333] (metric.py:78,185-193).
  * The non-standard "simple normalize": ssim and cs maps mapped through
    (x+1)/2 before weighting (metric.py:198-201).
  * The final combination `prod(mcs[:, :-1]**w[:-1] * (ssim[:, -1]**w[-1]),
    axis=1)` — note the broadcast raises the last-level ssim term to the 4th
    power of its weight, exactly as the reference does (metric.py:203-207).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@lru_cache(maxsize=None)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian tap vector (reference metric.py:87-117 builds
    its 2-D window as the outer product of exactly this vector)."""
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    return g / g.sum()


@lru_cache(maxsize=None)
def _blur_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded Toeplitz matrix M with (x @ M)[v] = sum_u g[u-v+pad] x[u]
    — exactly the zero-padded 'same' 1-D convolution `_depthwise_blur`
    computes, expressed as a matmul."""
    g = _gaussian_1d(window_size, sigma)
    pad = window_size // 2
    m = np.zeros((n, n), np.float32)
    for t in range(window_size):
        off = t - pad  # u - v
        m += np.eye(n, k=-off, dtype=np.float32) * g[t]
    return m


# Above this edge length the dense (n, n) blur matrices get heavy (4K -> 64 MB
# each) and the depthwise-conv form wins on memory; below it the matmul form
# wins by a mile on the MXU (1-channel depthwise convs waste 127/128 lanes,
# and their backward is the measured 50 ms of the 69.6 ms train step).
_MATMUL_BLUR_MAX_DIM = 2048


def _matmul_blur(img: Array, window_size: int, sigma: float) -> Array:
    """Separable Gaussian blur as two banded-matrix matmuls (H then W).

    Identical math to `_depthwise_blur` (same taps, same zero padding) in a
    shape the MXU tiles natively: (B*W*C, H) @ (H, H) and (B*H*C, W) @ (W, W).
    The backward is the transposed matmuls instead of conv grads. HIGHEST
    precision keeps the metric exact regardless of the session's global
    matmul-precision setting (taps sum to 1; inputs are [0,1] images)."""
    hi = jax.lax.Precision.HIGHEST
    n_h, n_w = img.shape[1], img.shape[2]
    mh = jnp.asarray(_blur_matrix(n_h, window_size, sigma), img.dtype)
    mw = jnp.asarray(_blur_matrix(n_w, window_size, sigma), img.dtype)
    out = jnp.einsum("bhwc,hu->buwc", img, mh, precision=hi)
    return jnp.einsum("bhwc,wv->bhvc", out, mw, precision=hi)


def _blur(img: Array, window_size: int, sigma: float) -> Array:
    # The matmul form trades ~n/(2*window) more FLOPs for MXU shape — a
    # huge win on accelerators, a plain slowdown on CPU where the separable
    # conv is already cheap. Trace-time backend check; both forms are
    # value-identical (pinned by test).
    if (
        jax.default_backend() != "cpu"
        and max(img.shape[1], img.shape[2]) <= _MATMUL_BLUR_MAX_DIM
    ):
        return _matmul_blur(img, window_size, sigma)
    return _depthwise_blur(img, window_size, sigma)


def _depthwise_blur(img: Array, window_size: int, sigma: float) -> Array:
    """Separable Gaussian blur: the reference's 2-D window is an outer
    product (metric.py:98-103), so two 1-D depthwise convs compute the same
    sums with W+W taps/pixel instead of W*W. Fallback for very large images
    (see `_MATMUL_BLUR_MAX_DIM`); the matmul form carries the training
    loss."""
    c = img.shape[-1]
    g = _gaussian_1d(window_size, sigma)
    pad = window_size // 2
    kh = jnp.asarray(np.tile(g[:, None, None, None], (1, 1, 1, c)), dtype=img.dtype)
    kw = jnp.asarray(np.tile(g[None, :, None, None], (1, 1, 1, c)), dtype=img.dtype)
    out = jax.lax.conv_general_dilated(
        img, kh, window_strides=(1, 1), padding=[(pad, pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        out, kw, window_strides=(1, 1), padding=[(0, 0), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(
    img1: Array,
    img2: Array,
    window_size: int = 11,
    sigma: float = 1.5,
) -> tuple[Array, Array]:
    """Single-scale SSIM. Returns per-image (ssim_mean, contrast_structure)
    both shaped (B,) (reference `compute_ssim`, metric.py:119-160)."""
    # One blur over the channel-stacked windows: the five inputs ride the
    # contraction's free dimension together (5x the matmul rows) instead of
    # five separate dispatches.
    c = img1.shape[-1]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    blurred = _blur(stacked, window_size, sigma)
    mu1, mu2, m11, m22, m12 = (
        blurred[..., i * c : (i + 1) * c] for i in range(5)
    )
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    cs = jnp.mean((2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2), axis=(1, 2, 3))
    return jnp.mean(ssim_map, axis=(1, 2, 3)), cs


def _avg_pool_2x2(img: Array) -> Array:
    """Non-overlapping 2x2 mean pool, floor semantics — matches torch
    `F.avg_pool2d(x, (2, 2))` (reference metric.py:192-193).

    Crop-to-even + reshape + mean rather than `lax.reduce_window`: identical
    values (VALID windows never touch the cropped trailing row/col), and the
    backward is a broadcast instead of a select-and-scatter."""
    b, h, w, ch = img.shape
    img = img[:, : (h // 2) * 2, : (w // 2) * 2, :]
    return img.reshape(b, h // 2, 2, w // 2, 2, ch).mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("window_size", "levels"))
def ms_ssim(
    img1: Array,
    img2: Array,
    window_size: int = 11,
    levels: int = 5,
) -> Array:
    """Multi-scale SSIM, per image: (B, H, W, C) x2 -> (B,).

    Reference `compute_msssim` (metric.py:162-208) including its
    simple-normalization and last-level broadcast quirks; differentiable.
    """
    weights = jnp.asarray(MSSSIM_WEIGHTS[:levels], dtype=img1.dtype)
    ssims, mcs = [], []
    for _ in range(levels):
        s, cs = ssim(img1, img2, window_size=window_size)
        ssims.append(s)
        mcs.append(cs)
        img1 = _avg_pool_2x2(img1)
        img2 = _avg_pool_2x2(img2)
    # The reference's "simple normalize" maps scores through (x+1)/2
    # (metric.py:198-201) but contrast-structure values can dip below -1,
    # and a negative base under the fractional weights then yields NaN. The
    # reference's own comments call for "Relu normalize" (metric.py:188)
    # without applying it — the floor implements that intent (only differs
    # from the reference where it would have produced NaN). The floor is a
    # small epsilon, not 0: d/dx x**w -> inf as x -> 0 for fractional w, so
    # a 0 floor makes the *backward* pass produce inf*0 = NaN when the clamp
    # binds, poisoning training gradients even though the forward is finite.
    eps = jnp.asarray(1e-6, img1.dtype)
    ssims_arr = jnp.maximum((jnp.stack(ssims, axis=1) + 1.0) / 2.0, eps)  # (B, L)
    mcs_arr = jnp.maximum((jnp.stack(mcs, axis=1) + 1.0) / 2.0, eps)

    pow_mcs = mcs_arr**weights
    pow_ssim = ssims_arr**weights
    # Last-level ssim broadcast into every mcs column before the product —
    # the reference's exact combination (metric.py:207).
    return jnp.prod(pow_mcs[:, :-1] * pow_ssim[:, -1:], axis=1)
