"""Piecewise-linear knot-curve application (the CURL-paper enhancement path).

A curve is parameterized by K knot values C[0..K-1]; the per-pixel scaling of
an image channel is (eq. 1 of arXiv 1911.13175):

    scale(p) = C[0] + sum_i slope_i * clip((K-1) * p - i, 0, 1),
    slope_i  = C[i+1] - C[i]

which interpolates the knots piecewise-linearly over [0, 1]. A smoothness
regularizer accumulates the squared differences of consecutive slopes.

Parity notes vs the reference (/root/reference/curves.py):
  * The reference's vectorized `apply_curve` (curves.py:29-32) drops the
    clip() and the final slope (it sums `slope[:-1] * ((K-1)p - i)`
    unclamped), degenerating the curve to an affine map; its regularizer also
    crashes on the first call (`None += tensor`, curves.py:24 with
    slope_sqr_diff=None from curves.py:56). Both are latent bugs in dead code
    — the live model uses the polynomial path. This module implements the
    *intended* capability (mode="paper", default) and additionally offers
    mode="fork" replicating the reference's exact arithmetic for parity
    testing of everything except those two bugs.
  * Curve adjusters exponentiate predicted knots (`exp`) before applying, and
    each space applies a fixed wiring of curves: HSV uses 4 curves
    (H->H, H->S, S->S, V->V; curves.py:53-80), RGB and Lab use 3
    channel-diagonal curves each (curves.py:105-126, 152-173).
"""

from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
from jax import Array

Mode = Literal["paper", "fork"]


def curve_scale(channel: Array, knots: Array, mode: Mode = "paper") -> Array:
    """Per-pixel multiplicative scale from a knot curve.

    Args:
      channel: (B, H, W) pixel values in [0, 1] driving the curve.
      knots: (B, K) knot values (already exponentiated by the caller).
      mode: "paper" = piecewise-linear interpolation (clipped ramps, all K-1
        segments); "fork" = the reference's exact unclamped K-2-segment sum
        (curves.py:29-32) for bit-parity testing.

    Returns:
      (B, H, W) scale factors.
    """
    k = knots.shape[-1]
    steps = jnp.asarray(k - 1, dtype=channel.dtype)
    slope = knots[:, 1:] - knots[:, :-1]  # (B, K-1)
    # Ramps stacked on axis 0 — (K-1, B, H, W), whose trailing (H, W) dims
    # tile cleanly on TPU. The (B, H, W, K-1) layout pads the minor dim
    # 47 -> 128 (2.7x HBM traffic, forward and backward); axis-0 stacking
    # avoids it, and the contraction (plus its transpose in the backward)
    # runs as a matmul.
    x = steps * channel[None]  # (1, B, H, W)
    # HIGHEST precision: on TPU the default single-pass bf16 matmul makes
    # this contraction diverge from the fp32 Pallas kernel by ~1e-2
    # (measured on the v5e via tools/curve_bench.py --case check); the
    # contraction is tiny (K~47) so the accurate passes cost nothing.
    hi = jax.lax.Precision.HIGHEST
    if mode == "paper":
        seg = jnp.arange(k - 1, dtype=channel.dtype)[:, None, None, None]
        ramps = jnp.clip(x - seg, 0.0, 1.0)  # (K-1, B, H, W)
        contrib = jnp.einsum("kbhw,bk->bhw", ramps, slope, precision=hi)
    else:
        seg = jnp.arange(k - 2, dtype=channel.dtype)[:, None, None, None]
        ramps = x - seg  # unclamped, matches reference curves.py:31-32
        contrib = jnp.einsum("kbhw,bk->bhw", ramps, slope[:, :-1], precision=hi)
    return knots[:, 0][:, None, None] + contrib


def slope_smoothness(knots: Array) -> Array:
    """Squared difference of consecutive segment slopes, summed over
    segments: the curve regularizer (reference curves.py:19-24). (B, K) ->
    (B,)."""
    slope = knots[:, 1:] - knots[:, :-1]
    return jnp.sum((slope[:, 1:] - slope[:, :-1]) ** 2, axis=-1)


def apply_curve(
    img: Array,
    knots: Array,
    channel_in: int,
    channel_out: int,
    mode: Mode = "paper",
) -> tuple[Array, Array]:
    """Scale `channel_out` of NHWC `img` by a knot curve driven by
    `channel_in`, clamping the result to [0,1] (reference curves.py:4-38).

    Returns (adjusted image, per-image slope-smoothness regularizer).
    """
    scale = curve_scale(img[..., channel_in], knots, mode=mode)
    scaled = img[..., channel_out] * scale
    img = img.at[..., channel_out].set(scaled)
    return jnp.clip(img, 0.0, 1.0), slope_smoothness(knots)


def _split_knots(params: Array, num_curves: int) -> list[Array]:
    """Split (B, num_curves*K) predicted parameters into `num_curves` knot
    vectors and exponentiate (reference curves.py:53-54,105-106,152-153)."""
    chunks = jnp.split(params, num_curves, axis=-1)
    return [jnp.exp(c) for c in chunks]


@partial(jax.jit, static_argnames=("mode",))
def adjust_hsv(img: Array, params: Array, mode: Mode = "paper") -> tuple[Array, Array]:
    """Four curves on an HSV image: H->H, H->S, S->S, V->V (reference
    curves.py:41-87). `params` is (B, 4K). Returns (image, regularizer)."""
    s1, s2, s3, s4 = _split_knots(params, 4)
    img, reg = apply_curve(img, s1, channel_in=0, channel_out=0, mode=mode)
    img, r2 = apply_curve(img, s2, channel_in=0, channel_out=1, mode=mode)
    img, r3 = apply_curve(img, s3, channel_in=1, channel_out=1, mode=mode)
    img, r4 = apply_curve(img, s4, channel_in=2, channel_out=2, mode=mode)
    return img, reg + r2 + r3 + r4


@partial(jax.jit, static_argnames=("mode",))
def adjust_rgb(img: Array, params: Array, mode: Mode = "paper") -> tuple[Array, Array]:
    """Channel-diagonal R/G/B curves (reference curves.py:90-133). `params`
    is (B, 3K)."""
    return _adjust_diagonal(img, params, mode)


@partial(jax.jit, static_argnames=("mode",))
def adjust_lab(img: Array, params: Array, mode: Mode = "paper") -> tuple[Array, Array]:
    """Channel-diagonal L/a/b curves (reference curves.py:136-179). `params`
    is (B, 3K)."""
    return _adjust_diagonal(img, params, mode)


def _adjust_diagonal(img: Array, params: Array, mode: Mode) -> tuple[Array, Array]:
    k1, k2, k3 = _split_knots(params, 3)
    img, reg = apply_curve(img, k1, channel_in=0, channel_out=0, mode=mode)
    img, r2 = apply_curve(img, k2, channel_in=1, channel_out=1, mode=mode)
    img, r3 = apply_curve(img, k3, channel_in=2, channel_out=2, mode=mode)
    return img, reg + r2 + r3
