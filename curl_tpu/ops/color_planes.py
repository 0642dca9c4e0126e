"""Color conversions over separate channel *planes* (r, g, b as individual
2-D arrays) — the layout the Pallas kernels use.

Same math as `curl_tpu.ops.color` (which operates on NHWC tensors with the
channel matmuls); here the 3x3 matrix products are written as explicit
linear combinations so each plane stays a clean (sublane, lane) tile on the
VPU. Equivalence with `ops.color` is unit-tested to fp32 tolerance.

All functions take/return tuples of same-shaped arrays and are usable both
inside Pallas kernels and in plain jax.
"""

from __future__ import annotations

import jax.numpy as jnp

# Matrix rows from ops.color (rows = input channel, cols = output channel).
_M_RGB2XYZ = (
    (0.412453, 0.212671, 0.019334),
    (0.357580, 0.715160, 0.119193),
    (0.180423, 0.072169, 0.950227),
)
_M_XYZ2RGB = (
    (3.2404542, -0.9692660, 0.0556434),
    (-1.5371385, 1.8760108, -0.2040259),
    (-0.4985314, 0.0415560, 1.0572252),
)
_WHITE = (0.950456, 1.0, 1.088754)
_EPS = 6.0 / 29.0


def _mix(v0, v1, v2, m):
    """(v0,v1,v2) @ m for a 3x3 tuple-matrix m (rows = inputs)."""
    return tuple(
        v0 * m[0][k] + v1 * m[1][k] + v2 * m[2][k] for k in range(3)
    )


def _branch(x, cond, lo, hi):
    c = cond.astype(x.dtype)
    return lo * c + hi * (1.0 - c)


def _srgb_linearize(x):
    return _branch(
        x,
        x <= 0.04045,
        x / 12.92,
        ((jnp.maximum(x, 1e-4) + 0.055) / 1.055) ** 2.4,
    )


def _srgb_encode(x):
    return _branch(
        x,
        x <= 0.0031308,
        x * 12.92,
        jnp.maximum(x, 1e-4) ** (1.0 / 2.4) * 1.055 - 0.055,
    )


def lab_from_rgb(r, g, b):
    """Plane version of ops.color.rgb_to_lab (renormalized channels)."""
    r, g, b = _srgb_linearize(r), _srgb_linearize(g), _srgb_linearize(b)
    x, y, z = _mix(r, g, b, _M_RGB2XYZ)
    x, y, z = x / _WHITE[0], y / _WHITE[1], z / _WHITE[2]

    def f(t):
        return _branch(
            t,
            t <= _EPS**3,
            t / (3.0 * _EPS**2) + 4.0 / 29.0,
            jnp.maximum(t, 1e-4) ** (1.0 / 3.0),
        )

    fx, fy, fz = f(x), f(y), f(z)
    l_ = 116.0 * fy - 16.0
    a_ = 500.0 * (fx - fy)
    b_ = 200.0 * (fy - fz)
    return l_ / 100.0, (a_ / 110.0 + 1.0) / 2.0, (b_ / 110.0 + 1.0) / 2.0


def rgb_from_lab(l_, a_, b_):
    """Plane version of ops.color.lab_to_rgb."""
    l_ = l_ * 100.0
    a_ = (a_ * 2.0 - 1.0) * 110.0
    b_ = (b_ * 2.0 - 1.0) * 110.0
    fy = (l_ + 16.0) / 116.0
    fx = fy + a_ / 500.0
    fz = fy - b_ / 200.0

    def finv(t):
        return _branch(
            t,
            t <= _EPS,
            3.0 * _EPS**2 * (t - 4.0 / 29.0),
            jnp.maximum(t, 1e-4) ** 3.0,
        )

    x, y, z = finv(fx) * _WHITE[0], finv(fy) * _WHITE[1], finv(fz) * _WHITE[2]
    r, g, b = _mix(x, y, z, _M_XYZ2RGB)
    return _srgb_encode(r), _srgb_encode(g), _srgb_encode(b)


def _safe_recip(x):
    # Same hardened guard as ops.color._safe_reciprocal.
    nz = jnp.abs(x) > 1e-10
    return jnp.where(nz, 1.0 / jnp.where(nz, x, 1.0), 0.0)


def hsv_from_rgb(r, g, b):
    """Plane version of ops.color.rgb_to_hsv (clamps, additive argmax hue,
    safe division)."""
    r = jnp.clip(r, 1e-9, 1.0)
    g = jnp.clip(g, 1e-9, 1.0)
    b = jnp.clip(b, 1e-9, 1.0)
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    df = mx + (-1.0) * mn
    dt = r.dtype
    df_inv = _safe_recip(df)
    hue = jnp.where(
        df <= 1e-10,
        jnp.zeros_like(df),
        ((g - b) * df_inv) * (r == mx).astype(dt)
        + (2.0 + (b - r) * df_inv) * (g == mx).astype(dt)
        + (4.0 + (r - g) * df_inv) * (b == mx).astype(dt),
    )
    hue = hue * 60.0
    hue = (hue < 0.0).astype(dt) * (hue + 360.0) + (hue >= 0.0).astype(dt) * hue
    hue = hue / 360.0
    mx_inv = _safe_recip(mx)
    sat = jnp.where(mx <= 1e-10, jnp.zeros_like(mx), (mx > 1e-10).astype(dt) * (df * mx_inv))
    clip = lambda t: jnp.clip(t, 1e-9, 1.0)
    return clip(hue), clip(sat), clip(mx)


def rgb_from_hsv(h, s, v):
    """Plane version of ops.color.hsv_to_rgb (clamped hue ramps)."""
    h = jnp.clip(h, 0.0, 1.0)
    s = jnp.clip(s, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    h360 = h * 360.0
    vmin = v * (1.0 - s)

    def ramp(theta, width):
        return jnp.clip(h360 - theta, 0.0, width)

    m_dn = (vmin - v) / 60.0
    r = v + ramp(60.0, 60.0) * m_dn + ramp(240.0, 60.0) * (-1.0 * m_dn)
    m_up = (v - vmin) / 60.0
    g = vmin + ramp(0.0, 60.0) * m_up + ramp(180.0, 60.0) * (-1.0 * m_up)
    b = vmin + ramp(120.0, 60.0) * m_up + ramp(300.0, 60.0) * (-1.0 * m_up)
    clip = lambda t: jnp.clip(t, 0.0, 1.0)
    return clip(r), clip(g), clip(b)
