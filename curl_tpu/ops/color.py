"""Differentiable color-space conversions (RGB <-> CIELab, RGB <-> HSV).

Pure JAX functions over NHWC float arrays in [0, 1]. The math reproduces the
reference implementation's exact formulas — including its clamp guards,
safe-division semantics and channel renormalizations — so outputs match the
PyTorch reference bit-for-bit in fp32 (parity: /root/reference/colors.py).

Behavioral notes mirrored from the reference:
  * rgb_to_lab renormalizes channels into [0,1]: L/100, (a/110+1)/2,
    (b/110+1)/2 (reference colors.py:57-59); lab_to_rgb inverts that
    (colors.py:97-99).
  * piecewise branches use `clamp(x, min=1e-4)` guards on the power branches
    so gradients stay finite (colors.py:37-38,45-47,110-111,118-119).
  * rgb_to_hsv clamps input/output to [1e-9, 1] and maps zero denominators to
    exactly 0 (colors.py:186-193,205,240).
  * hue uses *additive* per-argmax terms: when several channels tie for the
    max, their terms sum — same as the reference (colors.py:221-224).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# Constant matrices are NUMPY (not jnp): jax ops accept them and XLA
# constant-folds identically, while module-level jnp.array would initialize
# the XLA backend at import — breaking jax.distributed.initialize on
# multi-host (it must run before any backend init).

# Row-stochastic-ish sRGB (D65) primaries. Rows = R,G,B; cols = X,Y,Z.
# Same constants as reference colors.py:8-13.
_RGB_TO_XYZ = np.array(
    [
        [0.412453, 0.212671, 0.019334],
        [0.357580, 0.715160, 0.119193],
        [0.180423, 0.072169, 0.950227],
    ],
    dtype=np.float32,
)

# Rows = fx,fy,fz; cols = L,a,b. Reference colors.py:16-21.
_FXFYFZ_TO_LAB = np.array(
    [
        [0.0, 500.0, 0.0],
        [116.0, -500.0, 200.0],
        [0.0, 0.0, -200.0],
    ],
    dtype=np.float32,
)

# Rows = X,Y,Z; cols = R,G,B. Reference colors.py:69-74.
_XYZ_TO_RGB = np.array(
    [
        [3.2404542, -0.9692660, 0.0556434],
        [-1.5371385, 1.8760108, -0.2040259],
        [-0.4985314, 0.0415560, 1.0572252],
    ],
    dtype=np.float32,
)

# Rows = L+16,a,b; cols = fx,fy,fz. Reference colors.py:77-82.
_LAB_TO_FXFYFZ = np.array(
    [
        [1.0 / 116.0, 1.0 / 116.0, 1.0 / 116.0],
        [1.0 / 500.0, 0.0, 0.0],
        [0.0, 0.0, -1.0 / 200.0],
    ],
    dtype=np.float32,
)

# D65 white point. Reference colors.py:24.
_WHITE_POINT = np.array([0.950456, 1.0, 1.088754], dtype=np.float32)

_LAB_OFFSET = np.array([16.0, 0.0, 0.0], dtype=np.float32)

_EPS_CBRT = 6.0 / 29.0


def _mat(img: Array, m: Array) -> Array:
    """Channel-dim 3x3 matrix product at true fp32 precision. The default
    TPU MXU path would run bf16 passes — with Lab channel magnitudes up to
    ~110 that costs ~0.4% relative error, visible in the output image."""
    return jnp.einsum(
        "...c,ck->...k", img, m.astype(img.dtype), precision=jax.lax.Precision.HIGHEST
    )


def _branch(x: Array, cond, lo_fn, hi_fn) -> Array:
    """`lo*[cond] + hi*[not cond]` with both branches evaluated, matching the
    reference's mask-multiply style (keeps identical fp behavior to torch's
    `a*mask.float() + b*(~mask).float()`)."""
    c = cond.astype(x.dtype)
    return lo_fn(x) * c + hi_fn(x) * (1.0 - c)


def rgb_to_lab(img: Array) -> Array:
    """sRGB -> renormalized CIELab. NHWC in [0,1] -> NHWC with L,a,b mapped
    into [0,1]. Parity: reference colors.py:27-62 (RGB2LAB.forward)."""
    dt = img.dtype
    # sRGB -> linear RGB (gamma 2.4 piecewise; colors.py:37-38).
    img = _branch(
        img,
        img <= 0.04045,
        lambda x: x / 12.92,
        lambda x: ((jnp.maximum(x, 1e-4) + 0.055) / 1.055) ** 2.4,
    )
    # linear RGB -> XYZ, then normalize by the D65 white point (colors.py:40-41).
    img = _mat(img, _RGB_TO_XYZ)
    img = img / _WHITE_POINT.astype(dt)
    # cube-root piecewise f() (colors.py:43-47).
    eps = _EPS_CBRT
    img = _branch(
        img,
        img <= eps**3,
        lambda x: x / (3.0 * eps**2) + 4.0 / 29.0,
        lambda x: jnp.maximum(x, 1e-4) ** (1.0 / 3.0),
    )
    # fxfyfz -> Lab with offset (colors.py:50).
    img = _mat(img, _FXFYFZ_TO_LAB) - _LAB_OFFSET.astype(dt)
    # Renormalize into [0,1] (colors.py:57-59).
    l = img[..., 0:1] / 100.0
    a = (img[..., 1:2] / 110.0 + 1.0) / 2.0
    b = (img[..., 2:3] / 110.0 + 1.0) / 2.0
    return jnp.concatenate([l, a, b], axis=-1)


def lab_to_rgb(img: Array) -> Array:
    """Renormalized CIELab -> sRGB; exact inverse chain of `rgb_to_lab`.
    Parity: reference colors.py:88-123 (LAB2RGB.forward)."""
    dt = img.dtype
    # Undo channel renormalization (colors.py:97-99).
    l = img[..., 0:1] * 100.0
    a = (img[..., 1:2] * 2.0 - 1.0) * 110.0
    b = (img[..., 2:3] * 2.0 - 1.0) * 110.0
    img = jnp.concatenate([l, a, b], axis=-1)
    # Lab -> fxfyfz (colors.py:104-106).
    img = _mat(img + _LAB_OFFSET.astype(dt), _LAB_TO_FXFYFZ)
    # Piecewise cube (colors.py:110-111).
    eps = _EPS_CBRT
    img = _branch(
        img,
        img <= eps,
        lambda x: 3.0 * eps**2 * (x - 4.0 / 29.0),
        lambda x: jnp.maximum(x, 1e-4) ** 3.0,
    )
    # Denormalize for D65 white point, XYZ -> linear RGB (colors.py:114-117).
    img = img * _WHITE_POINT.astype(dt)
    img = _mat(img, _XYZ_TO_RGB)
    # linear RGB -> sRGB gamma encode (colors.py:118-119).
    img = _branch(
        img,
        img <= 0.0031308,
        lambda x: x * 12.92,
        lambda x: jnp.maximum(x, 1e-4) ** (1.0 / 2.4) * 1.055 - 0.055,
    )
    return img


# Denominators below this are treated as zero. The reference guards only
# df == 0.0 exactly (colors.py:186-193), but gradients of 1/df blow up to
# inf/NaN for denormal df (the hue is ill-defined for near-gray pixels
# anyway); the threshold changes forward values only where df <= 1e-10.
_RECIP_TINY = 1e-10


def _safe_reciprocal(x: Array) -> Array:
    """1/x where x is meaningfully nonzero, exactly 0 elsewhere (reference
    `non_nan_inv`, colors.py:186-193, hardened for gradient stability)."""
    nonzero = jnp.abs(x) > _RECIP_TINY
    return jnp.where(nonzero, 1.0 / jnp.where(nonzero, x, 1.0), 0.0)


def rgb_to_hsv(img: Array) -> Array:
    """RGB -> HSV with H,S,V all in [1e-9, 1].
    Parity: reference colors.py:195-242 (RGB2HSV.forward)."""
    img = jnp.clip(img, 1e-9, 1.0)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    df = mx + (-1.0) * mn

    # Hue: additive per-argmax formula; ties contribute multiple terms
    # (colors.py:221-224). Zero chroma maps to hue 0.
    df_inv = _safe_reciprocal(df)
    dt = img.dtype
    hue = jnp.where(
        df <= _RECIP_TINY,
        jnp.zeros_like(df),
        ((g - b) * df_inv) * (r == mx).astype(dt)
        + (2.0 + (b - r) * df_inv) * (g == mx).astype(dt)
        + (4.0 + (r - g) * df_inv) * (b == mx).astype(dt),
    )
    hue = hue * 60.0
    # Wrap negative hue to [0, 360) then normalize (colors.py:228-231).
    hue = (hue < 0.0).astype(dt) * (hue + 360.0) + (hue >= 0.0).astype(dt) * hue
    hue = hue / 360.0

    # Saturation with safe division; value = max channel (colors.py:234-238).
    mx_inv = _safe_reciprocal(mx)
    sat = jnp.where(
        mx <= _RECIP_TINY,
        jnp.zeros_like(mx),
        (mx > _RECIP_TINY).astype(dt) * (df * mx_inv),
    )
    out = jnp.stack([hue, sat, mx], axis=-1)
    return jnp.clip(out, 1e-9, 1.0)


def hsv_to_rgb(img: Array) -> Array:
    """HSV -> RGB via branchless clamped hue-ramps; input and output clamped
    to [0,1]. Parity: reference colors.py:131-177 (HSV2RGB.forward). The
    arithmetic keeps the reference's exact expression shapes (e.g.
    `(v*(1-s)-v)/60`, not the algebraically equal `-v*s/60`) so fp32 results
    are bit-identical."""
    img = jnp.clip(img, 0.0, 1.0)
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    h360 = h * 360.0
    vmin = v * (1.0 - s)  # value scaled by (1 - saturation)

    def ramp(theta: float, width: float) -> Array:
        return jnp.clip(h360 - theta, 0.0, width)

    # Red: falls over [60,120], rises over [240,300] (colors.py:144-150).
    m_dn = (vmin - v) / 60.0
    r = v + ramp(60.0, 60.0) * m_dn + ramp(240.0, 60.0) * (-1.0 * m_dn)

    # Green: rises over [0,60], falls over [180,240] (colors.py:153-159).
    m_up = (v - vmin) / 60.0
    g = vmin + ramp(0.0, 60.0) * m_up + ramp(180.0, 60.0) * (-1.0 * m_up)

    # Blue: rises over [120,180], falls over [300,360] (colors.py:162-168).
    m_up_b = (v - vmin) / 60.0
    b = vmin + ramp(120.0, 60.0) * m_up_b + ramp(300.0, 60.0) * (-1.0 * m_up_b)

    out = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(out, 0.0, 1.0)
