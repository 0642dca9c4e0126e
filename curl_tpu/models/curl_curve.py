"""CurlCurveNet — the CURL-paper knot-curve model, rebuilt working.

The reference carries this capability as two broken classes: `CURLLayer`
references an undefined `feat` (reference model.py:152,158,164 — leftover of
the original TED-feature concat) and `GCURLNet` references undefined
attributes (model.py:190-191). This module implements what that code
intended: a backbone predicts a flat knot vector split into Lab/RGB/HSV
curves (48/48/64 knots by default, model.py:123-130,186-199), and the curve
layer applies them sequentially across color spaces
(model.py:137-176):

  RGB -> Lab, adjust Lab curves, mask;
  Lab -> RGB, adjust RGB curves, mask;
  RGB -> HSV, adjust HSV curves, mask;
  HSV -> RGB is the residual; output = clamp(img + residual) * mask.

Returns the enhanced image plus the summed slope-smoothness regularizer.
"""

from __future__ import annotations

from functools import partial
from typing import Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from curl_tpu.models import backbone as bb
from curl_tpu.ops import color, curves


@partial(jax.jit, static_argnames=("mode", "impl"))
def curl_curve_layer(
    img: Array,
    mask: Array,
    knots_lab: Array,
    knots_rgb: Array,
    knots_hsv: Array,
    mode: curves.Mode = "paper",
    impl: str = "xla",
) -> tuple[Array, Array]:
    """Tri-space curve enhancement (the repaired CURLLayer forward,
    reference model.py:137-176). img (B,H,W,3), mask (B,H,W,1); knot params
    (B, 3K) / (B, 3K) / (B, 4K). Returns (enhanced, regularizer).

    impl="pallas" runs the whole pass as one fused kernel per tile
    (paper mode only); "xla" is the reference-shaped op chain."""
    mask = mask.astype(img.dtype)

    if impl == "pallas":
        if mode != "paper":
            raise NotImplementedError("fused curve kernel implements paper mode")
        from curl_tpu.ops.pallas.curve_kernel import fused_curve_enhance

        kl = jnp.exp(jnp.stack(jnp.split(knots_lab, 3, axis=-1), axis=1))
        kr = jnp.exp(jnp.stack(jnp.split(knots_rgb, 3, axis=-1), axis=1))
        kh = jnp.exp(jnp.stack(jnp.split(knots_hsv, 4, axis=-1), axis=1))
        out = fused_curve_enhance(img, mask, kl, kr, kh)
        reg = sum(
            jnp.sum(
                jax.vmap(curves.slope_smoothness, in_axes=1, out_axes=1)(k), axis=-1
            )
            for k in (kl, kr, kh)
        )
        return out, reg

    img_lab = color.rgb_to_lab(img)
    img_lab, reg_lab = curves.adjust_lab(img_lab, knots_lab, mode=mode)
    img_lab = img_lab * mask

    img_rgb = color.lab_to_rgb(img_lab)
    img_rgb, reg_rgb = curves.adjust_rgb(img_rgb, knots_rgb, mode=mode)
    img_rgb = img_rgb * mask

    img_hsv = color.rgb_to_hsv(img_rgb)
    img_hsv, reg_hsv = curves.adjust_hsv(img_hsv, knots_hsv, mode=mode)
    img_hsv = img_hsv * mask

    residual = color.hsv_to_rgb(img_hsv)
    out = jnp.clip(img + residual, 0.0, 1.0) * mask
    return out, reg_lab + reg_rgb + reg_hsv


class CurlCurveNet(nn.Module):
    """Backbone -> flat knot vector -> tri-space curve layer (the repaired
    GCURLNet, reference model.py:179-203)."""

    num_lab_points: int = 48
    num_rgb_points: int = 48
    num_hsv_points: int = 64
    backbone: Union[str, bb.BackboneCfg] = "efficientnetv2_rw_s"
    bn_axis_name: str | None = None
    curve_mode: curves.Mode = "paper"
    curve_impl: str = "xla"  # xla | pallas (fused single-program pass)

    @nn.compact
    def __call__(
        self,
        img: Array,
        mask: Array,
        target_img: Array | None = None,
        target_mask: Array | None = None,
        *,
        train: bool = False,
    ) -> tuple[Array, Array]:
        """Optional `target_img`/`target_mask`: predict the knots from the
        (low-resolution) `img` but apply the curves at the target's native
        resolution — the same predict-low-res/apply-full-res deployment hook
        the polynomial model has (reference model.py:529-535; the curves are
        global per-image transforms, so they are resolution-independent)."""
        cfg = bb.CONFIGS[self.backbone] if isinstance(self.backbone, str) else self.backbone
        feats = bb.EfficientNetV2(cfg, bn_axis_name=self.bn_axis_name, name="backbone")(
            img, train=train
        )
        total = self.num_lab_points + self.num_rgb_points + self.num_hsv_points
        knots = nn.Dense(total, name="classifier")(feats)
        b1 = self.num_lab_points
        b2 = b1 + self.num_rgb_points
        apply_img = img if target_img is None else target_img
        if target_img is None:
            apply_mask = mask
        elif target_mask is None:
            apply_mask = jnp.ones(target_img.shape[:3] + (1,), target_img.dtype)
        else:
            apply_mask = target_mask
        return curl_curve_layer(
            apply_img,
            apply_mask,
            knots[:, :b1],
            knots[:, b1:b2],
            knots[:, b2:],
            mode=self.curve_mode,
            impl=self.curve_impl,
        )
