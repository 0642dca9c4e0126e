"""TriSpacePolyNet — the flagship model.

An EfficientNetV2 backbone looks at the (masked, usually low-resolution)
image and predicts per-space polynomial coefficients; the tri-space residual
op applies them per pixel at any resolution. This is the TPU rebuild of the
reference's live model `TriSpaceRegNet` (reference model.py:439-535) with
its predict-on-low-res / apply-on-full-res hook: when `target_img` is given,
coefficients come from `img` but the residual is generated on `target_img`
(model.py:529-535).
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from curl_tpu.models import backbone as bb
from curl_tpu.ops import enhance, poly


def _resolve_cfg(backbone: Union[str, bb.BackboneCfg]) -> bb.BackboneCfg:
    return bb.CONFIGS[backbone] if isinstance(backbone, str) else backbone


def _identity_bias(num_coeffs: int) -> tuple:
    """Final-layer bias making a zero-kernel head the identity transform.

    With all non-constant coefficients 0, each space's polynomial output is
    sigmoid(constant). Choosing the constants so RGB maps to 0.5 and the
    Lab/HSV branches convert back to exactly mid-gray makes every residual
    contribution 2*(0.5 - 0.5) = 0:
      RGB: logit(0.5) = 0;
      Lab: L of mid-gray (rgb_to_lab(0.5) -> 0.53377) -> logit; a=b -> 0;
      HSV: mid-gray has hue=sat=0 (floor 1e-9) -> large negative logit,
           value 0.5 -> 0.
    """
    import numpy as _np

    # Closed-form mid-gray coordinates (pure numpy: this runs inside
    # linen setup(), possibly under a jit trace). rgb_to_lab(0.5): all three
    # XYZ components equal the linearized value, so a = b = 0 and
    # L = 116 * lin^(1/3) - 16; rgb_to_hsv(0.5): zero chroma floors hue and
    # saturation at the 1e-9 clamp, value = 0.5.
    lin = ((0.5 + 0.055) / 1.055) ** 2.4
    l_norm = (116.0 * lin ** (1.0 / 3.0) - 16.0) / 100.0
    lab = (l_norm, 0.5, 0.5)
    hsv = (1e-9, 1e-9, 0.5)

    def logit(v):
        # Floor at ~3e-4 (logit ~ -8): visually still the identity, but the
        # sigmoid keeps usable gradients (a 1e-9 floor would freeze the HSV
        # constant terms at ~1e-9 gradient scale).
        v = float(_np.clip(v, 3e-4, 1.0 - 3e-4))
        return float(_np.log(v / (1.0 - v)))

    consts = {
        0: (0.0, 0.0, 0.0),  # RGB
        1: tuple(logit(v) for v in lab),  # Lab
        2: tuple(logit(v) for v in hsv),  # HSV
    }
    bias = _np.zeros((3, 3, num_coeffs), _np.float32)
    for space, vals in consts.items():
        for c in range(3):
            bias[space, c, 0] = vals[c]
    return tuple(bias.reshape(-1).tolist())


class TriSpacePolyNet(nn.Module):
    """Predicts (3 spaces x 3 channels x num_coeffs) polynomial coefficients
    and applies the tri-space residual.

    Attributes:
      polynomial_order: total degree of the per-space polynomial (default 4).
      spatial: append normalized x,y coordinate planes as polynomial
        variables (reference model.py:474-497; resolution-independent — no
        max_resolution bound needed here).
      backbone: a BackboneCfg or config name ("efficientnetv2_rw_t", ...).
      bn_axis_name: mesh axis for cross-replica batch-norm statistics (the
        SyncBatchNorm equivalent, reference model.py:457-458); None keeps
        per-replica stats.
      residual_impl: "xla" or "pallas" for the apply path.
    """

    polynomial_order: int = 4
    spatial: bool = True
    backbone: Union[str, bb.BackboneCfg] = "efficientnetv2_rw_t"
    bn_axis_name: Optional[str] = None
    residual_impl: str = "xla"
    # Polynomial evaluation form. "auto" = "acc" (the accumulation form
    # measured FASTER under autodiff too: 3.5 vs 5.8 ms/step fwd+bwd at
    # 256^2 batch 8 on the v5e — tools/poly_grad_probe.py; the residual is
    # ~3.5 of the 69.6 ms train step, the loss dominates). "matmul" forces
    # the stacked-basis MXU form, kept for measurement.
    residual_form: str = "auto"
    compute_dtype: str = "float32"  # backbone compute dtype; bfloat16 halves
    # conv time on the MXU while coefficients and the residual stay fp32
    identity_init: bool = False  # initialize as the identity transform

    num_channels: int = 3
    num_spaces: int = 3

    @property
    def num_in(self) -> int:
        return self.num_channels + 2 * int(self.spatial)

    @property
    def num_coeffs(self) -> int:
        return poly.num_monomials(self.polynomial_order, self.num_in)

    def setup(self):
        self.backbone_net = bb.EfficientNetV2(
            _resolve_cfg(self.backbone), bn_axis_name=self.bn_axis_name
        )
        out_dim = self.num_spaces * self.num_channels * self.num_coeffs
        # The reference's replaced classifier: 1024 -> 1024 -> 512 -> 512 ->
        # out, bias-ful Linears with no activations (model.py:459-463).
        bias = _identity_bias(self.num_coeffs) if self.identity_init else None
        self.head = bb.MLPHead((1024, 512, 512, out_dim), last_bias_init=bias)

    def generate_coefficients(
        self, img: Array, mask: Array, *, train: bool = False
    ) -> tuple[Array, Array, Array]:
        """Backbone over the masked image -> (R, L, H) coefficient stacks,
        each (B, 3, num_coeffs) (reference model.py:522-527)."""
        x = (img * mask.astype(img.dtype)).astype(self.compute_dtype)
        feats = self.backbone_net(x, train=train)
        coeffs = self.head(feats).astype(jnp.float32).reshape(
            img.shape[0], self.num_spaces, self.num_channels, self.num_coeffs
        )
        return coeffs[:, 0], coeffs[:, 1], coeffs[:, 2]

    def __call__(
        self,
        img: Array,
        mask: Array,
        target_img: Optional[Array] = None,
        *,
        train: bool = False,
        return_residual: bool = False,
    ) -> Array:
        """img: (B,h,w,3); mask: (B,h,w,1); target_img: optional (B,H,W,3)
        full-resolution apply target. Returns the enhanced image (clamped
        img+residual) or, with `return_residual`, the raw residual — the
        reference's `is_train` switch (model.py:484,529-535) made an explicit
        call argument."""
        coeff_rgb, coeff_lab, coeff_hsv = self.generate_coefficients(img, mask, train=train)
        apply_img = img if target_img is None else target_img
        form = "acc" if self.residual_form == "auto" else self.residual_form
        residual = enhance.trispace_residual(
            apply_img,
            coeff_rgb,
            coeff_lab,
            coeff_hsv,
            degree=self.polynomial_order,
            spatial=self.spatial,
            impl=self.residual_impl,
            form=form,
        )
        if return_residual:
            return residual
        return enhance.generate_image(apply_img, residual)


class PolyRegNet(nn.Module):
    """Secondary single-space model: backbone -> linear -> per-channel
    polynomial; output = sigmoid(poly(img)) * mask (reference
    model.py:418-436)."""

    polynomial_order: int = 4
    backbone: Union[str, bb.BackboneCfg] = "efficientnetv2_rw_s"
    bn_axis_name: Optional[str] = None
    num_channels: int = 3

    @nn.compact
    def __call__(self, img: Array, mask: Array, *, train: bool = False) -> Array:
        n = poly.num_monomials(self.polynomial_order, self.num_channels)
        feats = bb.EfficientNetV2(
            _resolve_cfg(self.backbone), bn_axis_name=self.bn_axis_name, name="backbone"
        )(img, train=train)
        coeffs = nn.Dense(self.num_channels * n, name="classifier")(feats)
        coeffs = coeffs.reshape(img.shape[0], self.num_channels, n)
        out = jax.nn.sigmoid(
            poly.poly_apply(
                img, coeffs, degree=self.polynomial_order,
                num_out=self.num_channels,
            )
        )
        return out * mask.astype(out.dtype)
