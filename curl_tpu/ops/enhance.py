"""The tri-space enhancement hot path as a pure function.

Given per-image polynomial coefficients for the RGB, Lab and HSV spaces,
produce the enhancement residual (and optionally the composited image).
This is the per-pixel compute that dominates both training and full-
resolution inference (reference `TriSpaceRegNet.generate_residual`,
model.py:499-515, and `generate_image`, model.py:517-520).

Two interchangeable implementations:
  * impl="xla": straightforward jax ops; XLA fuses the elementwise chains
    and runs the 126-coefficient contraction on the MXU.
  * impl="pallas": fully fused TPU kernel (curl_tpu.ops.pallas) that streams
    image tiles through VMEM, never materializing the (B,H,W,126) monomial
    tensor in HBM — unlike the reference, which does (model.py:319-321).
Both are equivalence-tested against each other.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from curl_tpu.ops import color, coords, poly


def _space_residual(
    img_space: Array, cf: Array, degree: int, spatial: bool, tile: tuple,
    form: str = "acc",
) -> Array:
    if spatial:
        row0, col0, th, tw = tile
        x = coords.cat_coords(
            img_space,
            row_offset=row0,
            col_offset=col0,
            total_height=th,
            total_width=tw,
        )
    else:
        x = img_space
    return jax.nn.sigmoid(
        poly.poly_apply(x, cf, degree=degree, num_out=3, form=form)
    )


def trispace_residual(
    img: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    *,
    degree: int = 4,
    spatial: bool = True,
    impl: str = "xla",
    tile: tuple = None,
    form: str = "acc",
) -> Array:
    """Enhancement residual in [-3, 3]: (B,H,W,3) RGB + 3x (B,3,N) coeffs.

    Per space: convert, (append coords), evaluate polynomial, sigmoid,
    convert Lab/HSV results back to RGB, rescale each to [-1,1], and sum
    (reference model.py:499-515).

    `tile`: optional (row_offset, col_offset, total_h, total_w) identifying
    this image as a tile of a larger one — the coordinate planes then use
    global positions so tiled apply matches whole-image apply exactly. The
    row offset is a *dynamic* value: successive row bands of a tiled apply
    share one compiled program (col_offset/total sizes stay static).
    """
    if tile is None:
        tile = (0, 0, img.shape[1], img.shape[2])
    row0, col0, th, tw = tile
    row0 = jnp.asarray(row0, jnp.int32)
    return _trispace_residual_jit(
        img, coeff_rgb, coeff_lab, coeff_hsv, row0,
        degree=degree, spatial=spatial, impl=impl, static_tile=(col0, th, tw),
        form=form,
    )


@partial(
    jax.jit,
    static_argnames=("degree", "spatial", "impl", "static_tile", "form"),
)
def _trispace_residual_jit(
    img: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    row0: Array,
    *,
    degree: int,
    spatial: bool,
    impl: str,
    static_tile: tuple,
    form: str = "acc",
) -> Array:
    col0, th, tw = static_tile
    tile = (row0, col0, th, tw)
    if impl == "pallas":
        from curl_tpu.ops.pallas import fused_trispace_residual

        return fused_trispace_residual(
            img, coeff_rgb, coeff_lab, coeff_hsv, row0,
            degree=degree, spatial=spatial, static_tile=static_tile,
        )
    # Low-precision inputs (bf16 activations mode) are storage formats only:
    # the color/polynomial math runs in fp32 — matching the fused kernel's
    # internal upcast — and the result is stored back in the input dtype.
    in_dtype = img.dtype
    img = img.astype(jnp.float32)
    rgb_res = _space_residual(img, coeff_rgb, degree, spatial, tile, form)
    lab_res = color.lab_to_rgb(
        _space_residual(color.rgb_to_lab(img), coeff_lab, degree, spatial, tile, form)
    )
    hsv_res = color.hsv_to_rgb(
        _space_residual(color.rgb_to_hsv(img), coeff_hsv, degree, spatial, tile, form)
    )
    return (
        2.0 * (rgb_res - 0.5) + 2.0 * (lab_res - 0.5) + 2.0 * (hsv_res - 0.5)
    ).astype(in_dtype)


def generate_image(img: Array, residual: Array) -> Array:
    """Composite the residual onto the input, clamped to the valid range
    (reference model.py:517-520)."""
    return jnp.clip(img + residual, 0.0, 1.0)


@partial(jax.jit, static_argnames=("degree", "spatial", "impl"))
def trispace_enhance(
    img: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    *,
    degree: int = 4,
    spatial: bool = True,
    impl: str = "xla",
) -> Array:
    """Residual + composite in one call: clip(img + residual, 0, 1).

    The pallas path fuses the composite into the kernel's VMEM pass (no
    extra HBM round trip for generate_image); the XLA path relies on
    XLA's own elementwise fusion. Whole-image only (no tiling) — this is
    the deployment hot path."""
    if impl == "pallas":
        from curl_tpu.ops.pallas import fused_trispace_residual

        return fused_trispace_residual(
            img, coeff_rgb, coeff_lab, coeff_hsv,
            degree=degree, spatial=spatial, composite=True,
        )
    res = _trispace_residual_jit(
        img, coeff_rgb, coeff_lab, coeff_hsv, jnp.int32(0),
        degree=degree, spatial=spatial, impl="xla",
        static_tile=(0, img.shape[1], img.shape[2]),
    )
    return generate_image(img, res)
