"""On-device paired augmentation.

The train-time augmentation of the reference (random horizontal/vertical
flips and a uniform +-180 degree rotation with zero fill, applied to the
stacked [input|output|mask] tensor so all three transform identically —
reference data.py:101-113,150-169) runs here *inside the jitted step* on
device: flips are lane reversals and the rotation is a gather-based nearest
resample, all driven by per-sample `jax.random` keys. The host only decodes
and crops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


def rotate_nearest(stack: Array, angle: Array) -> Array:
    """Rotate one (H, W, C) stack by `angle` radians about the image center
    with nearest-neighbor sampling and zero fill (torchvision
    RandomRotation's tensor-mode default semantics)."""
    h, w = stack.shape[0], stack.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # Inverse mapping: output pixel -> source location.
    src_x = cos * xx + sin * yy + cx
    src_y = -sin * xx + cos * yy + cy
    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    gathered = stack[iy, ix]  # (H, W, C)
    # dtype-preserving zero fill: augmentation may run on the raw uint8
    # wire format (a permutation of bytes — identical values to fp32
    # augment-then-normalize, at 1/4 the gather traffic).
    return jnp.where(inside[..., None], gathered, jnp.zeros((), stack.dtype))


def _augment_one(stack: Array, key: Array) -> Array:
    k_h, k_v, k_r = jax.random.split(key, 3)
    do_h = jax.random.bernoulli(k_h)
    do_v = jax.random.bernoulli(k_v)
    angle = jax.random.uniform(k_r, minval=-jnp.pi, maxval=jnp.pi)
    stack = jnp.where(do_h, stack[:, ::-1], stack)
    stack = jnp.where(do_v, stack[::-1], stack)
    return rotate_nearest(stack, angle)


@partial(jax.jit, static_argnames=())
def augment_batch(
    input_img: Array, output_img: Array, mask: Array, key: Array
) -> tuple[Array, Array, Array]:
    """Apply per-sample random flips + rotation identically to the pair and
    its mask. (B,H,W,3) x2, (B,H,W,1), PRNG key -> same shapes. The mask is
    re-binarized after the resample (reference data.py:190)."""
    stack = jnp.concatenate([input_img, output_img, mask], axis=-1)  # (B,H,W,7)
    keys = jax.random.split(key, stack.shape[0])
    stack = jax.vmap(_augment_one)(stack, keys)
    aug_in, aug_out, aug_mask = stack[..., :3], stack[..., 3:6], stack[..., 6:7]
    return aug_in, aug_out, (aug_mask > 0).astype(input_img.dtype)
