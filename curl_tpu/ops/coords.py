"""Normalized spatial-coordinate channels.

The spatial polynomial variables are x/width and y/height planes appended to
the image channels, making the learned transform resolution-independent
(reference `TriSpaceRegNet.cat_coords`, model.py:474-497). TPU-native: built
with `broadcasted_iota` at the image's actual shape — no `max_resolution`
buffer bound; any static resolution works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def coord_channels(batch: int, height: int, width: int, dtype=jnp.float32) -> Array:
    """(B, H, W, 2) array of (x/width, y/height) planes — values j/W for
    column j and i/H for row i, matching the reference's arange-based
    normalization (model.py:478-479,494-496)."""
    x = jax.lax.broadcasted_iota(dtype, (batch, height, width), 2) / width
    y = jax.lax.broadcasted_iota(dtype, (batch, height, width), 1) / height
    return jnp.stack([x, y], axis=-1)


def cat_coords(img: Array) -> Array:
    """Append normalized coordinate channels: (B, H, W, C) -> (B, H, W, C+2)."""
    b, h, w, _ = img.shape
    return jnp.concatenate([img, coord_channels(b, h, w, img.dtype)], axis=-1)
