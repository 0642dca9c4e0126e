"""Normalized spatial-coordinate channels.

The spatial polynomial variables are x/width and y/height planes appended to
the image channels, making the learned transform resolution-independent
(reference `TriSpaceRegNet.cat_coords`, model.py:474-497). TPU-native: built
with `broadcasted_iota` at the image's actual shape — no `max_resolution`
buffer bound; any static resolution works.

Tiled high-resolution apply needs coordinates of the *global* image while
computing on a tile, so the generators accept a (row, col) offset and the
global (height, width) to normalize by.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array


def coord_channels(
    batch: int,
    height: int,
    width: int,
    dtype=jnp.float32,
    *,
    row_offset: int = 0,
    col_offset: int = 0,
    total_height: Optional[int] = None,
    total_width: Optional[int] = None,
) -> Array:
    """(B, H, W, 2) array of (x/W_total, y/H_total) planes — values j/W for
    column j, i/H for row i, matching the reference's arange-based
    normalization (model.py:478-479,494-496). Offsets/totals support
    computing a tile of a larger image."""
    th = total_height if total_height is not None else height
    tw = total_width if total_width is not None else width
    x = (jax.lax.broadcasted_iota(dtype, (batch, height, width), 2) + col_offset) / tw
    y = (jax.lax.broadcasted_iota(dtype, (batch, height, width), 1) + row_offset) / th
    return jnp.stack([x, y], axis=-1)


def cat_coords(
    img: Array,
    *,
    row_offset: int = 0,
    col_offset: int = 0,
    total_height: Optional[int] = None,
    total_width: Optional[int] = None,
) -> Array:
    """Append normalized coordinate channels: (B, H, W, C) -> (B, H, W, C+2)."""
    b, h, w, _ = img.shape
    return jnp.concatenate(
        [
            img,
            coord_channels(
                b,
                h,
                w,
                img.dtype,
                row_offset=row_offset,
                col_offset=col_offset,
                total_height=total_height,
                total_width=total_width,
            ),
        ],
        axis=-1,
    )
