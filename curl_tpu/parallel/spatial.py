"""Row-sharded full-resolution apply: sequence parallelism over pixels.

The reference has no attention/sequence axis; its long-context analog is
resolution scaling (SURVEY §5): a constant-size transform (1134 numbers)
applied at arbitrary resolution (reference infer.py:32-45,
model.py:486-497). On a TPU slice the idiomatic scale-out of that apply is
to shard the image's row axis across the mesh — each chip enhances its own
row band with globally-normalized coordinates, no cross-chip communication
at all (the transform is pointwise given the coefficients). This is the
pixel-space analog of sequence parallelism: a 4K image over 8 chips is
~1M pixels per chip.

Works with both residual implementations; the coordinate planes use the
global (row offset, total height) so the sharded result is bit-identical
to the single-device apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from curl_tpu.ops import enhance
from curl_tpu.parallel.mesh import DATA_AXIS


def sharded_trispace_residual(
    mesh: Mesh,
    target: Array,
    coeff_rgb: Array,
    coeff_lab: Array,
    coeff_hsv: Array,
    *,
    degree: int = 4,
    spatial: bool = True,
    impl: str = "xla",
    axis: str = DATA_AXIS,
) -> Array:
    """Apply the tri-space residual with H sharded over `axis` of `mesh`.

    target: (B, H, W, 3); coeffs: (B, 3, N) each (replicated). Rows are
    padded to a multiple of the axis size and the pad is stripped after.
    Each shard computes its band with the global tile offset, so the
    result equals the unsharded apply exactly.
    """
    try:  # jax >= 0.4.35 promotes shard_map out of experimental
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    b, h, w, _ = target.shape
    pad = (-h) % n
    if pad:
        target = jnp.pad(target, ((0, 0), (0, pad), (0, 0), (0, 0)))
    rows = (h + pad) // n

    def local_band(t, cr, cl, ch):
        row0 = jax.lax.axis_index(axis) * rows
        return enhance.trispace_residual(
            t, cr, cl, ch,
            degree=degree, spatial=spatial, impl=impl,
            tile=(row0, 0, h, w),
        )

    fn = shard_map(
        local_band,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P()),
        out_specs=P(None, axis),
    )
    out = fn(target, coeff_rgb, coeff_lab, coeff_hsv)
    return out[:, :h] if pad else out


def shard_rows(mesh: Mesh, img: Array, axis: str = DATA_AXIS) -> Array:
    """Place an (B, H, W, C) image with H sharded over `axis` (H must
    already be a multiple of the axis size)."""
    return jax.device_put(img, NamedSharding(mesh, P(None, axis)))
