"""Model export via jax.export / StableHLO.

Plays the role of the reference's CoreML export
(/root/reference/coreml_conversion.py): capture the deployment-time forward
— fixed-size backbone inputs, arbitrary-resolution apply target — as a
serialized, runtime-loadable artifact. StableHLO is the portable exchange
format of the XLA ecosystem (servable via TF/TFLite/IREE toolchains).

The reference's `RangeDim(1, 10000)` variable target dims
(coreml_conversion.py:33) map to `jax.export.symbolic_shape` dimension
variables.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np


def export_enhancer(
    model,
    variables,
    backbone_size: int = 320,
    variable_target: bool = True,
) -> "jax.export.Exported":
    """Export `f(img, mask, target) -> enhanced` with the variables baked in.

    img: (1, S, S, 3); mask: (1, S, S, 1); target: (1, H, W, 3) where H, W
    are symbolic when `variable_target` (the predict-low-res /
    apply-any-res deployment contract, reference coreml_conversion.py:18,33).
    """
    from jax import export as jexport

    def fn(img, mask, target):
        out = model.apply(variables, img, mask, target)
        # Curve models return (image, slope regulariser); deployment
        # artifacts carry just the image.
        return out[0] if isinstance(out, tuple) else out

    s = backbone_size
    img_t = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    mask_t = jax.ShapeDtypeStruct((1, s, s, 1), jnp.float32)
    if variable_target:
        h, w = jexport.symbolic_shape("h, w")
        target_t = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    else:
        target_t = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    return jexport.export(jax.jit(fn))(img_t, mask_t, target_t)


def save(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load(path: str) -> "jax.export.Exported":
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def stablehlo_text(exported) -> str:
    """Human-readable StableHLO module (for inspection/codegen)."""
    return exported.mlir_module()
