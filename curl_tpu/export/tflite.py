"""TFLite deployment artifact: the mobile-export role of the reference.

The reference ships a CoreML conversion that produces a *runnable mobile
model* and smoke-tests it (/root/reference/coreml_conversion.py:9-43:
torch.jit.trace -> ct.convert -> MLModel predict). The TPU-ecosystem
equivalent is jax2tf -> TF SavedModel/concrete function -> TFLite
flatbuffer, executed OUTSIDE jax by the TFLite interpreter. StableHLO
(`export/stablehlo.py`) remains the capture/exchange format; this module
produces the artifact a phone actually runs.

The exported signature is the deployment contract: coefficients predicted
from a fixed (1, S, S) backbone view, the polynomial transform applied to a
target image (reference coreml_conversion.py:18-37). The target resolution
is baked at export time (TFLite prefers static shapes; export one artifact
per serving resolution — the transform itself is resolution-independent).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def export_tflite(
    model,
    variables,
    out_path: str,
    backbone_size: int = 320,
    target_hw: Optional[tuple[int, int]] = (1000, 1000),
) -> str:
    """Convert `f(img, mask, target) -> enhanced` to a .tflite flatbuffer.

    Requires tensorflow (jax2tf + TFLiteConverter). Returns `out_path`.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fn(img, mask, target):
        out = model.apply(variables, img, mask, target)
        # CurlCurveNet returns (image, slope regulariser); the deployment
        # artifact ships only the image (same unwrap as stablehlo.py).
        return out[0] if isinstance(out, tuple) else out

    s = backbone_size
    th, tw = target_hw
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec((1, s, s, 3), tf.float32, name="img"),
            tf.TensorSpec((1, s, s, 1), tf.float32, name="mask"),
            tf.TensorSpec((1, th, tw, 3), tf.float32, name="target"),
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()], tf_fn
    )
    # StableHLO-lowered jax programs need TF-select ops in the flatbuffer.
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    flatbuffer = converter.convert()
    with open(out_path, "wb") as f:
        f.write(flatbuffer)
    return out_path


def run_tflite(
    tflite_path: str,
    img: np.ndarray,
    mask: np.ndarray,
    target: np.ndarray,
) -> np.ndarray:
    """Execute the artifact with the TFLite interpreter (no jax involved) —
    the smoke-predict role of reference coreml_conversion.py:40-43."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=tflite_path)
    interp.allocate_tensors()
    arrays = {"img": img, "mask": mask, "target": target}
    for d in interp.get_input_details():
        name = d["name"].split(":")[0].rsplit("_", 1)[-1]
        if name not in arrays:
            # Fall back to shape matching (mask is the only 1-channel input;
            # img/target differ unless exported with target_hw == backbone
            # size, which export_tflite's defaults never do).
            matches = [k for k, v in arrays.items() if tuple(v.shape) == tuple(d["shape"])]
            if len(matches) != 1:
                raise ValueError(f"cannot match TFLite input {d['name']} {d['shape']}")
            name = matches[0]
        interp.set_tensor(d["index"], np.asarray(arrays.pop(name), np.float32))
    interp.invoke()
    (out_detail,) = interp.get_output_details()
    return interp.get_tensor(out_detail["index"])
