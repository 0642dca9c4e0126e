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

import os
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


def export_tflite_bundle(
    model,
    variables,
    out_stem: str,
    backbone_size: int = 320,
    target_hws: Optional[list[tuple[int, int]]] = None,
    extra_meta: Optional[dict] = None,
) -> str:
    """One invocation -> N fixed-resolution artifacts + a JSON manifest:
    `<out_stem>_<H>x<W>.tflite` for each requested serving resolution plus
    `<out_stem>_manifest.json` mapping resolutions to files. This is the
    phone-side approximation of the reference's variable-resolution CoreML
    artifact (coreml_conversion.py:33, RangeDim(1,10000)): the app picks the
    artifact for its output resolution; the transform itself is
    resolution-independent, so N is small (720p/1080p/4K by default).

    A TRUE single variable-resolution TFLite artifact is not producible with
    this toolchain: jax2tf polymorphic target dims fail TFLite conversion on
    dynamic-shape legalizations — `iota` over a dynamic dim ('arith.index_cast
    ... cast incompatible') and channel slicing of dynamic-dim tensors
    ('vhlo.dynamic_gather_v1 op is not part of the vhlo support yet') —
    measured in this environment (2026-08); see docs/PARITY.md. Returns the
    manifest path.
    """
    import json

    if target_hws is None:
        target_hws = [(720, 1280), (1080, 1920), (2160, 3840)]
    artifacts = []
    for h, w in target_hws:
        path = f"{out_stem}_{h}x{w}.tflite"
        export_tflite(
            model, variables, path,
            backbone_size=backbone_size, target_hw=(h, w),
        )
        artifacts.append({"target_h": h, "target_w": w, "file": os.path.basename(path)})
    manifest_path = f"{out_stem}_manifest.json"
    manifest = {
        "format": "tflite-bundle",
        "backbone_size": backbone_size,
        "inputs": ["img (1,S,S,3) f32", "mask (1,S,S,1) f32",
                   "target (1,H,W,3) f32"],
        "artifacts": artifacts,
        **(extra_meta or {}),
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest_path


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
