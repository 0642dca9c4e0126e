"""Inference / deployment layer (L5 of the framework)."""

from curl_tpu.infer.engine import Enhancer, center_crop, resize_shorter_side  # noqa: F401
