"""Deployment / export layer: StableHLO + TFLite export, torch converter."""

from curl_tpu.export.stablehlo import export_enhancer, load, save, stablehlo_text  # noqa: F401
from curl_tpu.export.tflite import export_tflite, run_tflite  # noqa: F401
from curl_tpu.export.torch_convert import (  # noqa: F401
    convert_timm_backbone_state_dict,
    convert_trispace_state_dict,
    export_trispace_state_dict,
    init_with_pretrained_backbone,
    strip_ddp_prefix,
    timm_key_shapes,
)
