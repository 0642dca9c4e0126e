"""Deployment / export layer: StableHLO export + torch checkpoint converter."""

from curl_tpu.export.stablehlo import export_enhancer, load, save, stablehlo_text  # noqa: F401
from curl_tpu.export.torch_convert import (  # noqa: F401
    convert_trispace_state_dict,
    export_trispace_state_dict,
    strip_ddp_prefix,
)
