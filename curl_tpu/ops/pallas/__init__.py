"""Fused Pallas TPU kernels (acceleration layer over the XLA ops)."""

from curl_tpu.ops.pallas.curve_kernel import fused_curve_enhance  # noqa: F401
from curl_tpu.ops.pallas.trispace_kernel import fused_trispace_residual  # noqa: F401
