"""Cross-cutting utilities."""

from curl_tpu.utils.imageio import (  # noqa: F401
    chw_to_hwc,
    hwc_to_chw,
    load_image_u8,
    save_image_u8,
)
from curl_tpu.utils.profiling import StepTimer, sync, trace  # noqa: F401
