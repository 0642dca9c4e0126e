"""Models & losses (L2 of the framework)."""

from curl_tpu.models.backbone import (  # noqa: F401
    CONFIGS as BACKBONE_CONFIGS,
    BackboneCfg,
    BlockCfg,
    EfficientNetV2,
    MLPHead,
)
from curl_tpu.models.curl_curve import CurlCurveNet, curl_curve_layer  # noqa: F401
from curl_tpu.models.losses import curl_loss, hsv_cone  # noqa: F401
from curl_tpu.models.metrics import masked_ms_ssim, psnr, psnr_per_image  # noqa: F401
from curl_tpu.models.trispace import PolyRegNet, TriSpacePolyNet  # noqa: F401
