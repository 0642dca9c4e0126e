"""Pure-function image/math primitives (L1 of the framework).

All ops take NHWC float arrays in [0, 1] and are jit/vmap/grad-compatible.
"""

from curl_tpu.ops.color import (  # noqa: F401
    hsv_to_rgb,
    lab_to_rgb,
    rgb_to_hsv,
    rgb_to_lab,
)
from curl_tpu.ops.coords import cat_coords, coord_channels  # noqa: F401
from curl_tpu.ops.enhance import (  # noqa: F401
    generate_image,
    trispace_enhance,
    trispace_residual,
)
from curl_tpu.ops.curves import (  # noqa: F401
    adjust_hsv,
    adjust_lab,
    adjust_rgb,
    apply_curve,
    curve_scale,
    slope_smoothness,
)
from curl_tpu.ops.poly import (  # noqa: F401
    monomial_basis,
    monomial_chain,
    monomial_powers,
    num_monomials,
    poly_apply,
)
# NB: the bare `ssim` function is not re-exported here — it would shadow the
# `curl_tpu.ops.ssim` module attribute. Use `ops.ssim.ssim` / `ms_ssim`.
from curl_tpu.ops.ssim import ms_ssim  # noqa: F401
