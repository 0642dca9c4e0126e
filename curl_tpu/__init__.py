"""curl_tpu — TPU-native neural color-curve image enhancement framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
danielbulhosa/CURL (CURL: Neural Curve Layers for Global Image Enhancement,
arXiv 1911.13175): a CNN backbone predicts parameters of smooth global color
transforms — degree-4 multivariate polynomials over (R,G,B,x,y) and
piecewise-linear knot curves — applied per-pixel in RGB, CIELab and HSV color
spaces to produce an enhancement residual.

Layout convention: images are NHWC float arrays in [0, 1] (channels-last is
the TPU lane dimension). The PyTorch reference uses NCHW; the checkpoint
converter (`curl_tpu.export.torch_convert`) transposes at the boundary.
"""

__version__ = "0.1.0"

from curl_tpu import ops  # noqa: F401
