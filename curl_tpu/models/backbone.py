"""EfficientNetV2 backbone in Flax linen, built from scratch.

The reference uses timm's `efficientnetv2_rw_t` (13.6M params) as its
coefficient-prediction CNN (reference model.py:456; `efficientnetv2_rw_s`
for the secondary models, model.py:189,427). This module implements the
EfficientNetV2 block zoo natively:

  * ConvBnAct ("cn") — plain conv + BN + SiLU,
  * EdgeResidual ("er", a.k.a. Fused-MBConv) — 3x3 expand conv + 1x1
    project,
  * InvertedResidual ("ir", MBConv) — 1x1 expand, 3x3 depthwise,
    squeeze-excite, 1x1 project,

with stage configs for the rw_t / rw_s variants plus a tiny config for fast
tests. NHWC throughout; convs use explicit symmetric k//2 padding (timm's
torch behavior — which differs from XLA's SAME, asymmetric right-heavy for
stride-2 odd kernels) so converted torch checkpoints reproduce activations
exactly.

Batch statistics can be synchronized across data-parallel replicas by
passing `bn_axis_name` (the TPU-native replacement for SyncBatchNorm,
reference model.py:457-458): linen's BatchNorm then psums batch moments over
the named mesh axis inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    kind: str  # "cn" | "er" | "ir"
    repeats: int
    kernel: int
    stride: int
    expand: int
    channels: int
    se_ratio: float = 0.0


@dataclasses.dataclass(frozen=True)
class BackboneCfg:
    stem_channels: int
    blocks: tuple[BlockCfg, ...]
    num_features: int  # head conv width (the backbone's output embedding)

    @property
    def out_features(self) -> int:
        return self.num_features


# timm `efficientnetv2_rw_t` topology: the EfficientNetV2-S arch scaled by
# channel_multiplier 0.8 (rounded to /8) and depth_multiplier 0.9 (ceil),
# head width 1024 — consistent with the reference's replaced classifier
# taking in_features=1024 (reference model.py:459). ~13.6M params.
EFFICIENTNETV2_RW_T = BackboneCfg(
    stem_channels=24,
    blocks=(
        BlockCfg("cn", 2, 3, 1, 1, 24),
        BlockCfg("er", 4, 3, 2, 4, 40),
        BlockCfg("er", 4, 3, 2, 4, 48),
        BlockCfg("ir", 6, 3, 2, 4, 104, 0.25),
        BlockCfg("ir", 9, 3, 1, 6, 128, 0.25),
        BlockCfg("ir", 14, 3, 2, 6, 208, 0.25),
    ),
    num_features=1024,
)

# timm `efficientnetv2_rw_s` topology (the "rw" variant of V2-S: EdgeResidual
# first stage, 272-wide last stage, head 1792 — consistent with the
# reference's rw_s classifier in_features=1792, model.py:190,428). Used by
# the secondary PolyRegNet / CurlCurveNet models.
EFFICIENTNETV2_RW_S = BackboneCfg(
    stem_channels=24,
    blocks=(
        BlockCfg("er", 2, 3, 1, 1, 24),
        BlockCfg("er", 4, 3, 2, 4, 48),
        BlockCfg("er", 4, 3, 2, 4, 64),
        BlockCfg("ir", 6, 3, 2, 4, 128, 0.25),
        BlockCfg("ir", 9, 3, 1, 6, 160, 0.25),
        BlockCfg("ir", 15, 3, 2, 6, 272, 0.25),
    ),
    num_features=1792,
)

# Small config for unit tests and quick experiments.
TINY = BackboneCfg(
    stem_channels=8,
    blocks=(
        BlockCfg("cn", 1, 3, 1, 1, 8),
        BlockCfg("er", 1, 3, 2, 2, 16),
        BlockCfg("ir", 1, 3, 2, 2, 24, 0.25),
    ),
    num_features=64,
)

CONFIGS = {
    "efficientnetv2_rw_t": EFFICIENTNETV2_RW_T,
    "efficientnetv2_rw_s": EFFICIENTNETV2_RW_S,
    "tiny": TINY,
}

_BN_MOMENTUM = 0.9  # = 1 - torch momentum 0.1
_BN_EPS = 1e-5


def _torch_same_pad(kernel: int, stride: int) -> list[tuple[int, int]]:
    """PyTorch-style 'same' padding (pad = k//2 on both sides). For odd
    kernels with stride 2 this differs from XLA's SAME (which pads
    asymmetrically right-heavy only when needed); using explicit pads keeps
    converted checkpoints activation-exact."""
    p = kernel // 2
    return [(p, p), (p, p)]


def _bn(x: Array, train: bool, axis_name: Optional[str], name: str) -> Array:
    """BatchNorm child registered on the calling module's scope (keeps param
    paths flat: <block>/<name>/{scale,bias} + batch_stats mean/var)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=_BN_MOMENTUM,
        epsilon=_BN_EPS,
        axis_name=axis_name if train else None,
        dtype=x.dtype,
        name=name,
    )(x)


class SqueezeExcite(nn.Module):
    """SE gate with reduction computed from the block *input* width, as
    timm's EfficientNet SE does."""

    reduced: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), use_bias=True, name="reduce", dtype=x.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="expand", dtype=x.dtype)(s)
        return x * nn.sigmoid(s)


class ConvBnAct(nn.Module):
    cfg: BlockCfg
    stride: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        k = self.cfg.kernel
        x = nn.Conv(
            self.cfg.channels,
            (k, k),
            strides=self.stride,
            padding=_torch_same_pad(k, self.stride),
            use_bias=False,
            name="conv",
            dtype=x.dtype,
        )(x)
        x = _bn(x, train, self.bn_axis_name, "bn")
        x = nn.silu(x)
        if self.stride == 1 and shortcut.shape[-1] == x.shape[-1]:
            x = x + shortcut
        return x


class EdgeResidual(nn.Module):
    """Fused-MBConv: full 3x3 expansion conv + 1x1 projection."""

    cfg: BlockCfg
    stride: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        in_ch = x.shape[-1]
        mid = in_ch * self.cfg.expand
        k = self.cfg.kernel
        x = nn.Conv(
            mid,
            (k, k),
            strides=self.stride,
            padding=_torch_same_pad(k, self.stride),
            use_bias=False,
            name="conv_exp",
            dtype=x.dtype,
        )(x)
        x = _bn(x, train, self.bn_axis_name, "bn1")
        x = nn.silu(x)
        x = nn.Conv(self.cfg.channels, (1, 1), use_bias=False, name="conv_pwl", dtype=x.dtype)(x)
        x = _bn(x, train, self.bn_axis_name, "bn2")
        if self.stride == 1 and shortcut.shape[-1] == x.shape[-1]:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand, kxk depthwise, squeeze-excite, 1x1 project."""

    cfg: BlockCfg
    stride: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        in_ch = x.shape[-1]
        mid = in_ch * self.cfg.expand
        k = self.cfg.kernel
        x = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw", dtype=x.dtype)(x)
        x = _bn(x, train, self.bn_axis_name, "bn1")
        x = nn.silu(x)
        x = nn.Conv(
            mid,
            (k, k),
            strides=self.stride,
            padding=_torch_same_pad(k, self.stride),
            feature_group_count=mid,
            use_bias=False,
            name="conv_dw",
            dtype=x.dtype,
        )(x)
        x = _bn(x, train, self.bn_axis_name, "bn2")
        x = nn.silu(x)
        if self.cfg.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_ch * self.cfg.se_ratio)), name="se")(x)
        x = nn.Conv(self.cfg.channels, (1, 1), use_bias=False, name="conv_pwl", dtype=x.dtype)(x)
        x = _bn(x, train, self.bn_axis_name, "bn3")
        if self.stride == 1 and shortcut.shape[-1] == x.shape[-1]:
            x = x + shortcut
        return x


_BLOCKS = {"cn": ConvBnAct, "er": EdgeResidual, "ir": InvertedResidual}


class EfficientNetV2(nn.Module):
    """Feature extractor: NHWC image -> (B, num_features) embedding
    (head conv + BN + SiLU + global average pool)."""

    cfg: BackboneCfg = EFFICIENTNETV2_RW_T
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.cfg
        x = nn.Conv(
            c.stem_channels,
            (3, 3),
            strides=2,
            padding=_torch_same_pad(3, 2),
            use_bias=False,
            name="stem_conv",
            dtype=x.dtype,
        )(x)
        x = _bn(x, train, self.bn_axis_name, "stem_bn")
        x = nn.silu(x)
        for si, stage in enumerate(c.blocks):
            block_cls = _BLOCKS[stage.kind]
            for bi in range(stage.repeats):
                stride = stage.stride if bi == 0 else 1
                x = block_cls(
                    stage,
                    stride,
                    self.bn_axis_name,
                    name=f"stage{si}_block{bi}",
                )(x, train)
        x = nn.Conv(c.num_features, (1, 1), use_bias=False, name="head_conv", dtype=x.dtype)(x)
        x = _bn(x, train, self.bn_axis_name, "head_bn")
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2))


class MLPHead(nn.Module):
    """The reference's replaced classifier: a stack of bias-ful Linear layers
    with no activations between them (reference model.py:459-463) —
    reproduced as-is for checkpoint compatibility.

    When `last_bias_init` is given, the final layer starts with zero kernel
    and that bias vector — used by TriSpacePolyNet's identity
    initialization, which makes a fresh model the identity transform (not a
    reference behavior, but markedly better training dynamics)."""

    widths: Sequence[int]
    last_bias_init: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        last = len(self.widths) - 1
        for i, w in enumerate(self.widths):
            init = {}
            if self.last_bias_init is not None and i == last:
                bias = jnp.asarray(self.last_bias_init, jnp.float32)
                init = {
                    "kernel_init": nn.initializers.zeros,
                    "bias_init": lambda key, shape, dtype=jnp.float32, b=bias: (
                        b.astype(dtype)
                    ),
                }
            x = nn.Dense(w, name=f"fc{i}", dtype=x.dtype, **init)(x)
        return x
