"""Single config dataclass for training / evaluation / inference.

Surfaces every knob the reference hard-codes (its argparse flags,
main.py:72-93, plus the buried constants: Adam betas main.py:236-237,
OneCycle peak main.py:239, crop size data.py:86, SSIM window main.py:228,
polynomial order / spatial flags main.py:179,220, knot counts
model.py:123-124) as one dataclass with CLI overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    # Data
    training_img_dirpath: Optional[str] = None
    inference_img_dirpath: Optional[str] = None
    # Which split list batch-inference mode evaluates: images_<split>.txt in
    # the inference dir. `--eval_split=test` + a converted checkpoint is the
    # one-command Adobe5K-DPE test-split parity check (north star).
    eval_split: str = "inference"  # inference | test | valid | train
    batch_size: int = 32  # global batch (reference default per-gpu 32, main.py:88)
    num_workers: int = 8  # decode threads (reference: 11 procs, main.py:89)
    # Decoded-image RAM cache budget per Loader, MB (0 = off). The reference
    # re-decodes every image every epoch (data.py:83-193); on few-core hosts
    # decode is the training bottleneck and a first-N-that-fit cache removes
    # it for datasets that fit (Adobe5K ~25 GB decoded).
    cache_mb: int = 0
    crop_h: int = 256
    crop_w: int = 256

    # Model
    model: str = "trispace"  # trispace | curve | polyreg
    backbone: str = "efficientnetv2_rw_t"
    polynomial_order: int = 4
    spatial: bool = True
    num_lab_points: int = 48
    num_rgb_points: int = 48
    num_hsv_points: int = 64
    residual_impl: str = "xla"  # xla | pallas
    # Per-image pixel bound above which inference auto-streams row bands.
    # None = the engine default (infer/engine.AUTO_TILE_PIXELS, the single
    # source of truth for the v5e HBM calibration); tune per platform.
    auto_tile_pixels: Optional[int] = None
    curve_impl: str = "xla"  # xla | pallas (curve model fused pass)
    compute_dtype: str = "float32"  # float32 | bfloat16 (backbone fast mode)
    # NOTE: parameters are always fp32 (the right TPU recipe at this model
    # scale: fp32 master weights, optional bf16 compute via compute_dtype).
    identity_init: bool = False  # initialize model as the identity transform
    # Path to a raw timm EfficientNetV2 ImageNet .pt: initialize the backbone
    # from it before training (the reference's `pretrained=True` start,
    # model.py:456). Head/polynomial params stay freshly initialized.
    pretrained_backbone: Optional[str] = None

    # Loss / metrics
    ssim_window_size: int = 11

    # Optimization
    num_epoch: int = 10000
    valid_every: int = 10
    peak_lr: float = 1e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    lr_epoch_granularity: bool = True
    clip_grad_norm: float = 0.0  # 0 = off
    curve_reg_weight: float = 1e-4  # slope-smoothness weight (curve model)
    augment: bool = True

    # Checkpoint / logging
    checkpoint_filepath: Optional[str] = None
    auto_resume: bool = False  # resume from newest checkpoint in log dir
    log_dirpath: Optional[str] = None
    profile_dir: Optional[str] = None  # jax.profiler trace output
    save_images: bool = False
    keep_checkpoints: int = 5

    # Parallelism
    mesh_data: Optional[int] = None  # default: all devices
    mesh_model: int = 1

    # Numerics. TPU matmuls/convs default to fast single-pass bf16;
    # measured on the real v5e, training diverges with them (loss climbs
    # once the LR ramps — the degree-4 polynomial head amplifies bf16
    # conv/grad noise; identical runs on CPU fp32 converge). "high"
    # (3-pass bf16, ~fp32-accurate) restores convergence at 3x the
    # training throughput of "highest" (6-pass) with indistinguishable
    # loss/PSNR trajectories — docs/TRAIN_EVIDENCE.md. Set "default" to
    # get the fast single pass back (fine for inference-only work).
    matmul_precision: str = "high"  # default | high | highest
    # Force a jax backend (e.g. "cpu") before any device use. The TPU plugin
    # ignores the JAX_PLATFORMS env var (CLAUDE.md), so subprocess drivers
    # (tools/adobe5k_run.py --selftest --cpu) need a CLI knob. None = default.
    platform: Optional[str] = None

    # Misc
    seed: int = 0


def _add_args(parser: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        ann = str(f.type)
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=f.default,
            )
        elif f.default is None and "int" in ann:
            # Optional[int] fields (e.g. --mesh_data) must parse as int.
            parser.add_argument(name, type=int, default=None)
        else:
            typ = {int: int, float: float}.get(type(f.default), str)
            parser.add_argument(name, type=typ, default=f.default)


def parse_config(argv: Optional[list[str]] = None) -> Config:
    parser = argparse.ArgumentParser(
        description="Train / evaluate the CURL TPU framework on image pairs"
    )
    _add_args(parser)
    args = parser.parse_args(argv)
    return Config(**{f.name: getattr(args, f.name) for f in dataclasses.fields(Config)})
