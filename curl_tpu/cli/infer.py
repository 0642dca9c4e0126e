"""Single-image high-resolution inference CLI (counterpart of the
reference's infer.py).

Coefficients are predicted from a 320x320 view; the polynomial transform is
applied at the image's native resolution; background is matted white through
the mask like the mobile app (reference infer.py:10-51).

  python -m curl_tpu.cli.infer --img_path in.jpg --mask_path mask.png \
      --checkpoint_dir log_x/checkpoints/curl_..._model --out_path out.jpg
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import numpy as np

from curl_tpu.config import Config
from curl_tpu.data.dataset import load_image
from curl_tpu.infer.engine import Enhancer, center_crop, resize_shorter_side
from curl_tpu.train import checkpoint as ckpt_lib
from curl_tpu.train import loop as loop_lib
from curl_tpu.train import state as state_lib


def build_enhancer(cfg: Config, checkpoint_dir: str, backbone_size: int = 320) -> Enhancer:
    model = loop_lib.build_model(cfg)
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
    sample = np.zeros((1, backbone_size, backbone_size, 3), np.float32)
    sample_mask = np.ones((1, backbone_size, backbone_size, 1), np.float32)
    state = state_lib.create_train_state(
        model, jax.random.PRNGKey(0), sample, sample_mask, tx
    )
    state, _ = ckpt_lib.restore(checkpoint_dir, state)
    return Enhancer(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        backbone_size=backbone_size,
        impl=cfg.residual_impl,
    )


def infer(
    img_path: str,
    mask_path: Optional[str],
    checkpoint_dir: str,
    out_path: str,
    backbone_size: int = 320,
    tile_rows: Optional[int] = None,
    cfg: Optional[Config] = None,
) -> np.ndarray:
    cfg = cfg or Config()
    target = load_image(img_path)
    if mask_path:
        target_mask = load_image(mask_path, mono=True).astype(np.float32)[..., None]
    else:
        target_mask = np.ones(target.shape[:2] + (1,), np.float32)

    small = center_crop(resize_shorter_side(target, backbone_size), backbone_size)
    small_mask = (
        center_crop(resize_shorter_side(target_mask, backbone_size), backbone_size) > 0
    ).astype(np.float32)

    enh = build_enhancer(cfg, checkpoint_dir, backbone_size)
    out = enh.enhance_image(
        small[None],
        small_mask[None],
        target[None],
        target_mask[None],
        tile_rows=tile_rows,
        white_background=True,
    )
    arr = np.clip(np.asarray(out[0]) * 255.0, 0, 255).astype(np.uint8)
    if out_path:
        from curl_tpu.utils.imageio import save_image_u8

        save_image_u8(np.asarray(out[0]), out_path)
    return arr


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Run image enhancement on a single image")
    parser.add_argument("--img_path", required=True)
    parser.add_argument("--mask_path", default=None)
    parser.add_argument("--checkpoint_dir", required=True, help="Orbax checkpoint directory")
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--backbone_size", type=int, default=320)
    parser.add_argument("--tile_rows", type=int, default=None)
    args = parser.parse_args(argv)
    infer(
        args.img_path,
        args.mask_path,
        args.checkpoint_dir,
        args.out_path,
        backbone_size=args.backbone_size,
        tile_rows=args.tile_rows,
    )


if __name__ == "__main__":
    main()
