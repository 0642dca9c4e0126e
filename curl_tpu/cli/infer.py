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


def build_enhancer(
    cfg: Config, checkpoint_dir: str, backbone_size: int = 320, out_u8: bool = False
) -> Enhancer:
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
        out_u8=out_u8,
        auto_tile_pixels=cfg.auto_tile_pixels,
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


def infer_dir(
    img_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    backbone_size: int = 320,
    batch_size: int = 8,
    resize_to: Optional[tuple[int, int]] = None,
    max_in_flight: int = 6,
    cfg: Optional[Config] = None,
) -> list[str]:
    """Pipelined directory enhancement through `Enhancer.enhance_stream`:
    images are decoded on the host, batched at a common resolution, and
    kept `max_in_flight` programs deep on the device, so the dispatch
    round-trip is paid once per window instead of once per image
    (docs/ROOFLINE.md — the 305 img/s serving path). Images ride the wire
    as raw uint8 both ways (4x fewer tunnel bytes than fp32: inputs are
    normalized and outputs floor-quantized inside the program —
    byte-identical files to the fp32 path). Images are grouped by
    resolution; pass `resize_to=(H, W)` to force one group."""
    import os

    from curl_tpu.data.dataset import decode_u8
    from curl_tpu.utils.imageio import save_image_u8

    cfg = cfg or Config()
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    names = sorted(
        n for n in os.listdir(img_dir) if n.lower().endswith(exts)
    )
    if not names:
        raise FileNotFoundError(f"no images in {img_dir}")
    os.makedirs(out_dir, exist_ok=True)
    enh = build_enhancer(cfg, checkpoint_dir, backbone_size, out_u8=True)

    # Group by target resolution: one compiled program per (batch, H, W).
    groups: dict[tuple[int, int], list[tuple[str, np.ndarray]]] = {}
    for n in names:
        img = decode_u8(os.path.join(img_dir, n))
        if resize_to is not None:
            from PIL import Image

            pil = Image.fromarray(img).resize(
                (resize_to[1], resize_to[0]), Image.BILINEAR
            )
            img = np.asarray(pil, np.uint8)
        groups.setdefault(img.shape[:2], []).append((n, img))

    written: list[str] = []
    for shape, items in groups.items():
        # Images above the per-image HBM heuristic can't run as one whole-
        # image program at any batch size (docs/ROOFLINE.md: whole 8K OOMs);
        # serve them through the auto-banded single-image path instead —
        # the Enhancer's own routing predicate decides.
        if enh.needs_banding(shape[0], shape[1]) is not None:
            import jax.numpy as jnp

            for name, im in items:
                small = center_crop(
                    resize_shorter_side(im, backbone_size), backbone_size
                )
                out = enh.enhance_image(
                    jnp.asarray(small[None]),
                    jnp.ones(small.shape[:2] + (1,), jnp.uint8)[None],
                    jnp.asarray(im[None]),
                )
                path = os.path.join(out_dir, name)
                save_image_u8(np.asarray(out[0]), path)
                written.append(path)
            continue
        # One compiled program per resolution group: the trailing chunk is
        # padded (by repeating its last image) up to the group's batch size
        # so a 9-image group at batch 8 compiles ONE program, not two — a
        # recompile costs minutes on slow hosts. Padded outputs are dropped
        # before saving. A group smaller than batch_size runs at its own
        # (single) batch size — still one program.
        group_bs = min(batch_size, len(items))

        def batches():
            for i in range(0, len(items), group_bs):
                chunk = items[i : i + group_bs]
                pad = group_bs - len(chunk)
                tgt = np.stack([im for _, im in chunk] + [chunk[-1][1]] * pad)
                small = np.stack(
                    [
                        center_crop(resize_shorter_side(im, backbone_size), backbone_size)
                        for _, im in chunk
                    ]
                    + [
                        center_crop(
                            resize_shorter_side(chunk[-1][1], backbone_size), backbone_size
                        )
                    ]
                    * pad
                )
                smask = np.ones(small.shape[:3] + (1,), np.uint8)
                yield small, smask, tgt

        idx = 0
        for out in enh.enhance_stream(batches(), max_in_flight=max_in_flight):
            arr = np.asarray(out)
            for b in range(min(arr.shape[0], len(items) - idx)):
                name = items[idx][0]
                path = os.path.join(out_dir, name)
                save_image_u8(arr[b], path)
                written.append(path)
                idx += 1
    return written


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Run image enhancement on a single image or a directory"
    )
    parser.add_argument("--img_path", default=None)
    parser.add_argument("--img_dir", default=None,
                        help="enhance every image in a directory (pipelined)")
    parser.add_argument("--mask_path", default=None)
    parser.add_argument("--checkpoint_dir", required=True, help="Orbax checkpoint directory")
    parser.add_argument("--model", default=Config.model,
                        choices=["trispace", "curve", "polyreg"],
                        help="model family the checkpoint was trained with")
    parser.add_argument("--backbone", default=Config.backbone)
    parser.add_argument("--out_path", default=None)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--backbone_size", type=int, default=320)
    parser.add_argument("--tile_rows", type=int, default=None)
    parser.add_argument("--auto_tile_pixels", type=int, default=None,
                        help="per-image pixel bound above which inference "
                             "auto-streams row bands (default: the engine's "
                             "v5e HBM calibration; tune per platform)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_in_flight", type=int, default=6,
                        help="pipeline depth for --img_dir streaming")
    parser.add_argument("--resize_to", default=None, metavar="HxW",
                        help="resize all --img_dir images to one resolution "
                             "(single compiled program, e.g. 1080x1920)")
    args = parser.parse_args(argv)
    cfg = Config(model=args.model, backbone=args.backbone,
                 auto_tile_pixels=args.auto_tile_pixels)
    if args.model == "curve" and args.tile_rows is not None:
        parser.error("--tile_rows applies to the polynomial model only "
                     "(the curve model applies in one fused pass)")
    if args.img_dir:
        if not args.out_dir:
            parser.error("--img_dir requires --out_dir")
        if args.tile_rows is not None or args.mask_path:
            # Directory mode enhances whole, unmasked images; silently
            # ignoring these flags would surprise the user.
            parser.error("--tile_rows/--mask_path are not supported with --img_dir "
                         "(use single-image --img_path mode)")
        resize_to = None
        if args.resize_to:
            try:
                h, w = (int(v) for v in args.resize_to.lower().split("x"))
                resize_to = (h, w)
            except ValueError:
                parser.error("--resize_to must look like 1080x1920")
        infer_dir(
            args.img_dir,
            args.checkpoint_dir,
            args.out_dir,
            backbone_size=args.backbone_size,
            batch_size=args.batch_size,
            resize_to=resize_to,
            max_in_flight=args.max_in_flight,
            cfg=cfg,
        )
        return
    if not args.img_path or not args.out_path:
        parser.error("pass --img_path/--out_path, or --img_dir/--out_dir")
    infer(
        args.img_path,
        args.mask_path,
        args.checkpoint_dir,
        args.out_path,
        backbone_size=args.backbone_size,
        tile_rows=args.tile_rows,
        cfg=cfg,
    )


if __name__ == "__main__":
    main()
