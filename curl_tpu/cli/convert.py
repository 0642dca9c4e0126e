"""Convert a PyTorch reference checkpoint into a curl_tpu (orbax) checkpoint.

The migration path for users of the reference: load their trained
`TriSpaceRegNet` .pt file (handling the DP/DDP `module.` prefix and legacy
shapes like the reference's convert_state.py), map it onto our flax
parameter tree, and write an orbax checkpoint the training/inference CLIs
can consume.

  python -m curl_tpu.cli.convert --torch_checkpoint=model.pt \
      --out_dir=converted_ckpt [--backbone=efficientnetv2_rw_t]

Requires torch (CPU build is enough) to deserialize the .pt file.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert(
    torch_checkpoint: str,
    out_dir: str,
    backbone: str = "efficientnetv2_rw_t",
    polynomial_order: int = 4,
    spatial: bool = True,
) -> str:
    import torch

    import jax
    import orbax.checkpoint as ocp

    from curl_tpu.export.torch_convert import convert_trispace_state_dict
    from curl_tpu.models import backbone as bb

    payload = torch.load(torch_checkpoint, map_location="cpu", weights_only=False)
    state_dict = payload.get("model_state_dict", payload)
    num_in = 3 + 2 * int(spatial)
    variables = convert_trispace_state_dict(
        state_dict,
        backbone_cfg=bb.CONFIGS[backbone],
        polynomial_order=polynomial_order,
        num_in=num_in,
    )
    epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0

    out = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "epoch": epoch,
    }
    path = os.path.abspath(out_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, out, force=True)
    return path


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Convert a PyTorch CURL checkpoint")
    ap.add_argument("--torch_checkpoint", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    ap.add_argument("--polynomial_order", type=int, default=4)
    ap.add_argument("--spatial", type=lambda s: s.lower() in ("1", "true"), default=True)
    args = ap.parse_args(argv)
    path = convert(
        args.torch_checkpoint,
        args.out_dir,
        backbone=args.backbone,
        polynomial_order=args.polynomial_order,
        spatial=args.spatial,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
