"""Convert a PyTorch reference checkpoint into a curl_tpu (orbax) checkpoint.

The migration path for users of the reference: load their trained
`TriSpaceRegNet` .pt file (handling the DP/DDP `module.` prefix and legacy
shapes like the reference's convert_state.py), map it onto our flax
parameter tree, validate every array shape against a freshly initialized
model, and write a *full training-state* orbax checkpoint (params,
batch_stats, fresh optimizer state, step, epoch) that the training and
inference CLIs restore directly.

  python -m curl_tpu.cli.convert --torch_checkpoint=model.pt \
      --out_dir=converted_ckpt [--backbone=efficientnetv2_rw_t]

Requires torch (CPU build is enough) to deserialize the .pt file.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _validate_shapes(converted: dict, model, sample_hw: int = 64) -> None:
    """Compare every converted array's shape against the model's own
    initialization — name-level key matching alone would let a mis-sized
    layer through to a cryptic failure inside apply()."""
    import flax
    import jax

    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, sample_hw, sample_hw, 3), np.float32),
            np.ones((1, sample_hw, sample_hw, 1), np.float32),
        )
    )
    errors = []
    for col in ("params", "batch_stats"):
        expected = flax.traverse_util.flatten_dict(variables.get(col, {}), sep="/")
        got = flax.traverse_util.flatten_dict(converted.get(col, {}), sep="/")
        for k, v in expected.items():
            if k not in got:
                errors.append(f"missing {col}/{k}")
            elif tuple(np.shape(got[k])) != tuple(v.shape):
                errors.append(
                    f"shape mismatch {col}/{k}: checkpoint {np.shape(got[k])} vs model {tuple(v.shape)}"
                )
        for k in got:
            if k not in expected:
                errors.append(f"unexpected {col}/{k}")
    if errors:
        raise ValueError(
            "converted checkpoint does not fit the model:\n  " + "\n  ".join(errors[:20])
        )


def convert(
    torch_checkpoint: str,
    out_dir: str,
    backbone: str = "efficientnetv2_rw_t",
    polynomial_order: int = 4,
    spatial: bool = True,
    validate: bool = True,
    pretrained_backbone: bool = False,
    identity_init: bool = False,
) -> str:
    """Two modes:
      * default: the .pt is a full trained TriSpaceRegNet checkpoint
        (reference main.py:319-338 layout) — everything converted.
      * pretrained_backbone: the .pt is a RAW timm `efficientnetv2_rw_*`
        ImageNet checkpoint (no `backbone.` prefix, single-Linear
        classifier); only the backbone is converted, head/poly stay at
        fresh initialization — the reference's `pretrained=True` start
        (model.py:456). `identity_init` additionally makes the fresh head
        start as the identity transform.
    """
    import torch

    import jax
    import orbax.checkpoint as ocp

    from curl_tpu.export.torch_convert import (
        convert_trispace_state_dict,
        init_with_pretrained_backbone,
    )
    from curl_tpu.models import TriSpacePolyNet
    from curl_tpu.models import backbone as bb
    from curl_tpu.train import state as state_lib

    payload = torch.load(torch_checkpoint, map_location="cpu", weights_only=False)
    state_dict = payload.get("model_state_dict", payload)
    num_in = 3 + 2 * int(spatial)
    model = TriSpacePolyNet(
        polynomial_order=polynomial_order, spatial=spatial, backbone=backbone,
        identity_init=identity_init,
    )
    if pretrained_backbone:
        variables = init_with_pretrained_backbone(
            model,
            jax.random.PRNGKey(0),
            np.zeros((1, 64, 64, 3), np.float32),
            np.ones((1, 64, 64, 1), np.float32),
            state_dict,
        )
        epoch = 0
    else:
        variables = convert_trispace_state_dict(
            state_dict,
            backbone_cfg=bb.CONFIGS[backbone],
            polynomial_order=polynomial_order,
            num_in=num_in,
        )
        epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
    if validate:
        _validate_shapes(variables, model)

    # Full training-state layout so ckpt_lib.restore (used by every CLI)
    # loads it directly; the optimizer state is freshly initialized.
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    out = {
        "params": params,
        "batch_stats": jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        "opt_state": tx.init(params),
        "step": np.zeros((), np.int32),
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
    ap.add_argument(
        "--validate", type=lambda s: s.lower() in ("1", "true"), default=True,
        help="check every converted array shape against the model",
    )
    ap.add_argument(
        "--pretrained_backbone", action="store_true",
        help="the .pt is a raw timm ImageNet checkpoint: convert only the "
        "backbone, leave the head freshly initialized",
    )
    ap.add_argument(
        "--identity_init", action="store_true",
        help="with --pretrained_backbone: start the fresh head as the "
        "identity transform",
    )
    args = ap.parse_args(argv)
    path = convert(
        args.torch_checkpoint,
        args.out_dir,
        backbone=args.backbone,
        polynomial_order=args.polynomial_order,
        spatial=args.spatial,
        validate=args.validate,
        pretrained_backbone=args.pretrained_backbone,
        identity_init=args.identity_init,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
