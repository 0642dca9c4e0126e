"""Deployment-export CLI — counterpart of the reference's
`python coreml_conversion.py --model_file ... --out_file ...`
(/root/reference/coreml_conversion.py:9-43).

  python -m curl_tpu.cli.export --checkpoint_dir log_x/checkpoints/curl_... \
      --out_path enhancer.tflite [--format tflite|stablehlo] \
      [--target_h 1000 --target_w 1000] [--smoke_test]

tflite: a flatbuffer the TFLite interpreter runs with no jax (mobile/serving
artifact; fixed target resolution). stablehlo: the portable exchange format
(symbolic target dims). --smoke_test converts then executes the artifact on
random inputs and checks against the jax forward, like the reference's
MLModel predict (coreml_conversion.py:40-43).
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def export(
    checkpoint_dir: str,
    out_path: str,
    fmt: str = "tflite",
    model_name: str = "trispace",
    backbone: str = "efficientnetv2_rw_t",
    backbone_size: int = 320,
    target_h: int = 1000,
    target_w: int = 1000,
    target_hw_list: Optional[list[tuple[int, int]]] = None,
    smoke_test: bool = False,
) -> str:
    import jax

    from curl_tpu.config import Config
    from curl_tpu.export import stablehlo as hlo_lib
    from curl_tpu.export import tflite as tflite_lib
    from curl_tpu.train import checkpoint as ckpt_lib
    from curl_tpu.train import loop as loop_lib
    from curl_tpu.train import state as state_lib

    cfg = Config(model=model_name, backbone=backbone)
    model = loop_lib.build_model(cfg)
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
    s = backbone_size
    sample = np.zeros((1, s, s, 3), np.float32)
    sample_mask = np.ones((1, s, s, 1), np.float32)
    state = state_lib.create_train_state(
        model, jax.random.PRNGKey(0), sample, sample_mask, tx
    )
    state, _ = ckpt_lib.restore(checkpoint_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if fmt == "mobile":
        # Any-resolution mobile artifact set: one fixed-shape TFLite
        # coefficient predictor + a generated portable C apply kernel the
        # app compiles — the full RangeDim capability of the reference's
        # CoreML export (coreml_conversion.py:30-37); see export/mobile.py.
        from curl_tpu.export import mobile as mobile_lib

        if model_name != "trispace":
            raise ValueError(
                "--format mobile exports the tri-space polynomial model "
                "(the coefficient-predictor/apply split has no curve-model "
                "counterpart yet); use --format tflite or stablehlo"
            )
        stem = out_path[: -len(".tflite")] if out_path.endswith(".tflite") else out_path
        manifest = mobile_lib.export_mobile_bundle(
            model, variables, stem, backbone_size=s,
            extra_meta={"model": model_name, "backbone": backbone,
                        "checkpoint": checkpoint_dir},
        )
        if smoke_test:
            worst = mobile_lib.smoke_test_bundle(
                model, variables, stem, backbone_size=s,
                target_hws=((target_h, target_w), (97, 53)),
            )
            print(f"mobile smoke ok: max |artifact - jax| = {worst:.2e} "
                  f"across resolutions")
        return manifest
    if fmt == "tflite" and target_hw_list:
        # Multi-resolution bundle: one artifact per serving resolution plus
        # a manifest — the mobile role of the reference's RangeDim CoreML
        # artifact (coreml_conversion.py:33); see export_tflite_bundle.
        stem = out_path[: -len(".tflite")] if out_path.endswith(".tflite") else out_path
        manifest = tflite_lib.export_tflite_bundle(
            model, variables, stem, backbone_size=s, target_hws=target_hw_list,
            extra_meta={"model": model_name, "backbone": backbone,
                        "checkpoint": checkpoint_dir},
        )
        if smoke_test:
            rng = np.random.default_rng(0)
            img = rng.uniform(0, 1, (1, s, s, 3)).astype(np.float32)
            mask = np.ones((1, s, s, 1), np.float32)
            for th, tw in target_hw_list:
                target = rng.uniform(0, 1, (1, th, tw, 3)).astype(np.float32)
                direct = model.apply(variables, img, mask, target)
                direct = np.asarray(direct[0] if isinstance(direct, tuple) else direct)
                got = tflite_lib.run_tflite(f"{stem}_{th}x{tw}.tflite", img, mask, target)
                err = float(np.abs(got - direct).max())
                if err > 1e-3:
                    raise AssertionError(
                        f"bundle smoke failed at {th}x{tw}: max err {err}"
                    )
                print(f"smoke test ok at {th}x{tw}: max |artifact - jax| = {err:.2e}")
        return manifest
    if fmt == "tflite":
        tflite_lib.export_tflite(
            model, variables, out_path,
            backbone_size=s, target_hw=(target_h, target_w),
        )
    elif fmt == "stablehlo":
        exported = hlo_lib.export_enhancer(model, variables, backbone_size=s)
        hlo_lib.save(exported, out_path)
    else:
        raise ValueError(f"unknown format {fmt!r}")

    if smoke_test:
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, s, s, 3)).astype(np.float32)
        mask = np.ones((1, s, s, 1), np.float32)
        target = rng.uniform(0, 1, (1, target_h, target_w, 3)).astype(np.float32)
        direct = model.apply(variables, img, mask, target)
        direct = np.asarray(direct[0] if isinstance(direct, tuple) else direct)
        if fmt == "tflite":
            got = tflite_lib.run_tflite(out_path, img, mask, target)
        else:
            got = np.asarray(hlo_lib.load(out_path).call(img, mask, target))
        err = float(np.abs(got - direct).max())
        if err > 1e-3:
            raise AssertionError(f"smoke test failed: max |artifact - jax| = {err}")
        print(f"smoke test ok: max |artifact - jax| = {err:.2e}")
    return out_path


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Export a deployment artifact")
    ap.add_argument("--checkpoint_dir", required=True, help="orbax checkpoint directory")
    ap.add_argument("--out_path", required=True)
    ap.add_argument(
        "--format", default="tflite", choices=["tflite", "stablehlo", "mobile"]
    )
    ap.add_argument("--model", default="trispace", choices=["trispace", "curve"])
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    ap.add_argument("--backbone_size", type=int, default=320)
    ap.add_argument("--target_h", type=int, default=1000)
    ap.add_argument("--target_w", type=int, default=1000)
    ap.add_argument(
        "--target_hw", default=None,
        help="comma-separated HxW list (e.g. '1080x1920,2160x3840'): export "
        "a multi-resolution tflite bundle + manifest instead of one artifact",
    )
    ap.add_argument("--smoke_test", action="store_true")
    args = ap.parse_args(argv)
    hw_list = None
    if args.target_hw:
        hw_list = [
            tuple(int(v) for v in part.split("x"))
            for part in args.target_hw.split(",")
        ]
    path = export(
        args.checkpoint_dir,
        args.out_path,
        fmt=args.format,
        model_name=args.model,
        backbone=args.backbone,
        backbone_size=args.backbone_size,
        target_h=args.target_h,
        target_w=args.target_w,
        target_hw_list=hw_list,
        smoke_test=args.smoke_test,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
