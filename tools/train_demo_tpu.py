"""Hardware quality-evidence run: train the flagship on the 9 bundled pairs.

Drives the REAL CLI surface end-to-end on the TPU: builds a dataset dir
from the reference's bundled Adobe5K-DPE example photographs
(/root/reference/adobe5k_dpe/curl_example_test_{input,output}), trains the
flagship efficientnetv2_rw_t TriSpacePolyNet from identity init with
`python -m curl_tpu.cli.main`, then evaluates the train and valid splits
with the batch-inference mode (--eval_split). Records steps, wall time,
throughput, the loss curve, and PSNR before (identity) / after in a JSON
artifact for docs/TRAIN_EVIDENCE.md.

Usage:  python tools/train_demo_tpu.py --epochs 60 --out /tmp/train_evidence.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_DPE = "/root/reference/adobe5k_dpe"

sys.path.insert(0, _REPO)


def build_dataset(dst: str) -> int:
    inp_dir = os.path.join(_DPE, "curl_example_test_input")
    out_dir = os.path.join(_DPE, "curl_example_test_output")
    os.makedirs(os.path.join(dst, "demo_input"), exist_ok=True)
    os.makedirs(os.path.join(dst, "demo_output"), exist_ok=True)
    names = []
    for i, (a, b) in enumerate(
        zip(sorted(os.listdir(inp_dir)), sorted(os.listdir(out_dir))), 1
    ):
        shutil.copy(os.path.join(inp_dir, a), os.path.join(dst, "demo_input", f"{i}.png"))
        shutil.copy(os.path.join(out_dir, b), os.path.join(dst, "demo_output", f"{i}.png"))
        names.append(str(i))
    with open(os.path.join(dst, "images_train.txt"), "w") as f:
        f.write("\n".join(names[:8]) + "\n")
    with open(os.path.join(dst, "images_valid.txt"), "w") as f:
        f.write(names[8] + "\n")
    # eval splits for the --eval_split one-command check
    with open(os.path.join(dst, "images_test.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return len(names)


def identity_psnr(root: str, split: str, crop: int) -> float:
    """PSNR of leaving the photos untouched — the bar the model must beat.
    Finite mean: one bundled pair (a4774) has identical input/output, whose
    per-image PSNR is infinite."""
    import jax.numpy as jnp
    import numpy as np

    from curl_tpu import data as cdata
    from curl_tpu.models import metrics

    records = cdata.select_records(
        cdata.scan_data_dir(root),
        cdata.read_split_ids(os.path.join(root, f"images_{split}.txt")),
    )
    loader = cdata.Loader(records, batch_size=len(records), crop=(crop, crop), train=False)
    batch = next(iter(loader))
    per = np.asarray(
        metrics.psnr_per_image(
            jnp.asarray(batch["input_img"], jnp.float32) / 255.0,
            jnp.asarray(batch["output_img"], jnp.float32) / 255.0,
            jnp.asarray(batch["mask"], jnp.float32),
        )
    )
    return float(per[np.isfinite(per)].mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--data_dir", default="/tmp/adobe9_demo")
    ap.add_argument("--log_dir", default="/tmp/adobe9_demo_log")
    ap.add_argument("--out", default="/tmp/train_evidence.json")
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    # The reference's OneCycle peak (1e-4) is a *fine-tuning* LR for
    # ImageNet-pretrained weights; training the 13M-param backbone from
    # scratch on 8 photos needs a gentler peak to not destroy the
    # identity-init starting point.
    ap.add_argument("--peak_lr", type=float, default=2e-5)
    ap.add_argument("--model", default="trispace", choices=["trispace", "curve"],
                    help="flagship polynomial model or the knot-curve model")
    ap.add_argument("--curve_impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="backbone compute dtype — bfloat16 is the advertised "
                    "fast mode (config.py) needing convergence evidence "
                    "(VERDICT r4 item 4)")
    # Decoded-image cache: round-2 measured the loop at 1.6-2.7 img/s on
    # this 1-core host while the device step alone runs 115 img/s — the gap
    # is PIL re-decode of the 9 full-res pairs every epoch. 0 disables.
    ap.add_argument("--cache_mb", type=int, default=4096)
    args = ap.parse_args()

    n = build_dataset(args.data_dir)
    print(f"dataset: {n} bundled pairs at {args.data_dir}", flush=True)
    if os.path.isdir(args.log_dir):
        shutil.rmtree(args.log_dir)

    cmd = [
        sys.executable, "-m", "curl_tpu.cli.main",
        "--training_img_dirpath", args.data_dir,
        "--num_epoch", str(args.epochs),
        "--valid_every", str(max(1, args.epochs // 6)),
        "--batch_size", str(args.batch_size),
        "--crop_h", str(args.crop), "--crop_w", str(args.crop),
        "--backbone", args.backbone,
        "--model", args.model,
        "--peak_lr", str(args.peak_lr),
        "--log_dirpath", args.log_dir,
        "--keep_checkpoints", "2",
        "--save_images", "false",
        "--cache_mb", str(args.cache_mb),
        "--compute_dtype", args.compute_dtype,
    ]
    if args.model == "trispace":
        # Identity init (sigmoid-constant biases) only applies to the
        # polynomial model; the curve model starts from its default init.
        cmd += ["--identity_init", "true"]
    if args.model == "curve":
        cmd += ["--curve_impl", args.curve_impl]
    print("train:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO, timeout=7200)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        raise SystemExit(f"training failed rc={proc.returncode}")

    # Parse the loss curve and valid PSNR from the training log
    # (formats: "[N] train loss: X (Y img/s, lr Z)";
    #           "loss_valid: X psnr_valid: Y msssim_valid: Z").
    log_text = proc.stdout + proc.stderr
    losses = [float(m) for m in re.findall(r"train loss: ([0-9.eE+-]+)", log_text)]
    psnrs = [float(m) for m in re.findall(r"psnr_valid: ([0-9.]+)", log_text)]

    from curl_tpu.train import checkpoint as ckpt_lib

    ckpt_root = os.path.join(args.log_dir, "checkpoints")
    best = ckpt_lib.best_checkpoint(ckpt_root)
    print("best checkpoint:", best, flush=True)

    # One-command eval of the full 9 images (the --eval_split surface).
    eval_cmd = [
        sys.executable, "-m", "curl_tpu.cli.main",
        "--checkpoint_filepath", best,
        "--inference_img_dirpath", args.data_dir,
        "--eval_split", "test",
        "--batch_size", str(args.batch_size),
        "--crop_h", str(args.crop), "--crop_w", str(args.crop),
        "--backbone", args.backbone,
        "--model", args.model,
        "--log_dirpath", args.log_dir + "_eval",
        "--save_images", "true",
    ]
    if args.model == "curve":
        eval_cmd += ["--curve_impl", args.curve_impl]
    print("eval:", " ".join(eval_cmd), flush=True)
    eproc = subprocess.run(eval_cmd, capture_output=True, text=True, cwd=_REPO, timeout=3600)
    sys.stdout.write(eproc.stdout[-3000:])
    sys.stderr.write(eproc.stderr[-3000:])
    eval_text = eproc.stdout + eproc.stderr
    eval_psnr = [float(m) for m in re.findall(r"psnr_\w+: ([0-9.]+)", eval_text)]

    ident = identity_psnr(args.data_dir, "test", args.crop)
    steps = args.epochs  # one step per epoch at batch 8 over 8 train images

    # Steady-state loop rate: the Trainer logs per-epoch img/s (incl. host
    # feed + H2D + device step, excl. compile/eval/checkpoint); the median
    # is the honest sustained number, where wall_s amortizes one-time costs.
    steady = None
    try:
        with open(os.path.join(args.log_dir, "curl.log")) as f:
            rates = [float(m) for m in re.findall(r"\(([0-9.]+) img/s", f.read())]
        if rates:
            rates.sort()
            steady = rates[len(rates) // 2]
    except OSError:
        pass

    payload = {
        "model": args.model,
        "backbone": args.backbone,
        "epochs": args.epochs,
        "steps": steps,
        "batch_size": args.batch_size,
        "crop": args.crop,
        "cache_mb": args.cache_mb,
        "compute_dtype": args.compute_dtype,
        "train_wall_s": round(wall, 1),
        "train_images_per_sec": round(steps * args.batch_size / wall, 3),
        "steady_images_per_sec": steady,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_curve_sampled": losses[:: max(1, len(losses) // 20)] if losses else [],
        "valid_psnr_curve": psnrs,
        "identity_psnr_test9": round(ident, 3),
        "final_psnr_test9": eval_psnr[-1] if eval_psnr else None,
        "eval_rc": eproc.returncode,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
