#!/usr/bin/env python3
"""Ready-to-fire full-Adobe5K-DPE training recipe (VERDICT r4 item 3).

The north-star quality target (BASELINE.md) is PSNR/SSIM parity with the
reference on the Adobe5K-DPE test split — 2,250 train / 2,250 valid / 500
test pairs that are NOT bundled in this environment. This script is the one
command that runs the complete recipe the moment a real dataset directory is
available, with the exact reference hyperparameters (reference
main.py:199-340):

    crop 256x256 (data.py:86), global batch 32 (main.py:88,117),
    Adam(5e-7, betas 0.5/0.999) + OneCycle peak 1e-4 stepped per epoch
    (main.py:236-240,311), valid every 250 epochs (README workflow),
    ImageNet-pretrained efficientnetv2_rw_t backbone (model.py:456).

Pipeline: validate the dataset layout -> train (resumable) -> pick the
best-valid-PSNR checkpoint -> evaluate the test split with image dumps ->
write a JSON evidence record comparing against the reference checkpoint's
headline numbers (valid 22.66 dB / test 23.40 dB, BASELINE.md).

Usage:
  python tools/adobe5k_run.py --data_dir /data/adobe5k_dpe \
      [--pretrained_backbone /path/efficientnetv2_rw_t_timm.pt] \
      [--epochs 10000] [--valid_every 250] [--out adobe5k_evidence.json]

  --dry_run prints the exact commands without running them.
  --selftest generates a small synthetic dataset (tools/scale_smoke.py
    generator) and drives the full pipeline end-to-end on it — proving the
    recipe fires — on CPU if the device is unavailable (--cpu).

Dataset layout (reference data.py:43-80, with our string-id fix — the
bundled `a0001`-style ids work directly, no renumbering):
  <data_dir>/images_input/*.jpg|png      originals
  <data_dir>/images_output/*.jpg|png     retouched ground truth
  <data_dir>/images_mask/*.png           (optional) foreground masks
  <data_dir>/images_{train,valid,test}.txt   one id per line
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

REFERENCE_HEADLINE = {"valid_psnr": 22.66, "test_psnr": 23.40,
                      "valid_loss": 0.0734, "test_loss": 0.0605}


def validate_dataset(data_dir: str) -> dict:
    from curl_tpu.data import dataset as ds

    records = ds.scan_data_dir(data_dir)
    sizes = {}
    for split in ("train", "valid", "test"):
        path = os.path.join(data_dir, f"images_{split}.txt")
        if not os.path.isfile(path):
            raise SystemExit(f"missing split list: {path}")
        ids = ds.read_split_ids(path)
        missing = [i for i in ids if i not in records]
        if missing:
            raise SystemExit(
                f"split {split!r} references {len(missing)} ids with no "
                f"images, e.g. {missing[:5]}"
            )
        sizes[split] = len(ids)
    print(f"dataset ok: {sizes} ({len(records)} scanned records)", flush=True)
    return sizes


def build_commands(args) -> tuple[list[str], str]:
    log_dir = args.log_dir
    train_cmd = [
        sys.executable, "-m", "curl_tpu.cli.main",
        "--training_img_dirpath", args.data_dir,
        "--num_epoch", str(args.epochs),
        "--valid_every", str(args.valid_every),
        "--batch_size", str(args.batch_size),
        "--crop_h", "256", "--crop_w", "256",
        "--peak_lr", "1e-4",
        "--backbone", args.backbone,
        "--model", "trispace",
        "--log_dirpath", log_dir,
        "--keep_checkpoints", str(args.keep_checkpoints),
        "--save_images", "false",
        "--cache_mb", str(args.cache_mb),
        "--num_workers", str(args.num_workers),
        "--auto_resume", "true",
    ]
    if args.cpu:
        train_cmd += ["--platform", "cpu"]
    if args.pretrained_backbone:
        train_cmd += ["--pretrained_backbone", args.pretrained_backbone]
    else:
        # From-scratch runs start at the identity transform (markedly better
        # dynamics than a random head; docs/TRAIN_EVIDENCE.md).
        train_cmd += ["--identity_init", "true"]
    return train_cmd, log_dir


def eval_command(args, ckpt: str, split: str) -> list[str]:
    return [
        sys.executable, "-m", "curl_tpu.cli.main",
        "--checkpoint_filepath", ckpt,
        "--inference_img_dirpath", args.data_dir,
        "--eval_split", split,
        "--batch_size", str(args.batch_size),
        "--crop_h", "256", "--crop_w", "256",
        "--backbone", args.backbone,
        "--model", "trispace",
        "--log_dirpath", args.log_dir + f"_eval_{split}",
        "--save_images", "true",
    ] + (["--platform", "cpu"] if args.cpu else [])


def parse_metrics(text: str, split: str) -> dict:
    out = {}
    for key in ("loss", "psnr", "msssim"):
        m = re.findall(rf"{key}_{split}: ([0-9.eE+-]+)", text)
        if m:
            out[f"{split}_{key}"] = float(m[-1])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None,
                    help="Adobe5K-DPE directory (see module docstring)")
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--valid_every", type=int, default=250)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--backbone", default="efficientnetv2_rw_t")
    ap.add_argument("--pretrained_backbone", default=None,
                    help="timm efficientnetv2_rw_t .pt for the reference's "
                    "ImageNet init (export/torch_convert converts it)")
    ap.add_argument("--keep_checkpoints", type=int, default=5)
    ap.add_argument("--cache_mb", type=int, default=8192)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--log_dir", default="/tmp/adobe5k_run_log")
    ap.add_argument("--out", default="/tmp/adobe5k_evidence.json")
    ap.add_argument("--train_timeout_s", type=float, default=None,
                    help="optional wall bound on the training subprocess")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="generate a synthetic mini-dataset and run the "
                    "whole pipeline end-to-end on it")
    ap.add_argument("--cpu", action="store_true",
                    help="(selftest) force the CPU backend")
    args = ap.parse_args()

    if args.selftest:
        from tools.scale_smoke import make_dataset

        root = "/tmp/adobe5k_selftest"
        info = make_dataset(root, n=24, size=320)
        print(f"selftest dataset: {info}", flush=True)
        args.data_dir = root
        args.epochs, args.valid_every, args.batch_size = 2, 1, 8
        args.log_dir = root + "_log"
        args.out = root + "_evidence.json"
        args.cache_mb, args.num_workers = 512, 2
    if not args.data_dir:
        raise SystemExit("--data_dir is required (or use --selftest)")
    import shutil

    if args.selftest and os.path.isdir(args.log_dir):
        shutil.rmtree(args.log_dir)

    sizes = validate_dataset(args.data_dir)
    train_cmd, log_dir = build_commands(args)
    print("train:", " ".join(train_cmd), flush=True)
    if args.dry_run:
        from curl_tpu.train import checkpoint as ckpt_lib  # noqa: F401

        print("eval:", " ".join(eval_command(args, "<best-ckpt>", "test")))
        return

    t0 = time.time()
    proc = subprocess.run(
        train_cmd, capture_output=True, text=True, cwd=_REPO,
        timeout=args.train_timeout_s,
    )
    train_wall = time.time() - t0
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-3000:])
    if proc.returncode != 0:
        raise SystemExit(f"training failed rc={proc.returncode}")
    train_text = proc.stdout + proc.stderr
    valid_psnrs = [float(m) for m in re.findall(r"psnr_valid: ([0-9.]+)", train_text)]

    from curl_tpu.train import checkpoint as ckpt_lib

    best = ckpt_lib.best_checkpoint(os.path.join(log_dir, "checkpoints"))
    if best is None:
        raise SystemExit("no checkpoint produced")
    print("best checkpoint:", best, flush=True)

    evidence = {
        "data_dir": args.data_dir,
        "splits": sizes,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "backbone": args.backbone,
        "pretrained_backbone": args.pretrained_backbone,
        "train_wall_s": round(train_wall, 1),
        "valid_psnr_curve": valid_psnrs,
        "best_checkpoint": os.path.basename(best),
        "reference_headline": REFERENCE_HEADLINE,
    }
    for split in ("valid", "test"):
        cmd = eval_command(args, best, split)
        print("eval:", " ".join(cmd), flush=True)
        ep = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO,
                            timeout=14400)
        sys.stdout.write(ep.stdout[-1500:])
        if ep.returncode != 0:
            sys.stderr.write(ep.stderr[-2000:])
            raise SystemExit(f"eval {split} failed rc={ep.returncode}")
        evidence.update(parse_metrics(ep.stdout + ep.stderr, split))

    with open(args.out, "w") as f:
        json.dump(evidence, f, indent=1)
    print(json.dumps(evidence), flush=True)


if __name__ == "__main__":
    main()
