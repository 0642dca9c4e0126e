"""Training / batch-inference CLI — the counterpart of the reference's
`python main.py ...` entrypoint (reference main.py:68-341).

Modes (same dispatch rule as the reference, main.py:148,199):
  * --checkpoint_filepath + --inference_img_dirpath  -> batch inference over
    `images_inference.txt`, dumping enhanced images and metrics.
  * --training_img_dirpath [--checkpoint_filepath]   -> (resumed) training.

Example:
  python -m curl_tpu.cli.main --training_img_dirpath=/data/adobe5k \
      --valid_every=250 --num_epoch=10000 --batch_size=32
"""

from __future__ import annotations

import faulthandler
import logging
import os
import sys
from typing import Optional

import jax

from curl_tpu.config import Config, parse_config
from curl_tpu.data import pipeline
from curl_tpu.data.dataset import read_split_ids, scan_data_dir, select_records
from curl_tpu.parallel import mesh as mesh_lib
from curl_tpu.train import checkpoint as ckpt_lib
from curl_tpu.train import loop as loop_lib
from curl_tpu.train import state as state_lib

log = logging.getLogger("curl_tpu")


def run_batch_inference(cfg: Config) -> dict:
    root = cfg.inference_img_dirpath
    records = scan_data_dir(root)
    ids = read_split_ids(os.path.join(root, f"images_{cfg.eval_split}.txt"))
    recs = select_records(records, ids)

    log_dirpath = loop_lib.setup_logging(cfg.log_dirpath)
    log.info(
        "Evaluating split %r with images in directory: %s", cfg.eval_split, root
    )

    # Use every data-parallel device regardless of split size: pad the eval
    # batch up to a multiple of the data-axis size (the Loader wraps the
    # trailing rows and reports `valid_count`; the evaluator masks them), so
    # e.g. a 9-image split on an 8-device slice evaluates at data=8 instead
    # of idling 7 devices behind a gcd(9,8)=1 mesh.
    if cfg.mesh_data is not None:
        mesh = mesh_lib.make_mesh(
            jax.devices()[: cfg.mesh_data * cfg.mesh_model],
            data=cfg.mesh_data,
            model=cfg.mesh_model,
        )
    else:
        avail = max(1, len(jax.devices()) // cfg.mesh_model)
        batch = mesh_lib.pad_batch_size(min(cfg.batch_size, len(recs)), avail)
        mesh = mesh_lib.auto_mesh(batch, model=cfg.mesh_model)
    data_size = mesh.shape[mesh_lib.DATA_AXIS]
    loader = pipeline.Loader(
        recs,
        batch_size=mesh_lib.pad_batch_size(min(cfg.batch_size, len(recs)), data_size),
        crop=(cfg.crop_h, cfg.crop_w),
        train=False,
        num_threads=cfg.num_workers,
    )
    model = loop_lib.build_model(cfg)
    tx = state_lib.make_optimizer(state_lib.onecycle_schedule(1, 1))
    import numpy as np

    sample = np.zeros((1, cfg.crop_h, cfg.crop_w, 3), np.float32)
    sample_mask = np.ones((1, cfg.crop_h, cfg.crop_w, 1), np.float32)
    state = state_lib.create_train_state(
        model, jax.random.PRNGKey(0), sample, sample_mask, tx
    )
    state, _ = ckpt_lib.restore(cfg.checkpoint_filepath, state)

    state = mesh_lib.shard_pytree(state, mesh_lib.replicated(mesh))
    evaluator = loop_lib.Evaluator(cfg, loader, cfg.eval_split, log_dirpath)
    return evaluator.evaluate(
        state, epoch=0, save_outputs=True, sharding=mesh_lib.batch_sharding(mesh)
    )


def run_training(cfg: Config) -> None:
    root = cfg.training_img_dirpath
    records = scan_data_dir(root)
    train_recs = select_records(records, read_split_ids(os.path.join(root, "images_train.txt")))
    valid_recs = select_records(records, read_split_ids(os.path.join(root, "images_valid.txt")))
    trainer = loop_lib.Trainer(cfg, train_recs, valid_recs)
    log.info("######### Parameters #########")
    log.info("Number of epochs: %s", cfg.num_epoch)
    log.info("Logging directory: %s", trainer.log_dirpath)
    log.info("Dump validation accuracy every: %s", cfg.valid_every)
    log.info("Training image directory: %s", root)
    log.info("##############################")
    trainer.fit()


def main(argv: Optional[list[str]] = None) -> None:
    faulthandler.enable()
    cfg = parse_config(argv)
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.matmul_precision != "default":
        # Training on TPU requires fp32-accurate matmul/conv passes: the
        # platform's fast bf16 passes make optimization diverge (measured —
        # see config.matmul_precision and docs/STATUS.md round-2 notes).
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
    if cfg.checkpoint_filepath and cfg.inference_img_dirpath:
        run_batch_inference(cfg)
    elif cfg.training_img_dirpath:
        run_training(cfg)
    else:
        print(
            "Nothing to do: pass --training_img_dirpath to train, or "
            "--checkpoint_filepath with --inference_img_dirpath for batch inference.",
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    main()
