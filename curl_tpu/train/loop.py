"""Training driver and evaluator.

The L4 layer: wires data loaders, the jitted steps, the mesh, logging/
TensorBoard, validation and checkpointing into the same workflow as the
reference's `main.py` training loop (reference main.py:199-340) and
`Evaluator` (evaluate.py:29-139) — minus the per-rank plumbing, which the
single-controller mesh design makes unnecessary.
"""

from __future__ import annotations

import contextlib
import datetime
import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from curl_tpu.config import Config
from curl_tpu.data import pipeline
from curl_tpu.models import CurlCurveNet, PolyRegNet, TriSpacePolyNet
from curl_tpu.parallel import mesh as mesh_lib
from curl_tpu.train import checkpoint as ckpt_lib
from curl_tpu.train import state as state_lib
from curl_tpu.train import steps as steps_lib
from curl_tpu.utils import profiling

log = logging.getLogger("curl_tpu")


def build_model(cfg: Config):
    if cfg.model == "trispace":
        return TriSpacePolyNet(
            polynomial_order=cfg.polynomial_order,
            spatial=cfg.spatial,
            backbone=cfg.backbone,
            residual_impl=cfg.residual_impl,
            compute_dtype=cfg.compute_dtype,
            identity_init=cfg.identity_init,
        )
    if cfg.model == "curve":
        return CurlCurveNet(
            num_lab_points=cfg.num_lab_points,
            num_rgb_points=cfg.num_rgb_points,
            num_hsv_points=cfg.num_hsv_points,
            backbone=cfg.backbone,
            curve_impl=cfg.curve_impl,
        )
    if cfg.model == "polyreg":
        return PolyRegNet(polynomial_order=cfg.polynomial_order, backbone=cfg.backbone)
    raise ValueError(f"unknown model {cfg.model!r}")


def setup_logging(log_dirpath: Optional[str]) -> str:
    """Console + (process-0) file logging under a timestamped directory
    (reference main.py:127-138)."""
    if log_dirpath is None:
        ts = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        log_dirpath = f"./log_{ts}"
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if jax.process_index() == 0:
        os.makedirs(log_dirpath, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(log_dirpath, "curl.log")))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )
    return log_dirpath


def save_images(
    batch_out: np.ndarray,
    names: list[str],
    out_dir: str,
    psnr=None,
    msssim=None,
) -> None:
    """Dump enhanced images as 8-bit files (role of reference
    evaluate.py:50-66). When per-image metrics are given, they are embedded
    in the filename like the reference's bundled inference artifacts
    (`<stem>_PSNR_x.xxx_SSIM_y.yyy.<ext>`)."""
    from curl_tpu.utils.imageio import save_image_u8

    os.makedirs(out_dir, exist_ok=True)
    for i, name in enumerate(names):
        if psnr is not None and msssim is not None:
            stem, ext = os.path.splitext(name)
            name = f"{stem}_PSNR_{float(psnr[i]):.3f}_SSIM_{float(msssim[i]):.3f}{ext}"
        save_image_u8(np.asarray(batch_out[i]), os.path.join(out_dir, name))


class Evaluator:
    """Split-agnostic evaluation loop (reference evaluate.py:29-139):
    per-image loss/PSNR/MS-SSIM reduced on device, optional image dump."""

    def __init__(self, cfg: Config, loader: pipeline.Loader, split_name: str, log_dirpath: str):
        self.cfg = cfg
        self.loader = loader
        self.split_name = split_name
        self.log_dirpath = log_dirpath
        self.eval_step = steps_lib.make_eval_step(cfg.ssim_window_size)

    def evaluate(self, trainstate, epoch: int = 0, save_outputs: bool = False, sharding=None):
        # One-sync accumulation: each batch's stat scalars stay on device
        # (async dispatch, no round-trip); at the end they are stacked into
        # ONE fetched array and summed on the host in float64 — the same
        # one-sync discipline as the training loop, without fp32 sequential-
        # add drift on large splits (a 2,250-image pass accumulates psnr_sum
        # ~5e4, where chained fp32 adds cost up to ~1e-3 dB). The old
        # per-batch float(v) paid one ~25 ms tunnel round-trip per eval
        # batch (reference contrast: evaluate.py:122-131 gathers per batch).
        per_batch: list[dict] = []
        def _device_batches():
            for batch in iter(self.loader):
                names = batch.pop("name")
                if sharding is not None:
                    batch = pipeline.shard_batch(batch, sharding)
                yield names, batch

        for i, (names, batch) in enumerate(pipeline.prefetch(_device_batches())):
            stats = self.eval_step(trainstate, batch)
            enhanced = stats.pop("enhanced")
            psnr_i = stats.pop("psnr_per_image")
            msssim_i = stats.pop("msssim_per_image")
            per_batch.append(stats)
            if i % 16 == 15:
                # Backpressure: one cheap scalar fetch per 16 batches bounds
                # the device dispatch queue (the tunneled worker crashes
                # under unbounded queues — infer/engine.py notes; in-order
                # execution means this completes everything queued so far).
                float(jax.device_get(stats["count"]))
            if save_outputs and jax.process_index() == 0:
                if hasattr(enhanced, "is_fully_addressable") and not enhanced.is_fully_addressable:
                    log.warning("skipping image dump: output not fully addressable on this host")
                    continue
                n_valid = int(batch["valid_count"])
                out_dir = os.path.join(self.log_dirpath, self.split_name, str(epoch + 1))
                save_images(
                    np.asarray(enhanced)[:n_valid],
                    names[:n_valid],
                    out_dir,
                    psnr=np.asarray(psnr_i)[:n_valid],
                    msssim=np.asarray(msssim_i)[:n_valid],
                )
        summary = steps_lib.summarize_eval(steps_lib.stack_eval_totals(per_batch))
        log.info(
            "loss_%s: %.5f psnr_%s: %.3f msssim_%s: %.3f",
            self.split_name, summary["loss"],
            self.split_name, summary["psnr"],
            self.split_name, summary["msssim"],
        )
        return summary


class Trainer:
    def __init__(self, cfg: Config, train_records, valid_records, log_dirpath: Optional[str] = None):
        self.cfg = cfg
        self.log_dirpath = setup_logging(log_dirpath or cfg.log_dirpath)
        if cfg.mesh_data is not None:
            self.mesh = mesh_lib.make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
        else:
            self.mesh = mesh_lib.auto_mesh(cfg.batch_size, model=cfg.mesh_model)
        self.batch_sharding = mesh_lib.batch_sharding(self.mesh)
        self.replicated = mesh_lib.replicated(self.mesh)

        self.train_loader = pipeline.Loader(
            train_records,
            batch_size=cfg.batch_size,
            crop=(cfg.crop_h, cfg.crop_w),
            train=True,
            seed=cfg.seed,
            num_threads=cfg.num_workers,
            cache_mb=cfg.cache_mb,
        )
        self.valid_loader = pipeline.Loader(
            valid_records,
            batch_size=cfg.batch_size,
            crop=(cfg.crop_h, cfg.crop_w),
            train=False,
            num_threads=cfg.num_workers,
            cache_mb=cfg.cache_mb,
        )

        self.model = build_model(cfg)
        if len(self.train_loader) == 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds the {len(train_records)} "
                "training examples — every epoch would be empty (training "
                "batches are dropped when incomplete to keep shapes static)"
            )
        steps_per_epoch = max(1, len(self.train_loader))
        schedule = state_lib.onecycle_schedule(
            cfg.num_epoch,
            steps_per_epoch,
            peak_lr=cfg.peak_lr,
            epoch_granularity=cfg.lr_epoch_granularity,
        )
        self.schedule = schedule
        tx = state_lib.make_optimizer(
            schedule, cfg.adam_b1, cfg.adam_b2, clip_grad_norm=cfg.clip_grad_norm
        )

        sample = np.zeros((1, cfg.crop_h, cfg.crop_w, 3), np.float32)
        sample_mask = np.ones((1, cfg.crop_h, cfg.crop_w, 1), np.float32)
        self.state = state_lib.create_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), sample, sample_mask, tx
        )
        if cfg.pretrained_backbone:
            self.state = self._load_pretrained_backbone(
                cfg.pretrained_backbone, sample, sample_mask, tx
            )
            log.info("initialized backbone from timm weights %s", cfg.pretrained_backbone)
        self.state = mesh_lib.shard_pytree(self.state, self.replicated)
        self.start_epoch = 0

        ckpt_dir = os.path.join(self.log_dirpath, "checkpoints")
        self.ckpt_dir = ckpt_dir
        resume_path = cfg.checkpoint_filepath
        if resume_path is None and cfg.auto_resume:
            resume_path = ckpt_lib.latest_checkpoint(ckpt_dir)
        if resume_path:
            self.state, self.start_epoch = ckpt_lib.restore(resume_path, self.state)
            log.info("restored checkpoint %s at epoch %d", resume_path, self.start_epoch)

        self.train_step = steps_lib.make_train_step(
            ssim_window=cfg.ssim_window_size,
            augment=cfg.augment,
            reg_weight=cfg.curve_reg_weight,
        )
        self.evaluator = Evaluator(cfg, self.valid_loader, "valid", self.log_dirpath)
        self.writer = self._make_writer()
        log.info("params: %.2fM", state_lib.param_count(self.state) / 1e6)

    def _load_pretrained_backbone(self, pt_path, sample, sample_mask, tx):
        """Replace the fresh state's backbone params/batch_stats with
        converted timm ImageNet weights (reference model.py:456
        `pretrained=True`); re-init the optimizer over the new params."""
        import torch

        from curl_tpu.export.torch_convert import init_with_pretrained_backbone

        payload = torch.load(pt_path, map_location="cpu", weights_only=False)
        variables = init_with_pretrained_backbone(
            self.model, jax.random.PRNGKey(self.cfg.seed), sample, sample_mask,
            payload,
        )
        return self.state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )

    def _make_writer(self):
        if jax.process_index() != 0:
            return None
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(logdir=os.path.join(self.log_dirpath, "tb"))
        except ImportError:
            return None

    def fit(self) -> None:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed + 1)
        examples_seen = self.start_epoch * len(self.train_loader) * cfg.batch_size
        for epoch in range(self.start_epoch, cfg.num_epoch):
            profile_ctx = (
                profiling.trace(cfg.profile_dir)
                if cfg.profile_dir and epoch == self.start_epoch
                else contextlib.nullcontext()
            )
            self.train_loader.set_epoch(epoch)
            t0 = time.time()
            epoch_loss, batches = 0.0, 0
            try:
                from tqdm import tqdm

                pbar = tqdm(
                    total=len(self.train_loader),
                    disable=(jax.process_index() != 0),
                    leave=False,
                    desc=f"epoch {epoch + 1}",
                )
            except ImportError:
                pbar = None
            step_losses = []
            with profile_ctx:
              def _device_batches():
                # Host->device transfer happens in the prefetch producer
                # thread, overlapping the previous step's device time — on
                # the tunneled platform the per-step H2D is a large, real
                # cost (uint8 wire format + this overlap are the two
                # halves of the fix).
                for batch in iter(self.train_loader):
                    batch.pop("name")
                    batch.pop("valid_count")
                    yield pipeline.shard_batch(batch, self.batch_sharding)

              for batch in pipeline.prefetch(_device_batches()):
                rng, step_key = jax.random.split(rng)
                self.state, stats = self.train_step(self.state, batch, step_key)
                # Keep the loss as a device scalar: fetching it here would
                # serialize every step on the host<->device round trip
                # (~25 ms on tunneled platforms). One stacked transfer at
                # epoch end syncs the whole epoch.
                step_losses.append(stats["loss"])
                batches += 1
                if pbar:
                    pbar.update(1)
            if pbar:
                pbar.close()
            import jax.numpy as jnp

            losses_np = np.asarray(jnp.stack(step_losses)) if step_losses else np.zeros(1)
            for i, loss in enumerate(losses_np):
                examples_seen += cfg.batch_size
                if self.writer:
                    self.writer.add_scalar("Loss/train", float(loss), examples_seen)
            epoch_loss = float(losses_np.sum())
            mean_loss = epoch_loss / max(batches, 1)
            dt = time.time() - t0
            log.info(
                "[%d] train loss: %.15f (%.1f img/s, lr %.3g)",
                epoch + 1,
                mean_loss,
                batches * cfg.batch_size / max(dt, 1e-9),
                float(self.schedule(int(self.state.step))),
            )
            if self.writer:
                self.writer.add_scalar("Loss/train_smooth", mean_loss, epoch + 1)

            if (epoch + 1) % cfg.valid_every == 0:
                summary = self.evaluator.evaluate(
                    self.state, epoch, save_outputs=cfg.save_images,
                    sharding=self.batch_sharding,
                )
                path = ckpt_lib.save(
                    self.ckpt_dir,
                    self.state,
                    epoch + 1,
                    summary["psnr"],
                    summary["loss"],
                    keep=cfg.keep_checkpoints,
                )
                log.info("saved checkpoint %s", path)
