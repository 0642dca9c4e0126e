"""Jitted train / eval steps.

One compiled program per step: device-side augmentation, forward, loss,
backward, optimizer update. Batch inputs arrive sharded over the mesh's
"data" axis and parameters replicated, so GSPMD turns the loss/gradient
reductions into ICI all-reduces — there is no separate "DDP wrapper"
(contrast reference main.py:222-225,287). Metric reductions likewise happen
on device inside the step (contrast the reference's CPU
`all_gather_object`, main.py:299-303, evaluate.py:122-131).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from curl_tpu.data import augment as aug
from curl_tpu.models import losses, metrics


def _normalize_batch(inp, out, mask):
    """Device-side normalization of the uint8 wire format (see
    `data.dataset.load_example`): images 0-255 -> [0,1] fp32, mask {0,1} ->
    fp32. Float inputs pass through untouched, so callers feeding
    already-normalized arrays (benches, tests) keep working."""
    if inp.dtype == jnp.uint8:
        inp = inp.astype(jnp.float32) / 255.0
    if out.dtype == jnp.uint8:
        out = out.astype(jnp.float32) / 255.0
    if mask.dtype == jnp.uint8:
        mask = mask.astype(jnp.float32)
    return inp, out, mask


def _split_model_output(out):
    """Models return either the enhanced image or (image, regulariser) — the
    curve model carries its slope-smoothness term (reference
    model.py:170-176)."""
    if isinstance(out, tuple):
        return out[0], out[1]
    return out, None


def make_train_step(
    ssim_window: int = 11, augment: bool = True, reg_weight: float = 1e-4
) -> Callable:
    """Returns jitted `train_step(state, batch, key) -> (state, stats)`.
    `batch` holds device arrays input_img/output_img/mask. For models that
    return a smoothness regulariser (the curve model), its batch mean joins
    the loss scaled by `reg_weight`."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, key):
        # Augment BEFORE normalizing: on the uint8 wire format the flip/
        # rotate gathers then move 1/4 the bytes, and nearest resampling is
        # a pure permutation — identical values either order.
        inp, out, mask = batch["input_img"], batch["output_img"], batch["mask"]
        if augment:
            inp, out, mask = aug.augment_batch(inp, out, mask, key)
        inp, out, mask = _normalize_batch(inp, out, mask)

        def loss_fn(params):
            model_out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                inp,
                mask,
                train=True,
                mutable=["batch_stats"],
            )
            enhanced, reg = _split_model_output(model_out)
            loss = losses.curl_loss(enhanced, out, mask, ssim_window_size=ssim_window)
            if reg is not None:
                loss = loss + reg_weight * jnp.mean(reg)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, updates["batch_stats"])
        return new_state, {"loss": loss}

    return train_step


def _per_image_loss(enhanced, target, mask, ssim_window):
    """Per-image CURL loss via a batch-1 vmap, so partial final batches can
    be reduced exactly (the reference instead averaged per-batch losses,
    evaluate.py:107-139)."""

    def one(e, t, m):
        return losses.curl_loss(e[None], t[None], m[None], ssim_window_size=ssim_window)

    return jax.vmap(one)(enhanced, target, mask)


def make_eval_step(ssim_window: int = 11) -> Callable:
    """Returns jitted `eval_step(state, batch) -> stats-sums`. Stats are
    weighted by per-example validity (wrapped padding examples in the last
    partial batch excluded) and summed — global sums under GSPMD, so the
    caller just accumulates scalars."""

    @jax.jit
    def eval_step(state, batch):
        inp, out, mask = _normalize_batch(
            batch["input_img"], batch["output_img"], batch["mask"]
        )
        valid_count = batch["valid_count"]
        b = inp.shape[0]
        valid = (jnp.arange(b) < valid_count).astype(jnp.float32)

        enhanced, _ = _split_model_output(
            state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                inp,
                mask,
                train=False,
            )
        )
        loss_i = _per_image_loss(enhanced, out, mask, ssim_window)
        psnr_i = metrics.psnr_per_image(out, enhanced, mask)
        psnr_ok = valid * jnp.isfinite(psnr_i).astype(jnp.float32)
        msssim_i = jax.vmap(
            lambda e, t, m: metrics.masked_ms_ssim(e[None], t[None], m[None])
        )(enhanced, out, mask)

        return {
            "loss_sum": jnp.sum(loss_i * valid),
            "psnr_sum": jnp.sum(jnp.where(psnr_ok > 0, psnr_i, 0.0)),
            "psnr_count": jnp.sum(psnr_ok),
            "msssim_sum": jnp.sum(msssim_i * valid),
            "count": jnp.sum(valid),
            "enhanced": enhanced,
            "psnr_per_image": psnr_i,
            "msssim_per_image": msssim_i,
        }

    return eval_step


def stack_eval_totals(per_batch: list) -> dict[str, float]:
    """Per-batch device stat scalars -> host-float64 totals in ONE fetch.

    Stacks every batch's scalars into a single (num_batches, num_keys)
    device array, fetches it once, and sums on the host in float64: the
    one-sync discipline of the eval pass without fp32 sequential-add drift
    on large splits (a 2,250-image pass accumulates psnr_sum ~5e4, where
    chained fp32 adds can cost ~1e-3 dB; TPUs have no f64 — the host does).
    """
    if not per_batch:
        return {}
    keys = sorted(per_batch[0])
    stacked = np.asarray(
        jnp.stack(
            [
                jnp.stack([jnp.asarray(b[k], jnp.float32) for k in keys])
                for b in per_batch
            ]
        )
    ).astype(np.float64)
    return {k: float(stacked[:, j].sum()) for j, k in enumerate(keys)}


def summarize_eval(totals: dict[str, float]) -> dict[str, float]:
    """Batch-accumulated sums -> mean metrics. Accepts host floats or
    device scalars (the Evaluator accumulates on device); all values are
    fetched in ONE stacked host transfer — the only sync of an eval pass."""
    keys = sorted(totals)
    if keys and any(isinstance(totals[k], jax.Array) for k in keys):
        # jnp.asarray handles a mix of device scalars and host floats.
        fetched = np.asarray(
            jnp.stack([jnp.asarray(totals[k], jnp.float32) for k in keys])
        )
        totals = {k: float(v) for k, v in zip(keys, fetched)}
    n = max(totals.get("count", 0.0), 1e-9)
    np_ = max(totals.get("psnr_count", 0.0), 1e-9)
    return {
        "loss": totals.get("loss_sum", 0.0) / n,
        "psnr": totals.get("psnr_sum", 0.0) / np_,
        "msssim": totals.get("msssim_sum", 0.0) / n,
    }
