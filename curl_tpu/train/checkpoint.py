"""Orbax checkpointing of the full training state.

Saves {params, batch_stats, opt_state, step, epoch} with validation metrics
baked into the directory name, mirroring the reference's checkpoint naming
and contents (reference main.py:319-338); restore resumes epoch/optimizer/
scheduler state exactly (main.py:242-250). The scheduler needs no separate
state: it is a pure function of the step counter.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from curl_tpu.train.state import TrainState

_NAME_RE = re.compile(
    r"curl_validpsnr_(?P<psnr>[-\d.na]+)_validloss_(?P<loss>[-\d.na]+)_epoch_(?P<epoch>\d+)"
)


def checkpoint_name(psnr: float, loss: float, epoch: int) -> str:
    return f"curl_validpsnr_{psnr:.3f}_validloss_{loss:.5f}_epoch_{epoch}"


def save(
    ckpt_dir: str,
    state: TrainState,
    epoch: int,
    valid_psnr: float,
    valid_loss: float,
    keep: int = 5,
) -> str:
    """Write a checkpoint; prune to the newest `keep` by epoch. Only process
    0 initiates writes in multihost (orbax coordinates internally)."""
    path = os.path.join(
        os.path.abspath(ckpt_dir), checkpoint_name(valid_psnr, valid_loss, epoch)
    )
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    """Prune to the newest `keep` by epoch, but NEVER delete the
    best-valid-PSNR checkpoint — the best-model-selection capability the
    reference intended but left unwired (main.py:252,325 assigns
    `best_valid_psnr` without using it)."""
    if jax.process_index() != 0 or keep <= 0:
        return
    entries = list_checkpoints(ckpt_dir)
    best = best_checkpoint(ckpt_dir)
    for path, _ in entries[:-keep]:
        if path == best:
            continue
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def list_checkpoints(ckpt_dir: str) -> list[tuple[str, int]]:
    """[(path, epoch)] sorted by epoch ascending."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in os.listdir(ckpt_dir):
        m = _NAME_RE.match(d)
        if m:
            out.append((os.path.join(ckpt_dir, d), int(m.group("epoch"))))
    return sorted(out, key=lambda t: t[1])


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    entries = list_checkpoints(ckpt_dir)
    return entries[-1][0] if entries else None


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-valid-PSNR checkpoint (ties -> newest epoch);
    None if the directory has no parseable-PSNR checkpoints."""
    if not os.path.isdir(ckpt_dir):
        return None
    best: Optional[tuple[float, int, str]] = None
    for d in os.listdir(ckpt_dir):
        m = _NAME_RE.match(d)
        if not m:
            continue
        try:
            psnr = float(m.group("psnr"))
        except ValueError:  # malformed
            continue
        if psnr != psnr:  # NaN would win every comparison vacuously
            continue
        key = (psnr, int(m.group("epoch")))
        if best is None or key > best[:2]:
            best = (*key, os.path.join(ckpt_dir, d))
    return best[2] if best else None


def restore(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore into the shape/sharding of `template`. Returns
    (state, start_epoch).

    If the saved optimizer tree's *structure* doesn't match the template's
    (e.g. a checkpoint converted from torch carries a plain-Adam opt_state
    but the trainer was configured with --clip_grad_norm, adding a chain
    stage), fall back to restoring params/batch_stats/step/epoch only and
    keep the template's freshly initialized optimizer state, with a loud
    warning — instead of surfacing orbax's cryptic tree-structure error.
    """
    abstract = {
        "params": jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template.params),
        "batch_stats": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template.batch_stats
        ),
        "opt_state": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template.opt_state
        ),
        "step": ocp.utils.to_shape_dtype_struct(template.step),
        "epoch": 0,
    }
    with ocp.StandardCheckpointer() as ckptr:
        try:
            payload = ckptr.restore(os.path.abspath(path), abstract)
            opt_state = payload["opt_state"]
        except Exception:
            # Rebuild the abstract opt_state from the checkpoint's own
            # metadata so the restore succeeds, then discard it.
            meta = ckptr.metadata(os.path.abspath(path))
            meta_tree = getattr(meta, "item_metadata", meta)
            abstract["opt_state"] = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
                meta_tree["opt_state"],
            )
            payload = ckptr.restore(os.path.abspath(path), abstract)
            opt_state = template.opt_state
            import logging

            logging.getLogger("curl_tpu").warning(
                "checkpoint %s has an optimizer-state tree incompatible with "
                "the configured optimizer (e.g. converted checkpoint vs "
                "--clip_grad_norm); optimizer state was RE-INITIALIZED — "
                "params/batch_stats/step/epoch restored normally.",
                path,
            )
    state = template.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state,
        step=payload["step"],
    )
    return state, int(payload["epoch"])
