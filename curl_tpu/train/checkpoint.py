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
    if jax.process_index() != 0:
        return
    entries = list_checkpoints(ckpt_dir)
    for path, _ in entries[:-keep] if keep > 0 else []:
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


def restore(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore into the shape/sharding of `template`. Returns
    (state, start_epoch)."""
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
        payload = ckptr.restore(os.path.abspath(path), abstract)
    state = template.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )
    return state, int(payload["epoch"])
