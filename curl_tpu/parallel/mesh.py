"""Device mesh and sharding helpers.

The distributed design is single-controller JAX: one jitted train step over a
`Mesh`, with batch inputs sharded along the "data" axis and parameters
replicated. XLA/GSPMD inserts the gradient all-reduce over ICI automatically
— the TPU-native replacement for the reference's NCCL DDP wrapper
(/root/reference/main.py:98-99,222-225). A "model" axis is part of the mesh
shape from day one (size 1 by default) so tensor-parallel sharding of the
backbone can be added without re-plumbing.

Cross-replica batch-norm comes for free under GSPMD: the batch axis is
sharded, so BN's batch-mean *is* a global mean (an all-reduce), i.e. the
semantics of SyncBatchNorm (reference model.py:457-458) without a separate
mode.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """A (data, model) mesh over `devices` (default: all). `data` defaults to
    n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        if len(devices) % model:
            raise ValueError(f"{len(devices)} devices not divisible by model={model}")
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(batch_size: int, model: int = 1, devices=None) -> Mesh:
    """Mesh whose data axis is the largest device count that divides the
    global batch. If the batch doesn't divide evenly (e.g. batch 7 on an
    8-chip slice would silently train on ONE chip), warn loudly — callers
    should pad the global batch with `pad_batch_size` instead of idling
    hardware."""
    import math
    import warnings

    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // model
    data = math.gcd(batch_size, avail) if avail else 1
    if 1 < data * model < len(devices) or (data == 1 and len(devices) > model):
        warnings.warn(
            f"auto_mesh: global batch {batch_size} only divides onto {data} of "
            f"{avail} available data-parallel devices — {avail - data} device(s) "
            f"will sit IDLE. Pad the batch to {pad_batch_size(batch_size, avail)} "
            "(see pad_batch_size) or pass a divisible batch size.",
            stacklevel=2,
        )
    return make_mesh(devices[: data * model], data=data, model=model)


def pad_batch_size(batch_size: int, n_devices: int) -> int:
    """Smallest multiple of `n_devices` >= batch_size."""
    return ((batch_size + n_devices - 1) // n_devices) * n_devices


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, sharding):
    """Place every array leaf of a pytree with `sharding`."""
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_mesh_cpu(n: int = 8) -> Mesh:
    """An n-device CPU mesh for tests/dry runs; requires
    --xla_force_host_platform_device_count."""
    devices = jax.devices("cpu")[:n]
    if len(devices) < n:
        raise RuntimeError(
            f"need {n} CPU devices; set XLA_FLAGS=--xla_force_host_platform_device_count={n}"
        )
    return make_mesh(devices, data=n, model=1)
