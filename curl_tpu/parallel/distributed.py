"""Multi-host initialization.

Single-controller JAX replaces the reference's per-rank NCCL process-group
bootstrap (reference main.py:98-123): each host calls
`jax.distributed.initialize` once, after which `jax.devices()` spans the
whole slice and the mesh/jit machinery handles cross-host collectives over
ICI/DCN. No teardown/destroy_process_group/pkill dance is needed
(contrast reference main.py:343-357) — the runtime cleans up on exit.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("curl_tpu")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if requested via args or environment.

    On Cloud TPU pods the arguments are auto-detected; elsewhere set
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID. Safe to call when
    single-host (no-op unless configured).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    env_np = os.environ.get("NUM_PROCESSES")
    env_pid = os.environ.get("PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        # Single host, or TPU-pod auto-detection handled by the runtime.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "multi-host initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
