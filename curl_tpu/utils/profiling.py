"""Profiling and step-time observability.

The reference has no profiler (its only "tracing" is torch.jit for export,
coreml_conversion.py:28, plus tqdm bars as throughput display). Here:
`trace` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf/Perfetto, and `StepTimer` tracks images/sec with honest
device synchronization (a host fetch — see tpu-env-quirks: block_until_ready
may not block on tunneled platforms).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region to `log_dir` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force execution of `x`'s producer and return a checksum scalar.
    Honest sync even where block_until_ready is unreliable."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


class StepTimer:
    """Rolling images/sec over a window of steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._images: list[int] = []

    def step(self, n_images: int) -> None:
        now = time.perf_counter()
        self._times.append(now)
        self._images.append(n_images)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._images.pop(0)

    @property
    def images_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._images[1:]) / max(dt, 1e-9)
