"""Profiling + numerical-debug utilities.

The reference has no profiler (SURVEY.md §5), only wall-clock harnesses;
its anomaly machinery is torch.autograd.set_detect_anomaly + a NaN-loss skip
(reference src/train.py:15, :56-58). TPU equivalents:

  * ``profile_trace`` — context manager writing a jax profiler trace
    (inspect in TensorBoard / xprof);
  * ``set_debug_nans`` — jax_debug_nans: raises at the first NaN-producing
    op instead of silently propagating (complements the step-level NaN
    guard in train/loop.py).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def set_debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats where the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
