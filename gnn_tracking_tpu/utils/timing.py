"""Host-side timing helpers (capability parity: reference utils/timing.py).

For device-side profiling use ``jax.profiler`` traces; these helpers time
host-visible stages (data loading, compilation, end-to-end steps). Remember to
``jax.block_until_ready`` results before reading a timer around device work.
"""

from __future__ import annotations

import contextlib
import time

from gnn_tracking_tpu.utils.log import logger


class Timer:
    """Measure elapsed wall-clock time between calls."""

    def __init__(self):
        self._start = time.perf_counter()

    def __call__(self) -> float:
        now = time.perf_counter()
        elapsed = now - self._start
        self._start = now
        return elapsed


@contextlib.contextmanager
def timing(name: str = "Codeblock"):
    """Context manager logging the elapsed wall-clock time of its block."""
    t = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s took %.5f seconds", name, time.perf_counter() - t)
