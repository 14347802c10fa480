"""Device-side profiling helpers (SURVEY §5.1: the reference only has host
timers; the TPU build adds `jax.profiler` trace capture)."""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax

from gnn_tracking_tpu.utils.log import logger


@contextlib.contextmanager
def device_trace(log_dir: str | Path = "/tmp/jax-trace", enabled: bool = True):
    """Capture a `jax.profiler` trace of the block (view with XProf/
    TensorBoard). Remember to block on results inside the block."""
    if not enabled:
        yield
        return
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace written to %s", log_dir)


def annotate(name: str):
    """Named region for traces (`jax.profiler.TraceAnnotation`)."""
    return jax.profiler.TraceAnnotation(name)
