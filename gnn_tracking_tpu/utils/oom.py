"""Out-of-memory tolerance (capability parity: reference utils/oom.py).

XLA device OOMs are raised at compile/execute time as ``RESOURCE_EXHAUSTED``
and — unlike CUDA — are not recoverable mid-step, so the primary defense in
the TPU build is *preventive*: shape buckets bound memory, and
``PaddingConfig.max_nodes/max_edges`` reject oversized events before
compilation. This decorator remains for host-visible failures: it skips the
offending batch and aborts after too many consecutive errors, mirroring the
reference semantics (``utils/oom.py:21-45``).
"""

from __future__ import annotations

import collections
import functools
from typing import Callable

from gnn_tracking_tpu.utils.log import logger

N_OOM_ERRORS: dict[str, int] = collections.defaultdict(int)


def is_oom_error(e: Exception) -> bool:
    """Does this exception look like an out-of-memory error?"""
    text = f"{type(e).__name__}: {e}"
    return "RESOURCE_EXHAUSTED" in text or "out of memory" in text.lower()


def tolerate_some_oom_errors(fct: Callable, *, max_consecutive: int = 10) -> Callable:
    """Decorator: skip the batch on OOM, abort after ``max_consecutive``
    consecutive OOMs."""

    @functools.wraps(fct)
    def wrapped(*args, **kwargs):
        try:
            result = fct(*args, **kwargs)
        except Exception as e:
            if not is_oom_error(e):
                raise
            N_OOM_ERRORS[fct.__name__] += 1
            if N_OOM_ERRORS[fct.__name__] >= max_consecutive:
                logger.error("Too many consecutive OOM errors, giving up")
                raise
            logger.warning("Caught OOM error (%s), skipping batch", e)
            return None
        N_OOM_ERRORS[fct.__name__] = 0
        return result

    return wrapped
