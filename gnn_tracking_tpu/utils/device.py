"""Device selection helpers (capability parity: reference utils/device.py).

The ``GNN_TRACKING_DEVICE`` environment variable forces a JAX platform
(``cpu``/``tpu``/``axon``), mirroring the reference's env override.
"""

from __future__ import annotations

import os


def guess_device(device: str | None = None):
    """Return a concrete jax.Device: explicit arg > env override > default."""
    import jax

    name = device or os.environ.get("GNN_TRACKING_DEVICE")
    if name is None:
        return jax.devices()[0]
    return jax.devices(name)[0]
