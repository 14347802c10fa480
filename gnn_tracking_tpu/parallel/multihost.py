"""Multi-host runtime initialization.

Capability parity: the reference delegates multi-node training to Lightning
DDP + torch.distributed (SURVEY §5.8). The TPU-native equivalent is JAX's
multi-controller runtime: every host runs the same program,
``jax.distributed.initialize()`` wires them into one global device mesh, and
the SPMD code in ``parallel/dp.py`` / ``parallel/halo.py`` scales out
unchanged — collectives ride ICI within a slice and DCN across slices.

Typical SLURM usage::

    from gnn_tracking_tpu.parallel.multihost import initialize_from_env
    initialize_from_env()           # no-op on single host
    mesh = make_mesh()              # now spans all hosts' devices
"""

from __future__ import annotations

import os

import jax

from gnn_tracking_tpu.utils.log import logger


def initialize_from_env(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-host runtime from explicit args or environment
    (SLURM or JAX-native env vars). Returns True if distributed mode is on.

    On TPU pods the arguments are auto-detected by JAX; on CPU/GPU clusters
    provide them or set ``SLURM_*`` variables.
    """
    n = num_processes
    if n is None and "SLURM_NTASKS" in os.environ:
        n = int(os.environ["SLURM_NTASKS"])
    if n is not None and n <= 1:
        logger.debug("Single-process run; skipping jax.distributed.initialize")
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:  # noqa: BLE001
        logger.warning("jax.distributed.initialize failed (%s); single host", e)
        return False
    logger.info(
        "Distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def local_batch_to_global(local_batch, mesh):
    """Assemble a globally-sharded stacked batch from per-host local data
    (``jax.make_array_from_process_local_data`` — each host loads only its
    own events; SURVEY §5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch
    )
