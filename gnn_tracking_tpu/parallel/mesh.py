"""Device-mesh helpers for multi-chip scaling.

The reference delegates all distribution to Lightning DDP over NCCL
(SURVEY §2.10/§5.8; only distributed-aware reference code is a
``dist_reduce_fx="cat"`` metric). The TPU-native design instead expresses
parallelism through ``jax.sharding``:

* ``data`` axis — events (padded, stacked on a leading axis) sharded across
  chips; gradients reduced by XLA-inserted ``psum`` riding the ICI.
* ``graph`` axis (optional, see ``parallel/halo.py``) — intra-event hit/edge
  partition for full-detector graphs, the reference's azimuthal
  sectorization recast as sharding with halo exchange.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans all hosts and the same code scales out with
collectives crossing DCN only between slices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_graph: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Create a ``(data, graph)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_graph
    devices = np.asarray(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(devices, axis_names=("data", "graph"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (event) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a stacked batch with its leading axis sharded over
    ``data``."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
