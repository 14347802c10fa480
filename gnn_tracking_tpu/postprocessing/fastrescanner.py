"""Fast DBSCAN eps-rescanning, on device.

Capability parity: reference ``postprocessing/fastrescanner.py`` (sklearn
``NearestNeighbors`` + Cython ``dbscan_inner``). Here the radius-neighbor
graph is built once at ``max_eps`` with the TPU radius-graph kernel and every
re-clustering at a smaller eps is a single jitted call with *traced*
``eps``/``min_pts`` — scanning hyperparameters reuses one compiled program
and never leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tracking_tpu.ops.dbscan import dbscan_from_graph, dbscan_from_graph_many
from gnn_tracking_tpu.ops.knn import radius_graph


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "neighbor_cap", "impl")
)
def _dbscan_many(
    edge_index, dists, num_nodes, *, eps, min_samples, edge_mask, node_mask,
    neighbor_cap, impl="lanes",
):
    """Batched DBSCAN over (eps, min_samples) trials in one device call.

    ``impl="lanes"`` (default) keeps the trial axis on lanes so the
    connected-components sweeps are shared-index row gathers
    (``ops.dbscan.dbscan_from_graph_many``); ``impl="vmap"`` is the older
    per-trial formulation (kept for A/B batteries — the while-loop batching
    rule makes all trials iterate until the slowest converges either way)."""
    if impl not in ("lanes", "vmap"):
        raise ValueError(f"impl must be 'lanes' or 'vmap', got {impl!r}")
    if impl == "lanes" and neighbor_cap is not None:
        return dbscan_from_graph_many(
            edge_index,
            dists,
            num_nodes,
            eps=eps,
            min_samples=min_samples,
            edge_mask=edge_mask,
            node_mask=node_mask,
            neighbor_cap=neighbor_cap,
        )
    return jax.vmap(
        lambda e, m: dbscan_from_graph(
            edge_index,
            dists,
            num_nodes,
            eps=e,
            min_samples=m,
            edge_mask=edge_mask,
            node_mask=node_mask,
            neighbor_cap=neighbor_cap,
        )
    )(eps, min_samples)


class DBSCANFastRescan:
    """Cluster with DBSCAN, cheaply rescanning different eps values
    (reference ``fastrescanner.py:6-66``)."""

    def __init__(
        self,
        x: np.ndarray,
        max_eps: float = 1.0,
        *,
        max_num_neighbors: int = 128,
        node_mask: np.ndarray | None = None,
    ):
        """
        Args:
            x: Data to cluster [N, D]
            max_eps: Maximum epsilon usable during rescanning (radius of the
                precomputed neighbor graph). Keep as low as possible.
            max_num_neighbors: Degree cap of the neighbor graph. Must exceed
                the densest eps-neighborhood for exact DBSCAN semantics.
            node_mask: Validity mask for padded inputs.
        """
        self._x = jnp.asarray(x)
        self._max_eps = max_eps
        self._max_num_neighbors = max_num_neighbors
        self._node_mask = None if node_mask is None else jnp.asarray(node_mask)
        self._reset_graph(max_eps)

    def _reset_graph(self, max_eps: float) -> None:
        self._edge_index, self._edge_mask, self._dists = radius_graph(
            self._x,
            max_eps,
            max_num_neighbors=self._max_num_neighbors,
            node_mask=self._node_mask,
            loop=False,
        )
        self._cap = min(self._max_num_neighbors, self._x.shape[0])
        self._max_eps = max_eps

    def cluster(self, eps: float = 1.0, min_pts: int = 1) -> np.ndarray:
        """DBSCAN labels at ``eps <= max_eps`` (cheap; jitted with traced
        eps/min_pts, so repeated calls hit the compile cache)."""
        if eps > self._max_eps:
            self._reset_graph(eps)
        labels = dbscan_from_graph(
            self._edge_index,
            self._dists,
            self._x.shape[0],
            eps=jnp.asarray(eps, dtype=self._dists.dtype),
            min_samples=jnp.asarray(min_pts, dtype=jnp.int32),
            edge_mask=self._edge_mask,
            node_mask=self._node_mask,
            neighbor_cap=self._cap,
        )
        return np.asarray(labels)

    def cluster_many(
        self, trials: list[dict[str, float]], *, impl: str = "lanes"
    ) -> np.ndarray:
        """DBSCAN labels ``[len(trials), N]`` for a batch of
        ``{"eps": float, "min_samples": int}`` trials in ONE device call.

        All trials share the precomputed neighbor graph and the
        connected-components sweeps run batched (trials on the lane axis by
        default; ``impl="vmap"`` keeps the per-trial formulation), so T
        trials cost far less than T ``cluster()`` calls — this is the
        hyperparameter-scanner fast path (reference scans trial-by-trial on
        the host, ``postprocessing/dbscanscanner.py:160-178``).
        """
        if not trials:
            return np.zeros((0, self._x.shape[0]), dtype=np.int32)
        max_eps = max(t["eps"] for t in trials)
        if max_eps > self._max_eps:
            self._reset_graph(max_eps)
        eps = jnp.asarray([t["eps"] for t in trials], dtype=self._dists.dtype)
        min_samples = jnp.asarray(
            [t["min_samples"] for t in trials], dtype=jnp.int32
        )
        labels = _dbscan_many(
            self._edge_index,
            self._dists,
            self._x.shape[0],
            eps=eps,
            min_samples=min_samples,
            edge_mask=self._edge_mask,
            node_mask=self._node_mask,
            neighbor_cap=self._cap,
            impl=impl,
        )
        return np.asarray(labels)
