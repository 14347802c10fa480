"""On-device DBSCAN via radius graph + connected-component label propagation.

TPU-native replacement for sklearn's Cython ``dbscan_inner`` BFS + C++
``NearestNeighbors`` used by the reference
(``postprocessing/fastrescanner.py:2,27,64``; ``sklearn.cluster.DBSCAN`` in
``postprocessing/dbscanscanner.py``). Everything is jittable with static
shapes, so clustering runs on device inside the validation step instead of
shipping the latent space to the host.

Label semantics match sklearn exactly (given a sufficient neighbor cap):

* a point is *core* iff its eps-neighborhood (including itself) has at least
  ``min_samples`` points;
* clusters = connected components of the core-core eps-graph, numbered in
  order of their smallest core-point index (sklearn's discovery order);
* *border* points (non-core within eps of a core) join the lowest-numbered
  adjacent cluster (sklearn's BFS claims them in cluster order);
* everything else is noise (label -1).

Fast eps-rescan (reference ``DBSCANFastRescan``): build the radius graph once
at ``max_eps``, then re-cluster at any ``eps <= max_eps`` by masking edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnn_tracking_tpu.ops.cc import (
    compact_labels,
    connected_components,
    connected_components_neighbors,
    connected_components_neighbors_many,
)
from gnn_tracking_tpu.ops.knn import radius_graph


@functools.partial(jax.jit, static_argnames=("num_nodes", "neighbor_cap"))
def dbscan_from_graph(
    edge_index: jax.Array,
    dists: jax.Array,
    num_nodes: int,
    *,
    eps: jax.Array | float,
    min_samples: jax.Array | int,
    edge_mask: jax.Array | None = None,
    node_mask: jax.Array | None = None,
    neighbor_cap: int | None = None,
) -> jax.Array:
    """DBSCAN labels from a precomputed neighbor graph.

    ``edge_index`` must contain, for every node ``i``, edges ``(j, i)`` for all
    its neighbors ``j`` within the graph-construction radius (both directions
    present, no self loops) — exactly what ``ops.knn.radius_graph`` emits.
    ``eps`` and ``min_samples`` are traced values: rescanning different
    hyperparameters reuses the same compiled program.

    ``neighbor_cap``: promise that the edges are in ``radius_graph``'s
    query-major fixed-degree layout (edge ``i*cap + s`` targets node ``i``).
    Enables the scatter-free path — degree counts, connected components, and
    border assignment all become [N, cap] gathers + row reductions.
    """
    e = edge_index.shape[1]
    if edge_mask is None:
        edge_mask = jnp.ones((e,), dtype=bool)
    if node_mask is None:
        node_mask = jnp.ones((num_nodes,), dtype=bool)
    src, dst = edge_index[0], edge_index[1]

    eps = jnp.asarray(eps, dtype=dists.dtype)
    within = edge_mask & (dists <= eps)
    min_samples = jnp.asarray(min_samples, dtype=jnp.int32)
    sentinel = jnp.int32(num_nodes)

    if neighbor_cap is not None:
        # ---- scatter-free fast path (fixed-degree layout) ----
        assert e == num_nodes * neighbor_cap, (e, num_nodes, neighbor_cap)
        src2d = src.reshape(num_nodes, neighbor_cap)
        within2d = within.reshape(num_nodes, neighbor_cap)
        deg = jnp.sum(within2d, axis=1)
        core = node_mask & (deg + 1 >= min_samples)
        core_edges2d = within2d & core[src2d] & core[:, None]
        comp = connected_components_neighbors(src2d, core_edges2d)
        cand = jnp.where(within2d & core[src2d], comp[src2d], sentinel)
        border_rep = jnp.min(cand, axis=1)
    else:
        # Neighborhood size including the point itself.
        deg = jax.ops.segment_sum(
            within.astype(jnp.int32), dst, num_segments=num_nodes
        )
        core = node_mask & (deg + 1 >= min_samples)

        # Clusters = connected components of the core-core graph.
        # Representative label = min core index of the component. Radius-graph
        # edges are emitted query-major, i.e. sorted by target — use the
        # cheaper scatter lowering.
        core_edges = within & core[src] & core[dst]
        comp = connected_components(
            edge_index, num_nodes, edge_mask=core_edges, edges_sorted_by_dst=True
        )

        # Border points adopt the minimum representative among adjacent cores.
        cand = jnp.where(within & core[src], comp[src], sentinel)
        border_rep = jax.ops.segment_min(cand, dst, num_segments=num_nodes)

    has_core_neighbor = border_rep < sentinel
    rep = jnp.where(core, comp, jnp.where(has_core_neighbor, border_rep, sentinel))
    in_cluster = node_mask & (rep < sentinel)
    rep = jnp.where(in_cluster, rep, 0)
    return compact_labels(rep, valid=in_cluster, noise_value=-1)


@functools.partial(jax.jit, static_argnames=("num_nodes", "neighbor_cap"))
def dbscan_from_graph_many(
    edge_index: jax.Array,
    dists: jax.Array,
    num_nodes: int,
    *,
    eps: jax.Array,
    min_samples: jax.Array,
    edge_mask: jax.Array | None = None,
    node_mask: jax.Array | None = None,
    neighbor_cap: int,
) -> jax.Array:
    """Batched DBSCAN over ``B`` ``(eps, min_samples)`` trials sharing one
    fixed-degree neighbor graph. Returns labels ``[B, N]``, each row equal
    to the corresponding :func:`dbscan_from_graph` call.

    Internals keep the trial axis LAST so the hot connected-components
    sweep and the core/border gathers are shared-index row gathers of
    ``B``-lane rows instead of ``B`` separate scalar gathers (see
    :func:`gnn_tracking_tpu.ops.cc.connected_components_neighbors_many`).
    """
    n, cap = num_nodes, neighbor_cap
    e = edge_index.shape[1]
    assert e == n * cap, (e, n, cap)
    b = eps.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones((e,), dtype=bool)
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    src2d = edge_index[0].reshape(n, cap)
    flat_src = src2d.reshape(-1)
    sentinel = jnp.int32(n)

    eps = eps.astype(dists.dtype)
    min_samples = min_samples.astype(jnp.int32)
    within = (
        edge_mask.reshape(n, cap)[:, :, None]
        & (dists.reshape(n, cap)[:, :, None] <= eps[None, None, :])
    )  # [N, cap, B]
    deg = jnp.sum(within, axis=1)  # [N, B]
    core = node_mask[:, None] & (deg + 1 >= min_samples[None, :])  # [N, B]
    core_src = core[flat_src].reshape(n, cap, b)
    core_edges = within & core_src & core[:, None, :]
    comp = connected_components_neighbors_many(src2d, core_edges)  # [N, B]

    cand = jnp.where(
        within & core_src, comp[flat_src].reshape(n, cap, b), sentinel
    )
    border_rep = jnp.min(cand, axis=1)  # [N, B]
    has_core_neighbor = border_rep < sentinel
    rep = jnp.where(
        core, comp, jnp.where(has_core_neighbor, border_rep, sentinel)
    )
    in_cluster = node_mask[:, None] & (rep < sentinel)
    rep = jnp.where(in_cluster, rep, 0)
    # compacting is a one-shot per-trial cumsum — vmap is fine here
    return jax.vmap(
        lambda r, v: compact_labels(r, valid=v, noise_value=-1)
    )(rep.T, in_cluster.T)


def dbscan(
    x: jax.Array,
    *,
    eps: float,
    min_samples: int = 1,
    max_num_neighbors: int = 128,
    node_mask: jax.Array | None = None,
    block_size: int = 512,
) -> jax.Array:
    """One-shot DBSCAN over points ``x``.

    ``max_num_neighbors`` caps the neighbor graph degree; it must exceed the
    densest eps-neighborhood for exact sklearn equivalence.
    """
    edge_index, edge_mask, dists = radius_graph(
        x,
        eps,
        max_num_neighbors=max_num_neighbors,
        node_mask=node_mask,
        loop=False,
        block_size=block_size,
    )
    return dbscan_from_graph(
        edge_index,
        dists,
        x.shape[0],
        eps=eps,
        min_samples=min_samples,
        edge_mask=edge_mask,
        node_mask=node_mask,
        neighbor_cap=min(max_num_neighbors, x.shape[0]),
    )
