"""Masked gather/segment primitives — the TPU message-passing substrate.

This replaces the reference's PyG ``MessagePassing.propagate`` scatter kernels
(reference ``models/interaction_network.py:67``; native torch ``scatter_add``
in the torch dependency). On TPU, message passing is expressed as

    gather endpoints  →  dense per-edge compute (MXU)  →  segment reduce

with fixed shapes and an edge validity mask. ``jax.ops.segment_sum`` lowers to
an XLA scatter-add which the TPU backend executes efficiently for sorted or
unsorted indices; hot paths can swap in the Pallas fused kernel from
``gnn_tracking_tpu.ops.pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.custom_vjp
def sorted_take(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``x[idx]`` whose BACKWARD uses the sorted-scatter lowering.

    The forward is an ordinary row gather. Its autodiff transpose is a
    scatter-add, which XLA lowers serially for unsorted indices — on a v5e
    the EC train step spends ~2/3 of its time in exactly these backward
    scatters (round-2 battery decomposition: fwd 24 ms, fwd+bwd 81 ms at
    262k edges). When ``idx`` is non-decreasing (the ``sorted_edges``
    promise: edges sorted by target), the cotangent scatter is a sorted
    segment-sum, so this custom VJP passes ``indices_are_sorted=True`` —
    same values, cheaper lowering. ONLY use under the sorted promise.
    """
    return x[idx]


def _sorted_take_fwd(x, idx):
    return x[idx], (idx, x.shape[0])


def _sorted_take_bwd(res, g):
    idx, n = res
    gx = jax.ops.segment_sum(
        g, idx, num_segments=n, indices_are_sorted=True
    )
    return gx.astype(g.dtype), None


sorted_take.defvjp(_sorted_take_fwd, _sorted_take_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_sorted_by(
    x: jax.Array, idx: jax.Array, perm: jax.Array, idx_sorted: jax.Array
) -> jax.Array:
    """``x[idx]`` whose backward scatters through a PRECOMPUTED sort.

    For index streams that are not naturally sorted (edge *sources*), a
    static permutation ``perm`` with ``idx_sorted = idx[perm]`` lets the
    cotangent ride the sorted-scatter lowering: gather the edge cotangents
    into sort order (cheap) + ``segment_sum(indices_are_sorted=True)``,
    instead of the serial unsorted scatter-add XLA emits for the autodiff
    transpose of a gather. Exactly the same values and gradients.
    """
    return x[idx]


def _take_sorted_by_fwd(x, idx, perm, idx_sorted):
    return x[idx], (idx, perm, idx_sorted, x.shape[0])


def _take_sorted_by_bwd(res, g):
    idx, perm, idx_sorted, n = res
    gx = jax.ops.segment_sum(
        g[perm], idx_sorted, num_segments=n, indices_are_sorted=True
    )
    return gx.astype(g.dtype), None, None, None


take_sorted_by.defvjp(_take_sorted_by_fwd, _take_sorted_by_bwd)


def gather_edge_endpoints(x: jax.Array, edge_index: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gather (source, target) node features for every edge.

    Returns ``(x_src, x_dst)``, each ``[E, F]``. Padded edges read node 0,
    which is harmless because their contributions are masked downstream.
    """
    return x[edge_index[0]], x[edge_index[1]]


def masked_segment_sum(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Segment-sum with an optional validity mask zeroing masked contributions.

    Pass ``indices_are_sorted=True`` when edges are sorted by target (e.g.
    kNN-built graphs, or `EventGraph.sort_edges_by_target`): XLA can then use
    a cheaper scatter lowering.
    """
    if mask is not None:
        values = jnp.where(mask.reshape((-1,) + (1,) * (values.ndim - 1)), values, 0)
    return jax.ops.segment_sum(
        values,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def masked_segment_max(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    fill: float = 0.0,
) -> jax.Array:
    """Segment-max; masked contributions are -inf, empty segments get ``fill``."""
    if mask is not None:
        neg = jnp.asarray(-jnp.inf, dtype=values.dtype)
        values = jnp.where(mask.reshape((-1,) + (1,) * (values.ndim - 1)), values, neg)
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill)


def masked_segment_mean(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    eps: float = 1e-12,
) -> jax.Array:
    """Segment-mean over valid contributions."""
    total = masked_segment_sum(values, segment_ids, num_segments, mask)
    if mask is None:
        ones = jnp.ones(values.shape[0], dtype=total.dtype)
    else:
        ones = mask.astype(total.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    counts = counts.reshape(counts.shape + (1,) * (total.ndim - 1))
    return total / (counts + eps)


def scatter_edges_to_nodes(
    edge_values: jax.Array,
    edge_index: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
    aggr: str = "add",
) -> jax.Array:
    """Aggregate per-edge values at their *target* nodes (source→target flow)."""
    targets = edge_index[1]
    if aggr == "add":
        return masked_segment_sum(edge_values, targets, num_nodes, edge_mask)
    if aggr == "max":
        return masked_segment_max(edge_values, targets, num_nodes, edge_mask)
    if aggr == "mean":
        return masked_segment_mean(edge_values, targets, num_nodes, edge_mask)
    msg = f"Unknown aggregation: {aggr}"
    raise ValueError(msg)


def node_degrees(
    edge_index: jax.Array,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
) -> jax.Array:
    """Number of valid edges touching each node (both endpoints counted)."""
    ones = (
        edge_mask.astype(jnp.int32)
        if edge_mask is not None
        else jnp.ones(edge_index.shape[1], dtype=jnp.int32)
    )
    deg = jax.ops.segment_sum(ones, edge_index[0], num_segments=num_nodes)
    deg += jax.ops.segment_sum(ones, edge_index[1], num_segments=num_nodes)
    return deg
