"""Fixed-shape padded event graphs — the TPU-native data container.

This replaces the reference's dynamic-shape PyG ``Data`` objects
(``torch_geometric.data.Data``, used everywhere in
``/root/reference/src/gnn_tracking``). XLA compiles one program per shape, so
events are padded to bucketed sizes and carry explicit validity masks instead
of being resized. All graph surgery from the reference (``edge_subgraph``,
``subgraph``, orphan-node removal — reference
``models/track_condensation_networks.py:252-262``) becomes mask updates here.

Conventions:
* ``edge_index`` is ``[2, E]`` int32 with row 0 = source, row 1 = target
  (messages flow source→target, matching the reference's PyG flow
  ``models/interaction_network.py:36``).
* Padded (invalid) edges point at node 0 and are masked by ``edge_mask``;
  every consumer multiplies by the mask before aggregating.
* Padded nodes live at the tail and are masked by ``node_mask``. Their
  ``particle_id`` is ``PAD_PARTICLE_ID`` (< 0) so they never match a real
  particle and never count as noise (noise is ``particle_id == 0``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

PAD_PARTICLE_ID = -1


@struct.dataclass
class EventGraph:
    """One (or a disjoint-union batch of) padded hit graph(s).

    Output/data contract mirrors the reference model interface
    (``training/base.py:18-24``): ``x`` node features, ``edge_index``/
    ``edge_attr`` candidate edges, ``y`` edge truth, per-hit truth
    ``particle_id``/``pt``/``eta``/``reconstructable``/``layer``/``sector``,
    and ``true_edge_index`` (all intra-particle hit pairs).
    """

    # --- nodes ---
    x: jax.Array  # [N, F] node features
    particle_id: jax.Array  # [N] int64/int32; 0 = noise, <0 = padding
    pt: jax.Array  # [N]
    eta: jax.Array  # [N]
    reconstructable: jax.Array  # [N]
    node_mask: jax.Array  # [N] bool
    layer: jax.Array  # [N] int32 detector layer
    sector: jax.Array  # [N] int32 azimuthal sector
    batch: jax.Array  # [N] int32 graph id for disjoint-union batches

    # --- candidate edges ---
    edge_index: jax.Array  # [2, E] int32
    edge_attr: jax.Array  # [E, Fe]
    y: jax.Array  # [E] bool/float edge truth
    edge_mask: jax.Array  # [E] bool

    # --- truth edges (all intra-particle pairs, one direction) ---
    true_edge_index: jax.Array  # [2, Et] int32
    true_edge_mask: jax.Array  # [Et] bool

    # --- optional extras (e.g. baked EC scores, ML embeddings) ---
    extras: dict[str, jax.Array] = struct.field(default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    @property
    def n_valid_nodes(self) -> jax.Array:
        return self.node_mask.sum()

    @property
    def n_valid_edges(self) -> jax.Array:
        return self.edge_mask.sum()

    # ------------------------------------------------------------------
    @classmethod
    def from_arrays(
        cls,
        *,
        x: np.ndarray | jax.Array,
        edge_index: np.ndarray | jax.Array | None = None,
        edge_attr: np.ndarray | jax.Array | None = None,
        y: np.ndarray | jax.Array | None = None,
        particle_id: np.ndarray | jax.Array | None = None,
        pt: np.ndarray | jax.Array | None = None,
        eta: np.ndarray | jax.Array | None = None,
        reconstructable: np.ndarray | jax.Array | None = None,
        layer: np.ndarray | jax.Array | None = None,
        sector: np.ndarray | jax.Array | None = None,
        batch: np.ndarray | jax.Array | None = None,
        true_edge_index: np.ndarray | jax.Array | None = None,
        extras: dict[str, Any] | None = None,
        dtype: Any = jnp.float32,
        numpy: bool = False,
    ) -> "EventGraph":
        """Build an unpadded EventGraph from raw (host) arrays.

        ``numpy=True`` keeps every leaf a host numpy array (the pytree
        contract doesn't care) — REQUIRED for host-side ETL in a process
        whose JAX default device is a remote accelerator: ``jnp.asarray``
        would device_put each field through the tunnel and ``save_graph``
        would pull it back (measured 265 of 307 s of a 32-sector
        point-cloud build spent in device transfers, round-4 profile).
        """
        xp = np if numpy else jnp
        x = xp.asarray(x, dtype=dtype)
        n = x.shape[0]

        def _node(arr, fill, adtype):
            if arr is None:
                return xp.full((n,), fill, dtype=adtype)
            return xp.asarray(arr).astype(adtype)

        if edge_index is None:
            edge_index = xp.zeros((2, 0), dtype=jnp.int32)
        else:
            edge_index = xp.asarray(edge_index, dtype=jnp.int32)
        e = edge_index.shape[1]
        if edge_attr is None:
            edge_attr = xp.zeros((e, 0), dtype=dtype)
        else:
            edge_attr = xp.asarray(edge_attr, dtype=dtype)
        if true_edge_index is None:
            true_edge_index = xp.zeros((2, 0), dtype=jnp.int32)
        else:
            true_edge_index = xp.asarray(true_edge_index, dtype=jnp.int32)

        return cls(
            x=x,
            particle_id=_node(particle_id, 0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
            pt=_node(pt, 0.0, dtype),
            eta=_node(eta, 0.0, dtype),
            reconstructable=_node(reconstructable, 0.0, dtype),
            node_mask=xp.ones((n,), dtype=bool),
            layer=_node(layer, 0, jnp.int32),
            sector=_node(sector, 0, jnp.int32),
            batch=_node(batch, 0, jnp.int32),
            edge_index=edge_index,
            edge_attr=edge_attr,
            y=(xp.zeros((e,), dtype=bool) if y is None else xp.asarray(y).astype(bool)),
            edge_mask=xp.ones((e,), dtype=bool),
            true_edge_index=true_edge_index,
            true_edge_mask=xp.ones((true_edge_index.shape[1],), dtype=bool),
            extras=dict(extras or {}),
        )

    # ------------------------------------------------------------------
    def pad_to(self, n_nodes: int, n_edges: int, n_true_edges: int | None = None) -> "EventGraph":
        """Pad to fixed sizes (jit-cache-friendly buckets)."""
        if n_true_edges is None:
            n_true_edges = self.true_edge_index.shape[1]
        dn = n_nodes - self.num_nodes
        de = n_edges - self.num_edges
        dt = n_true_edges - self.true_edge_index.shape[1]
        if dn < 0 or de < 0 or dt < 0:
            msg = (
                f"Cannot pad graph of size (N={self.num_nodes}, E={self.num_edges}, "
                f"Et={self.true_edge_index.shape[1]}) to smaller "
                f"(N={n_nodes}, E={n_edges}, Et={n_true_edges})"
            )
            raise ValueError(msg)

        def _pad_nodes(arr, fill=0):
            pad_width = [(0, dn)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, pad_width, constant_values=fill)

        def _pad_edges(arr, d, fill=0):
            if arr.ndim == 2 and arr.shape[0] == 2:  # edge_index-like
                return jnp.pad(arr, [(0, 0), (0, d)], constant_values=fill)
            pad_width = [(0, d)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, pad_width, constant_values=fill)

        return self.__class__(
            x=_pad_nodes(self.x),
            particle_id=_pad_nodes(self.particle_id, PAD_PARTICLE_ID),
            pt=_pad_nodes(self.pt),
            eta=_pad_nodes(self.eta),
            reconstructable=_pad_nodes(self.reconstructable),
            node_mask=_pad_nodes(self.node_mask, False),
            layer=_pad_nodes(self.layer),
            sector=_pad_nodes(self.sector),
            batch=_pad_nodes(self.batch),
            edge_index=_pad_edges(self.edge_index, de),
            edge_attr=_pad_edges(self.edge_attr, de),
            y=_pad_edges(self.y, de, False),
            edge_mask=_pad_edges(self.edge_mask, de, False),
            true_edge_index=_pad_edges(self.true_edge_index, dt),
            true_edge_mask=_pad_edges(self.true_edge_mask, dt, False),
            extras={k: (_pad_nodes(v) if v.shape[0] == self.num_nodes else _pad_edges(v, de)) for k, v in self.extras.items()},
        )

    # ------------------------------------------------------------------
    def sort_edges_by_target(self, *, with_unsort: bool = False) -> "EventGraph":
        """Reorder edges so ``edge_index[1]`` is non-decreasing (valid edges
        first). Enables the ``sorted_edges`` fast scatter path in the models.
        Host-friendly (uses a sort, jittable too).

        With ``with_unsort=True`` the inverse permutation is stashed in
        ``extras["edge_unsort"]``: per-edge outputs computed on the sorted
        graph map back to the original edge order via ``out[edge_unsort]``
        (used by the serving predictor, which must report ``W`` in the
        caller's edge order)."""
        key = jnp.where(self.edge_mask, self.edge_index[1], self.num_nodes)
        order = jnp.argsort(key, stable=True)
        ei = self.edge_index[:, order]
        mask = self.edge_mask[order]
        # masked edges go last and are re-pointed at the LAST node so the
        # target sequence stays non-decreasing (their contributions are
        # zeroed by the mask either way)
        last = jnp.int32(self.num_nodes - 1)
        ei = jnp.stack([ei[0], jnp.where(mask, ei[1], last)])
        extras = {
            k: (v[order] if v.shape[0] == self.num_edges else v)
            for k, v in self.extras.items()
        }
        # source-sort auxiliary: a permutation making edge sources
        # non-decreasing. The backward of every x[src] gather is a
        # scatter-add, which XLA lowers serially for unsorted indices —
        # with this permutation the models route the cotangent through a
        # SORTED segment-sum instead (ops.segment.take_sorted_by; the EC
        # step is backward-scatter bound, round-2 battery decomposition).
        src = ei[0]
        src_perm = jnp.argsort(src, stable=True).astype(jnp.int32)
        extras["src_perm"] = src_perm
        extras["src_sorted"] = src[src_perm].astype(jnp.int32)
        if with_unsort:
            extras["edge_unsort"] = jnp.argsort(order).astype(jnp.int32)
        return self.replace(
            edge_index=ei,
            edge_attr=self.edge_attr[order],
            y=self.y[order],
            edge_mask=mask,
            extras=extras,
        )

    def compact(self) -> "EventGraph":
        """Host-side: physically drop masked nodes/edges (inverse of padding).

        Useful before serializing transformed graphs; NOT jittable (dynamic
        output shapes). Node indices are relabeled.
        """
        node_mask = np.asarray(self.node_mask)
        edge_mask = np.asarray(self.edge_mask)
        te_mask = np.asarray(self.true_edge_mask)
        new_index = np.cumsum(node_mask) - 1
        ei = np.asarray(self.edge_index)[:, edge_mask]
        te = np.asarray(self.true_edge_index)[:, te_mask]

        def _nodes(arr):
            return jnp.asarray(np.asarray(arr)[node_mask])

        return self.__class__(
            x=_nodes(self.x),
            particle_id=_nodes(self.particle_id),
            pt=_nodes(self.pt),
            eta=_nodes(self.eta),
            reconstructable=_nodes(self.reconstructable),
            node_mask=jnp.ones(int(node_mask.sum()), dtype=bool),
            layer=_nodes(self.layer),
            sector=_nodes(self.sector),
            batch=_nodes(self.batch),
            edge_index=jnp.asarray(new_index[ei]),
            edge_attr=jnp.asarray(np.asarray(self.edge_attr)[edge_mask]),
            y=jnp.asarray(np.asarray(self.y)[edge_mask]),
            edge_mask=jnp.ones(int(edge_mask.sum()), dtype=bool),
            true_edge_index=jnp.asarray(new_index[te]),
            true_edge_mask=jnp.ones(int(te_mask.sum()), dtype=bool),
            extras={
                k: jnp.asarray(
                    np.asarray(v)[node_mask]
                    if v.shape[0] == self.num_nodes
                    else np.asarray(v)[edge_mask]
                )
                for k, v in self.extras.items()
            },
        )

    def mask_edges(self, keep: jax.Array) -> "EventGraph":
        """TPU-native analog of PyG ``Data.edge_subgraph`` — masks instead of
        reshaping (reference ``track_condensation_networks.py:252``)."""
        return self.replace(edge_mask=self.edge_mask & keep)

    def mask_nodes(self, keep: jax.Array) -> "EventGraph":
        """TPU-native analog of PyG ``Data.subgraph``: masks the nodes and all
        edges touching a removed node."""
        node_mask = self.node_mask & keep
        edge_keep = node_mask[self.edge_index[0]] & node_mask[self.edge_index[1]]
        return self.replace(node_mask=node_mask, edge_mask=self.edge_mask & edge_keep)


def pad_sizes(n: int, bucket: int = 1024) -> int:
    """Round up to the next multiple of ``bucket`` (shape-bucketing helper)."""
    return int(-(-n // bucket) * bucket)


def batch_graphs(graphs: list[EventGraph]) -> EventGraph:
    """Disjoint-union batching of equally-typed graphs (PyG ``Batch`` analog).

    Node indices of each graph are offset; the ``batch`` field records graph
    membership. Graphs should be padded to common bucket sizes first if the
    result feeds a jitted function.
    """
    offsets = np.cumsum([0] + [g.num_nodes for g in graphs[:-1]])

    def _cat_nodes(field):
        return jnp.concatenate([getattr(g, field) for g in graphs], axis=0)

    def _cat_edges(field):
        parts = []
        for g, off in zip(graphs, offsets):
            arr = getattr(g, field)
            if field in ("edge_index", "true_edge_index"):
                arr = arr + off
            parts.append(arr)
        return jnp.concatenate(parts, axis=-1 if field in ("edge_index", "true_edge_index") else 0)

    batch_ids = jnp.concatenate(
        [jnp.full((g.num_nodes,), i, dtype=jnp.int32) for i, g in enumerate(graphs)]
    )
    return EventGraph(
        x=_cat_nodes("x"),
        particle_id=_cat_nodes("particle_id"),
        pt=_cat_nodes("pt"),
        eta=_cat_nodes("eta"),
        reconstructable=_cat_nodes("reconstructable"),
        node_mask=_cat_nodes("node_mask"),
        layer=_cat_nodes("layer"),
        sector=_cat_nodes("sector"),
        batch=batch_ids,
        edge_index=_cat_edges("edge_index"),
        edge_attr=jnp.concatenate([g.edge_attr for g in graphs], axis=0),
        y=jnp.concatenate([g.y for g in graphs], axis=0),
        edge_mask=jnp.concatenate([g.edge_mask for g in graphs], axis=0),
        true_edge_index=_cat_edges("true_edge_index"),
        true_edge_mask=jnp.concatenate([g.true_edge_mask for g in graphs], axis=0),
        extras={
            k: jnp.concatenate([g.extras[k] for g in graphs], axis=0)
            for k in (graphs[0].extras or {})
            if all(k in g.extras for g in graphs)
        },
    )
