"""Intra-event graph partitioning over the ``graph`` mesh axis.

The reference scales to full-detector events only by *offline* azimuthal
sectorization (``preprocessing/point_cloud_builder.py:242``: cut the event
into wedges with overlap and train on wedges independently). The TPU-native
equivalent keeps the event whole and **shards one graph across chips** — the
graph analog of sequence/context parallelism (SURVEY §2.10/§5.7):

* hits are partitioned into P contiguous shards (sorted by azimuth so
  boundary traffic is small, mirroring the sectorization geometry);
* each edge lives on the shard owning its *target* hit, so the
  segment-sum aggregation is local;
* source hits owned by other shards become *halo* entries: during message
  passing each shard fetches the halo features via an ``all_gather`` over
  the ``graph`` axis (XLA rides the ICI). A ppermute ring that exchanges
  only boundary hits and overlaps with local aggregation is the planned
  refinement; the all-gather version is exact and simple.

Everything is static-shape: per-shard node/edge/halo arrays are padded to
common sizes at partition time.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.graphs import EventGraph


@struct.dataclass
class ShardedGraph:
    """One event partitioned into P shards (leading axis = shard).

    Edge sources are encoded in *extended local* coordinates: indices
    ``< n_local`` refer to the shard's own hits, indices ``>= n_local`` into
    its halo block. ``halo_index`` holds, for each halo slot, the *global*
    index of the hit it mirrors (used to fetch features after all-gather).
    """

    # per-shard node data [P, N_loc, ...]
    x: jax.Array
    node_mask: jax.Array  # [P, N_loc]
    global_index: jax.Array  # [P, N_loc] global hit index of each local slot
    layer: jax.Array  # [P, N_loc] detector layer (heterogeneous encoders)
    # per-shard halo [P, H]: owner shard + local slot of each mirrored hit
    halo_shard: jax.Array
    halo_local: jax.Array
    halo_mask: jax.Array  # [P, H]
    # pairwise exchange tables [P, P, Hp] for the all-to-all halo path:
    # send_local[p, s]: local rows owner p sends to requester s;
    # recv_slot[s, p]: halo slots where requester s puts rows from owner p.
    send_local: jax.Array
    send_mask: jax.Array
    recv_slot: jax.Array
    recv_mask: jax.Array
    # per-shard edges [P, 2, E_loc] — src in extended-local, dst in local coords
    edge_index: jax.Array
    edge_attr: jax.Array  # [P, E_loc, Fe]
    edge_mask: jax.Array  # [P, E_loc]
    y: jax.Array  # [P, E_loc] edge truth labels (zeros if the event has none)
    edge_global: jax.Array  # [P, E_loc] global edge index of each local edge
    #: static edge-block boundary (``halo_edges_last=True``): every edge at
    #: index >= e_split (in EVERY shard) may source a halo row; edges before
    #: it are guaranteed local-source. 0 = no such guarantee.
    e_split: int = struct.field(pytree_node=False, default=0)

    @property
    def n_shards(self) -> int:
        return self.x.shape[0]

    @property
    def n_local(self) -> int:
        return self.x.shape[1]


def partition_event(
    graph: EventGraph,
    n_shards: int,
    *,
    sort_key: np.ndarray | None = None,
    sort_edges: bool = False,
    halo_edges_last: bool = False,
    pad_to: dict | None = None,
) -> ShardedGraph:
    """Host-side partitioner: sort hits (default: by azimuth φ of the second
    feature column as produced by the point-cloud builder), split into P
    contiguous shards, build halo tables.

    ``sort_edges=True`` orders each shard's edges by local target (padding
    slots point at the last local node), honoring the ``sorted_edges``
    promise of the interaction networks — the cheaper sorted-scatter
    lowering measured ~8-12%% faster on v5e (BENCH_NOTES.md).

    ``pad_to`` sets minimum per-shard buffer sizes
    (``{"n_local", "e_local", "halo", "halo_pair", "e_halo"}``) so several
    events partition to IDENTICAL shapes — required to stack them on a
    ``data`` mesh axis (``parallel/mesh2d.stack_sharded``).

    ``halo_edges_last=True`` additionally orders each shard's edges as
    ``[local-source block | halo-source block]`` with a STATIC boundary
    (``ShardedGraph.e_split``, uniform across shards): everything before the
    boundary provably never reads a halo row. Interaction networks use this
    to compute the local-edge messages concurrently with the halo exchange
    (compute/communication overlap — the collective's results are only
    consumed by the tail block).
    """
    pad_to = pad_to or {}
    n = graph.num_nodes
    x = np.asarray(graph.x)
    node_mask = np.asarray(graph.node_mask)
    ei = np.asarray(graph.edge_index)
    ea = np.asarray(graph.edge_attr)
    em = np.asarray(graph.edge_mask)

    if sort_key is None:
        sort_key = x[:, 1] if x.shape[1] > 1 else np.arange(n, dtype=float)
    # stable sort: valid nodes first, then by key — padding goes last
    order = np.lexsort((sort_key, ~node_mask))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)

    n_loc = max(-(-n // n_shards), int(pad_to.get("n_local", 0)))
    shard_of = rank // (-(-n // n_shards))  # shard of each global hit
    local_of = rank % (-(-n // n_shards))

    # assign edges to the shard of their target
    dst_shard = shard_of[ei[1]]
    src_shard = shard_of[ei[0]]
    per_shard_edges = []
    per_shard_halo_edges: list[np.ndarray] = []
    for s in range(n_shards):
        idx = np.where(em & (dst_shard == s))[0]
        if halo_edges_last:
            idx_h = idx[src_shard[idx] != s]
            idx = idx[src_shard[idx] == s]
            if sort_edges:
                idx_h = idx_h[np.argsort(local_of[ei[1, idx_h]], kind="stable")]
            per_shard_halo_edges.append(idx_h)
        if sort_edges:
            idx = idx[np.argsort(local_of[ei[1, idx]], kind="stable")]
        per_shard_edges.append(idx)
    if halo_edges_last:
        e_split = max((len(e) for e in per_shard_edges), default=1)
        e_split = max(e_split, 1, int(pad_to.get("e_local", 0)))
        e_halo = max((len(e) for e in per_shard_halo_edges), default=1)
        e_halo = max(e_halo, 1, int(pad_to.get("e_halo", 0)))
        e_loc = e_split + e_halo
    else:
        e_split = 0
        e_loc = max((len(e) for e in per_shard_edges), default=1)
        e_loc = max(e_loc, 1, int(pad_to.get("e_local", 0)))

    # halo: per shard, unique remote sources
    halos = []
    for s in range(n_shards):
        idx = per_shard_edges[s]
        if halo_edges_last:
            idx = np.concatenate([idx, per_shard_halo_edges[s]])
        src = ei[0, idx]
        remote = np.unique(src[shard_of[src] != s])
        halos.append(remote)
    h_max = max((len(h) for h in halos), default=1)
    h_max = max(h_max, 1, int(pad_to.get("halo", 0)))

    P_ = n_shards
    sx = np.zeros((P_, n_loc) + x.shape[1:], dtype=x.dtype)
    smask = np.zeros((P_, n_loc), dtype=bool)
    sglobal = np.zeros((P_, n_loc), dtype=np.int32)
    glayer = np.asarray(graph.layer)
    slayer = np.zeros((P_, n_loc), dtype=np.int32)
    shalo_shard = np.zeros((P_, h_max), dtype=np.int32)
    shalo_local = np.zeros((P_, h_max), dtype=np.int32)
    shalo_mask = np.zeros((P_, h_max), dtype=bool)
    sei = np.zeros((P_, 2, e_loc), dtype=np.int32)
    sea = np.zeros((P_, e_loc) + ea.shape[1:], dtype=ea.dtype)
    sem = np.zeros((P_, e_loc), dtype=bool)
    ey = np.asarray(graph.y, dtype=np.float32) if graph.y is not None else None
    sy = np.zeros((P_, e_loc), dtype=np.float32)
    seg = np.zeros((P_, e_loc), dtype=np.int32)

    # pairwise exchange tables: hp_max = max rows any owner sends any peer
    per_pair: dict[tuple[int, int], np.ndarray] = {}
    for s in range(P_):
        halo = halos[s]
        for p in range(P_):
            per_pair[(p, s)] = halo[shard_of[halo] == p]
    hp_max = max((len(v) for v in per_pair.values()), default=1)
    hp_max = max(hp_max, 1, int(pad_to.get("halo_pair", 0)))
    ssend_local = np.zeros((P_, P_, hp_max), dtype=np.int32)
    ssend_mask = np.zeros((P_, P_, hp_max), dtype=bool)
    srecv_slot = np.zeros((P_, P_, hp_max), dtype=np.int32)
    srecv_mask = np.zeros((P_, P_, hp_max), dtype=bool)

    for s in range(P_):
        halo_pos = {g: j for j, g in enumerate(halos[s])}
        for p in range(P_):
            rows = per_pair[(p, s)]
            ssend_local[p, s, : len(rows)] = local_of[rows]
            ssend_mask[p, s, : len(rows)] = True
            srecv_slot[s, p, : len(rows)] = [halo_pos[g] for g in rows]
            srecv_mask[s, p, : len(rows)] = True

    n_per_shard = -(-n // n_shards)
    for s in range(P_):
        own = order[s * n_per_shard : (s + 1) * n_per_shard]
        k = len(own)
        sx[s, :k] = x[own]
        smask[s, :k] = node_mask[own]
        sglobal[s, :k] = own
        slayer[s, :k] = glayer[own]
        halo = halos[s]
        shalo_shard[s, : len(halo)] = shard_of[halo]
        shalo_local[s, : len(halo)] = local_of[halo]
        shalo_mask[s, : len(halo)] = True
        # remote source → extended local index n_loc + halo slot
        halo_slot = {g: n_loc + j for j, g in enumerate(halo)}

        def fill_block(idx, off, cap):
            src, dst = ei[0, idx], ei[1, idx]
            src_local = np.array(
                [
                    local_of[g] if shard_of[g] == s else halo_slot[g]
                    for g in src
                ],
                dtype=np.int32,
            )
            sei[s, 0, off : off + len(idx)] = src_local
            sei[s, 1, off : off + len(idx)] = local_of[dst]
            if sort_edges:
                # masked tail keeps dst non-decreasing (last local node)
                sei[s, 1, off + len(idx) : off + cap] = n_loc - 1
            sea[s, off : off + len(idx)] = ea[idx]
            sem[s, off : off + len(idx)] = True
            if ey is not None and len(ey):
                sy[s, off : off + len(idx)] = ey[idx]
            seg[s, off : off + len(idx)] = idx

        if halo_edges_last:
            fill_block(per_shard_edges[s], 0, e_split)
            fill_block(per_shard_halo_edges[s], e_split, e_loc - e_split)
        else:
            fill_block(per_shard_edges[s], 0, e_loc)

    return ShardedGraph(
        x=jnp.asarray(sx),
        node_mask=jnp.asarray(smask),
        global_index=jnp.asarray(sglobal),
        layer=jnp.asarray(slayer),
        halo_shard=jnp.asarray(shalo_shard),
        halo_local=jnp.asarray(shalo_local),
        halo_mask=jnp.asarray(shalo_mask),
        send_local=jnp.asarray(ssend_local),
        send_mask=jnp.asarray(ssend_mask),
        recv_slot=jnp.asarray(srecv_slot),
        recv_mask=jnp.asarray(srecv_mask),
        edge_index=jnp.asarray(sei),
        edge_attr=jnp.asarray(sea),
        edge_mask=jnp.asarray(sem),
        y=jnp.asarray(sy),
        edge_global=jnp.asarray(seg),
        e_split=e_split,
    )


def gather_halo(x_local: jax.Array, sg: "ShardedGraph", axis_name: str = "graph"):
    """Inside ``shard_map``: extend the local node features with the halo
    block fetched from peer shards (all-gather over ICI)."""
    # x_local: [N_loc, F] (this shard)
    all_x = jax.lax.all_gather(x_local, axis_name)  # [P, N_loc, F]
    halo_x = all_x[sg.halo_shard, sg.halo_local]  # [H, F]
    halo_x = jnp.where(sg.halo_mask[:, None], halo_x, 0)
    return jnp.concatenate([x_local, halo_x], axis=0)  # [N_loc + H, F]


def gather_halo_a2a(x_local: jax.Array, sg: "ShardedGraph", axis_name: str = "graph"):
    """Inside ``shard_map``: halo fetch that exchanges ONLY boundary rows via
    ``all_to_all`` — O(halo) ICI traffic instead of the all-gather's
    O(N_loc · P). Exact same result as `gather_halo`.

    Per-shard views expected (leading [P, ...] axis sliced away), except the
    pairwise tables which are indexed by this shard's position:
    ``sg.send_local``/``send_mask`` rows for me as OWNER, ``recv_slot`` rows
    for me as REQUESTER.
    """
    send_local = sg.send_local  # [P, Hp] (my rows to send to each requester)
    send_mask = sg.send_mask  # [P, Hp]
    recv_slot = sg.recv_slot  # [P, Hp] (where rows from each owner land)
    h = sg.halo_mask.shape[0]

    send_buf = x_local[send_local]  # [P, Hp, F]
    send_buf = jnp.where(send_mask[:, :, None], send_buf, 0)
    recv = jax.lax.all_to_all(
        send_buf, axis_name, split_axis=0, concat_axis=0, tiled=True
    )  # [P, Hp, F]: block p = rows owner p sent to me
    halo_x = jnp.zeros((h,) + x_local.shape[1:], dtype=x_local.dtype)
    flat_slots = recv_slot.reshape(-1)
    flat_recv = recv.reshape((-1,) + x_local.shape[1:])
    flat_valid = sg.recv_mask.reshape(-1)
    halo_x = halo_x.at[jnp.where(flat_valid, flat_slots, h)].add(
        flat_recv, mode="drop"
    )
    return jnp.concatenate([x_local, halo_x], axis=0)


def ring_halo_distance(sg: "ShardedGraph") -> int:
    """Largest ring distance any halo row must travel (host-side check).

    With φ-sorted contiguous shards (``partition_event`` default) boundary
    sources live on ring-adjacent shards, so this is usually 1 — the
    condition under which :func:`gather_halo_ring`'s ``max_dist=1`` is
    exact. φ wraps, so shard 0 and shard P-1 are ring neighbors.
    """
    import numpy as np

    send_mask = np.asarray(sg.send_mask)  # [owner, requester, Hp]
    p = send_mask.shape[0]
    dmax = 0
    for o in range(p):
        for r in range(p):
            if o != r and send_mask[o, r].any():
                d = abs(o - r)
                dmax = max(dmax, min(d, p - d))
    return dmax


def gather_halo_ring(
    x_local: jax.Array,
    sg: "ShardedGraph",
    axis_name: str = "graph",
    max_dist: int = 1,
):
    """Inside ``shard_map``: halo fetch via neighbor ``ppermute`` steps.

    Where :func:`gather_halo_a2a` launches one all-to-all whose send buffer
    is padded for ALL ``P`` peers (``[P, Hp, F]`` on the wire even when only
    neighbors need rows), this sends ``2·max_dist`` point-to-point ppermutes
    of ``[Hp, F]`` — for φ-contiguous shards (halo distance 1) that is a
    ``P/2``× traffic cut and every transfer rides a physical neighbor ICI
    link. The per-distance steps carry no data dependence between them, so
    XLA's latency-hiding scheduler is free to overlap them with each other
    and with any independent local compute in the surrounding layer.

    EXACT only when every halo row's owner is within ``max_dist`` ring hops
    (check with :func:`ring_halo_distance`); rows beyond are dropped.
    """
    p = sg.send_local.shape[0]
    me = jax.lax.axis_index(axis_name)
    h = sg.halo_mask.shape[0]
    halo_x = jnp.zeros((h,) + x_local.shape[1:], dtype=x_local.dtype)
    for d in range(1, p):
        if min(d, p - d) > max_dist:
            continue
        req = (me + d) % p  # the requester this shard serves at step d
        rows = jnp.take(sg.send_local, req, axis=0)  # [Hp]
        mask = jnp.take(sg.send_mask, req, axis=0)
        buf = jnp.where(mask[:, None], x_local[rows], 0)
        perm = [(i, (i + d) % p) for i in range(p)]
        got = jax.lax.ppermute(buf, axis_name, perm)  # rows from owner me-d
        owner = (me - d) % p
        slots = jnp.take(sg.recv_slot, owner, axis=0)
        vmask = jnp.take(sg.recv_mask, owner, axis=0)
        halo_x = halo_x.at[jnp.where(vmask, slots, h)].add(got, mode="drop")
    return jnp.concatenate([x_local, halo_x], axis=0)


HALO_IMPLS: dict[str, Callable] = {
    "all_gather": gather_halo,
    "a2a": gather_halo_a2a,
    "ring": gather_halo_ring,
}


def make_sharded_apply(
    mesh: Mesh,
    n_local: int,
    layer_fn: Callable,
    n_layers: int,
    axis_name: str = "graph",
    halo_impl: str = "all_gather",
):
    """Build a ``shard_map``-ped message-passing stack over a ShardedGraph.

    ``layer_fn(params_i, x_ext, edge_index, edge_attr, edge_mask, n_local)``
    must return ``(x_local_new [N_loc, F], edge_attr_new)``; the wrapper
    handles the halo exchange before every layer.
    """
    from jax import shard_map

    spec_sharded = P(axis_name)

    def _run(params, sg: ShardedGraph):
        def per_shard(params, sg_shard: ShardedGraph):
            # inside: all leading [P, ...] axes are sliced away
            sg_local = jax.tree.map(lambda v: v[0], sg_shard)
            x = sg_local.x
            edge_attr = sg_local.edge_attr
            fetch = gather_halo if halo_impl == "all_gather" else gather_halo_a2a
            for i in range(n_layers):
                x_ext = fetch(x, sg_local, axis_name)
                x, edge_attr = layer_fn(
                    params[i] if isinstance(params, (list, tuple)) else params,
                    x_ext,
                    sg_local.edge_index,
                    edge_attr,
                    sg_local.edge_mask,
                    n_local,
                )
            return x[None], edge_attr[None]

        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), spec_sharded),
            out_specs=(spec_sharded, spec_sharded),
        )(params, sg)

    return jax.jit(_run)


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def unpartition_nodes(
    values: jax.Array, sg: ShardedGraph, num_nodes: int
) -> jax.Array:
    """Scatter per-shard node values [P, N_loc, ...] back to global order."""
    flat_idx = sg.global_index.reshape(-1)
    flat_vals = values.reshape((-1,) + values.shape[2:])
    flat_mask = sg.node_mask.reshape(-1)
    out = jnp.zeros((num_nodes,) + values.shape[2:], dtype=values.dtype)
    return out.at[jnp.where(flat_mask, flat_idx, num_nodes)].set(
        flat_vals, mode="drop"
    )


def unpartition_edges(
    values: jax.Array, sg: ShardedGraph, num_edges: int
) -> jax.Array:
    """Scatter per-shard edge values [P, E_loc, ...] back to global edge
    order (e.g. reassembling the sharded GraphTCN's edge weights for
    analysis/metrics)."""
    flat_idx = sg.edge_global.reshape(-1)
    flat_vals = values.reshape((-1,) + values.shape[2:])
    flat_mask = sg.edge_mask.reshape(-1)
    out = jnp.zeros((num_edges,) + values.shape[2:], dtype=values.dtype)
    return out.at[jnp.where(flat_mask, flat_idx, num_edges)].set(
        flat_vals, mode="drop"
    )
