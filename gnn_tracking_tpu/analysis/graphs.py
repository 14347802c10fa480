"""Graph-level analysis of tracking graphs.

Capability parity: reference ``analysis/graphs.py``. The hot validation path
(``get_largest_segment_fracs``, ``get_cc_labels`` — called per k per event by
the k-scanner) runs **on device** via the label-propagation
connected-components kernel instead of host networkx (reference
``graphs.py:281-343``); the detailed per-track diagnostics
(``get_track_graph_info``) keep a host networkx implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pandas as pd

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.ops.cc import compact_labels, connected_components
from gnn_tracking_tpu.ops.unique import dense_index_of, dense_unique
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def get_cc_labels(
    edge_index: jax.Array,
    *,
    num_nodes: int,
    edge_mask: jax.Array | None = None,
    node_mask: jax.Array | None = None,
) -> jax.Array:
    """Connected-component labels, numbered consecutively
    (reference ``graphs.py:331-343``, host networkx → device kernel)."""
    labels = connected_components(
        edge_index, num_nodes, edge_mask=edge_mask, node_mask=node_mask
    )
    valid = (
        jnp.ones((num_nodes,), dtype=bool) if node_mask is None else node_mask
    )
    return compact_labels(labels, valid=valid, noise_value=-1)


@functools.partial(jax.jit, static_argnames=("pt_thld", "max_eta"))
def _largest_segment_fracs_jit(
    data: EventGraph, pt_thld: float, max_eta: float
) -> tuple[jax.Array, jax.Array]:
    """Per-particle largest-segment fraction (padded) + validity mask."""
    n = data.num_nodes
    hit_mask = get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta)
    # true edges between good hits only (reference strips everything else)
    keep_edges = (
        data.edge_mask
        & data.y.astype(bool)
        & hit_mask[data.edge_index[0]]
        & hit_mask[data.edge_index[1]]
    )
    labels = connected_components(
        data.edge_index, n, edge_mask=keep_edges, node_mask=hit_mask
    )
    comp_size = jax.ops.segment_sum(
        hit_mask.astype(jnp.int32), labels, num_segments=n
    )
    node_comp_size = jnp.where(hit_mask, comp_size[labels], 0)

    pid_unique, pid_valid, n_pids = dense_unique(data.particle_id, hit_mask, n)
    pid_idx = dense_index_of(data.particle_id, pid_unique)
    pid_count = jax.ops.segment_sum(
        hit_mask.astype(jnp.int32), pid_idx, num_segments=n
    )
    largest = jax.ops.segment_max(
        jnp.where(hit_mask, node_comp_size, -1), pid_idx, num_segments=n
    )
    fracs = jnp.where(
        pid_valid, largest / jnp.maximum(pid_count, 1), jnp.nan
    )
    return fracs, pid_valid


def get_largest_segment_fracs(
    data: EventGraph,
    *,
    pt_thld: float = 0.9,
    n_particles_sampled: int | None = None,
    max_eta: float = 4.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Fraction of hits in the largest same-particle segment, per particle
    (reference ``graphs.py:281-328``; segments = connected components of the
    true-edge subgraph among good hits). On-device; optional particle
    subsampling happens on the host mask."""
    if n_particles_sampled is not None:
        rng = rng or np.random.default_rng()
        pid = np.asarray(data.particle_id)
        hit_mask = np.asarray(get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta))
        pids = np.unique(pid[hit_mask])
        keep = set(rng.permutation(pids)[:n_particles_sampled].tolist())
        sample_mask = np.isin(pid, list(keep))
        data = data.mask_nodes(jnp.asarray(sample_mask))
    fracs, valid = _largest_segment_fracs_jit(data, pt_thld, max_eta)
    return np.asarray(fracs)[np.asarray(valid)]


# ----------------------------------------------------------------------
# Host-side detailed diagnostics (networkx)
# ----------------------------------------------------------------------


class TrackGraphInfo(NamedTuple):
    """Connectivity of one track's hits in the graph
    (reference ``graphs.py:49-73``)."""

    pid: int
    n_hits: int
    n_segments: int
    n_hits_largest_segment: int
    distance_largest_segments: int
    n_hits_largest_component: int


def get_n_reachable(g: nx.Graph, source: int, targets: Sequence[int]) -> int:
    """Number of target nodes reachable from source (excluding itself)."""
    reachable = nx.node_connected_component(g, source)
    return len(reachable & set(targets)) - 1


def shortest_path_length_multi(g: nx.Graph, sources, targets) -> int:
    """Shortest path between two node sets (inf if disconnected)."""
    shortest = float("inf")
    for source in sources:
        try:
            lengths = nx.single_source_shortest_path_length(g, source)
        except nx.NetworkXError:
            continue
        for target in targets:
            if target in lengths:
                shortest = min(shortest, lengths[target])
    return shortest


def get_track_graph_info(
    graph: nx.Graph, particle_ids: np.ndarray, pid: int
) -> TrackGraphInfo:
    """Per-track segment/component stats (reference ``graphs.py:86-140``)."""
    hits_for_pid = np.where(particle_ids == pid)[0]
    n_hits = len(hits_for_pid)
    assert n_hits > 0
    segment_subgraph = graph.subgraph(hits_for_pid)
    segments = sorted(nx.connected_components(segment_subgraph), key=len, reverse=True)
    if len(segments) == 1:
        n_hits_largest_component = n_hits
    else:
        component_sizes = [
            1 + get_n_reachable(graph, next(iter(seg)), hits_for_pid)
            for seg in segments
        ]
        n_hits_largest_component = max(component_sizes)
    distance_largest_segments = 0
    if len(segments) > 1:
        distance_largest_segments = shortest_path_length_multi(
            graph, sources=segments[0], targets=segments[1]
        )
    return TrackGraphInfo(
        pid=pid,
        n_hits=n_hits,
        n_segments=len(segments),
        n_hits_largest_segment=len(segments[0]),
        distance_largest_segments=distance_largest_segments,
        n_hits_largest_component=n_hits_largest_component,
    )


def _to_networkx(data: EventGraph, edge_mask: np.ndarray | None = None) -> nx.Graph:
    g = nx.Graph()
    g.add_nodes_from(np.where(np.asarray(data.node_mask))[0].tolist())
    ei = np.asarray(data.edge_index)
    mask = np.asarray(data.edge_mask)
    if edge_mask is not None:
        mask = mask & edge_mask
    g.add_edges_from(ei[:, mask].T.tolist())
    return g


def get_track_graph_info_from_data(
    data: EventGraph,
    *,
    w: np.ndarray | None = None,
    pt_thld: float = 0.9,
    threshold: float | None = None,
    max_eta: float = 4.0,
) -> pd.DataFrame:
    """`get_track_graph_info` for every good particle, optionally after an
    EC cut (reference ``graphs.py:143-192``)."""
    edge_mask = None
    if w is not None:
        edge_mask = np.asarray(w) > threshold
    gx = _to_networkx(data, edge_mask)
    pid = np.asarray(data.particle_id)
    good = np.asarray(get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta))
    particle_ids = np.unique(pid[good])
    records = [
        get_track_graph_info(gx, pid, p)._asdict() for p in particle_ids
    ]
    return pd.DataFrame.from_records(records)


def summarize_track_graph_info(tgi: pd.DataFrame) -> dict[str, float]:
    """Aggregate per-track stats (reference ``graphs.py:195-217``)."""
    if len(tgi) == 0:
        return {}
    seg_frac = tgi.n_hits_largest_segment / tgi.n_hits
    comp_frac = tgi.n_hits_largest_component / tgi.n_hits
    return {
        "frac_segment100": float((seg_frac == 1).sum() / len(tgi)),
        "frac_component100": float((comp_frac == 1).sum() / len(tgi)),
        "frac_segment50": float((seg_frac >= 0.5).sum() / len(tgi)),
        "frac_component50": float((comp_frac >= 0.5).sum() / len(tgi)),
        "frac_segment75": float((seg_frac >= 0.75).sum() / len(tgi)),
        "frac_component75": float((comp_frac >= 0.75).sum() / len(tgi)),
        "n_segments": float(tgi.n_segments.mean()),
        "frac_hits_largest_segment": float(seg_frac.mean()),
        "frac_hits_largest_component": float(comp_frac.mean()),
    }


class OrphanCount(NamedTuple):
    """Orphan-node statistics (reference ``graphs.py:220-232``)."""

    n_orphan_correct: int
    n_orphan_incorrect: int
    n_orphan_total: int


def get_orphan_counts(
    data: EventGraph, *, pt_thld: float = 0.9, max_eta: float = 4.0
) -> OrphanCount:
    """Count orphan (edge-less) nodes. Note: implemented as documented; the
    reference's implementation (``graphs.py:235-247``) zero-initializes the
    orphan mask and thus always reports zero orphans."""
    from gnn_tracking_tpu.ops.segment import node_degrees

    deg = np.asarray(
        node_degrees(data.edge_index, data.num_nodes, data.edge_mask)
    )
    node_mask = np.asarray(data.node_mask)
    orphan = (deg == 0) & node_mask
    good = np.asarray(get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta))
    return OrphanCount(
        n_orphan_correct=int((orphan & ~good).sum()),
        n_orphan_incorrect=int((orphan & good).sum()),
        n_orphan_total=int(orphan.sum()),
    )


def get_basic_counts(
    data: EventGraph, *, pt_thld: float = 0.9, max_eta: float = 4.0
) -> dict[str, int]:
    """Basic node/edge counts (reference ``graphs.py:250-266``)."""
    good = np.asarray(get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta))
    node_mask = np.asarray(data.node_mask)
    edge_mask = np.asarray(data.edge_mask)
    y = np.asarray(data.y)
    pid = np.asarray(data.particle_id)
    false_good_edges = (
        ~y & edge_mask & good[np.asarray(data.edge_index)[0]]
    )
    return {
        "n_hits": int(node_mask.sum()),
        "n_hits_noise": int(((pid <= 0) & node_mask).sum()),
        "n_hits_thld": int(good.sum()),
        "n_edges": int(edge_mask.sum()),
        "n_tracks": int(len(np.unique(pid[node_mask]))),
        "n_true_edges": int((y & edge_mask).sum()),
        "n_true_edges_thld": int(false_good_edges.sum()),
    }


def get_all_graph_construction_stats(
    data: EventGraph, pt_thld: float = 0.9, max_eta: float = 4.0
) -> dict[str, float]:
    """Combined graph-construction summary (reference ``graphs.py:268-278``)."""
    return (
        get_orphan_counts(data, pt_thld=pt_thld, max_eta=max_eta)._asdict()
        | summarize_track_graph_info(
            get_track_graph_info_from_data(data, pt_thld=pt_thld, max_eta=max_eta)
        )
        | get_basic_counts(data, pt_thld=pt_thld, max_eta=max_eta)
    )
