"""Tests for graph analysis + k-scanner (analog of reference
tests/test_graph_analysis.py and tests/test_k_scanner.py)."""

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from gnn_tracking_tpu.analysis.graphs import (
    get_all_graph_construction_stats,
    get_cc_labels,
    get_largest_segment_fracs,
    get_orphan_counts,
    get_track_graph_info_from_data,
    summarize_track_graph_info,
)
from gnn_tracking_tpu.graph_construction.k_scanner import GraphConstructionKNNScanner
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.metrics.graph_construction import get_efficiency_purity_edges


def chain_graph():
    """Hand-built graph: pid 1 has 4 hits in a chain with one break
    (segments of 3 and 1); pid 2 has 2 connected hits; node 6 is noise."""
    pid = np.array([1, 1, 1, 1, 2, 2, 0])
    # edges: 0-1, 1-2 (segment of 3), 4-5; node 3 isolated
    ei = np.array([[0, 1, 4], [1, 2, 5]])
    g = EventGraph.from_arrays(
        x=np.random.default_rng(0).normal(size=(7, 3)),
        edge_index=ei,
        y=np.ones(3, dtype=bool),
        particle_id=pid,
        pt=np.array([2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 0.0]),
        eta=np.zeros(7),
        reconstructable=np.ones(7),
        true_edge_index=np.array(
            [[0, 0, 0, 1, 1, 2, 4], [1, 2, 3, 2, 3, 3, 5]]
        ),
    )
    return g


def test_largest_segment_fracs():
    g = chain_graph()
    fracs = np.sort(get_largest_segment_fracs(g))
    # pid 1: largest segment 3/4; pid 2: 2/2
    np.testing.assert_allclose(fracs, [0.75, 1.0])


def test_largest_segment_fracs_padded():
    g = chain_graph().pad_to(16, 8, 8)
    fracs = np.sort(get_largest_segment_fracs(g))
    np.testing.assert_allclose(fracs, [0.75, 1.0])


def test_cc_labels():
    g = chain_graph()
    labels = np.asarray(
        get_cc_labels(g.edge_index, num_nodes=7, edge_mask=g.edge_mask)
    )
    assert labels[0] == labels[1] == labels[2]
    assert labels[4] == labels[5]
    assert labels[0] != labels[3]
    assert len(set(labels.tolist())) == 4


def test_track_graph_info():
    g = chain_graph()
    tgi = get_track_graph_info_from_data(g)
    assert set(tgi.pid) == {1, 2}
    row1 = tgi[tgi.pid == 1].iloc[0]
    assert row1.n_hits == 4
    assert row1.n_segments == 2
    assert row1.n_hits_largest_segment == 3
    summary = summarize_track_graph_info(tgi)
    assert summary["frac_segment100"] == 0.5
    assert summary["frac_segment50"] == 1.0


def test_orphan_counts():
    g = chain_graph()
    oc = get_orphan_counts(g)
    # nodes 3 (good) and 6 (noise) are orphans
    assert oc.n_orphan_total == 2
    assert oc.n_orphan_incorrect == 1
    assert oc.n_orphan_correct == 1


def test_efficiency_purity():
    g = chain_graph()
    r = get_efficiency_purity_edges(g)
    # 3 true candidate edges; 7 true pairs between good hits (6 for pid1 + 1
    # for pid2); candidate edges are directed single copies here
    assert r["purity"] == 1.0
    assert r["efficiency"] == pytest.approx(3 / (2 * 7))


def test_graph_construction_stats_smoke():
    g = chain_graph()
    stats = get_all_graph_construction_stats(g)
    assert stats["n_hits"] == 7
    assert stats["n_tracks"] == 3


def test_k_scanner():
    rng = np.random.default_rng(0)
    n_per_track, n_tracks = 6, 10
    centers = rng.normal(scale=10, size=(n_tracks, 3))
    x = (centers[:, None, :] + 0.3 * rng.normal(size=(n_tracks, n_per_track, 3))).reshape(-1, 3)
    pid = np.repeat(np.arange(1, n_tracks + 1), n_per_track)
    iu = np.triu_indices(len(pid), k=1)
    keep = pid[iu[0]] == pid[iu[1]]
    te = np.stack([iu[0][keep], iu[1][keep]])
    g = EventGraph.from_arrays(
        x=x,
        particle_id=pid,
        pt=np.full(len(pid), 2.0),
        eta=np.zeros(len(pid)),
        reconstructable=np.ones(len(pid)),
        true_edge_index=te,
    )
    scanner = GraphConstructionKNNScanner(ks=[1, 2, 3, 4, 5], max_radius=5.0)
    scanner(g, 0)
    foms = scanner.get_foms()
    assert "max_frac_segment50" in foms
    # with k=5 every track is fully connected -> frac50 should hit 1
    assert foms["max_frac_segment50"] == pytest.approx(1.0)
    # perfect-EC tracking upper bounds are recorded per scan point
    assert "max_double_majority_pt0.9" in scanner.results_raw.columns
    df = scanner.results_raw
    assert (df.groupby("k")["n_edges"].mean().diff().dropna() >= 0).all()


def test_k_scanner_reset():
    g = chain_graph()
    scanner = GraphConstructionKNNScanner(ks=[1, 2])
    scanner(g, 0)
    n1 = len(scanner.results_raw)
    scanner(g, 0)
    assert len(scanner.results_raw) == n1


@pytest.mark.parametrize(
    "edges,expected",
    [
        # one chain: single segment
        ([(0, 1), (1, 2), (2, 3), (3, 4)],
         dict(n_hits=5, n_segments=1, n_hits_largest_segment=5,
              distance_largest_segments=0, n_hits_largest_component=5)),
        # broken chain, disconnected halves
        ([(0, 1), (2, 3), (3, 4)],
         dict(n_hits=5, n_segments=2, n_hits_largest_segment=3,
              distance_largest_segments=float("inf"), n_hits_largest_component=3)),
        # halves bridged by a different-pid node
        ([(0, 1), (2, 3), (3, 4), (1, 10), (10, 2)],
         dict(n_hits=5, n_segments=2, n_hits_largest_segment=3,
              distance_largest_segments=2, n_hits_largest_component=5)),
    ],
)
def test_track_graph_info_reference_cases(edges, expected):
    """Hand-built cases from the reference (tests/test_graph_analysis.py)."""
    from gnn_tracking_tpu.analysis.graphs import get_track_graph_info

    g = nx.Graph(edges)
    pids = np.zeros(11, dtype=int)
    pids[5:] = 1  # nodes beyond the track (incl. the bridge) are other pids
    tgi = get_track_graph_info(g, pids[: max(max(e) for e in edges) + 1], 0)
    for key, val in expected.items():
        assert getattr(tgi, key) == val, key
