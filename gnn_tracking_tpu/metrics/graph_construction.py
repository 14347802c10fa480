"""Edge efficiency/purity for graph construction
(capability parity: reference ``metrics/graph_construction.py``)."""

from __future__ import annotations

import numpy as np

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask


def get_efficiency_purity_edges(
    data: EventGraph, pt_thld: float = 0.9, max_eta: float = 4.0
) -> dict[str, float]:
    """Efficiency and purity of candidate edges w.r.t. ``true_edge_index``,
    restricted to edges touching a good hit
    (reference ``metrics/graph_construction.py:6-25``)."""
    hit_mask = np.asarray(get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta))
    ei = np.asarray(data.edge_index)
    te = np.asarray(data.true_edge_index)
    edge_mask = (hit_mask[ei[0]] | hit_mask[ei[1]]) & np.asarray(data.edge_mask)
    true_edge_mask = (
        hit_mask[te[0]] & hit_mask[te[1]] & np.asarray(data.true_edge_mask)
    )
    y = np.asarray(data.y)
    n_true_found = float(y[edge_mask].sum())
    # factor 2: candidate edges are undirected/doubled, true edges aren't
    denom_eff = 2.0 * true_edge_mask.sum()
    denom_pur = float(edge_mask.sum())
    return {
        "efficiency": n_true_found / denom_eff if denom_eff else float("nan"),
        "purity": n_true_found / denom_pur if denom_pur else float("nan"),
    }
