from gnn_tracking_tpu.ops.segment import (
    gather_edge_endpoints,
    masked_segment_max,
    masked_segment_mean,
    masked_segment_sum,
    scatter_edges_to_nodes,
)
from gnn_tracking_tpu.ops.knn import knn_graph, knn_with_max_radius, radius_graph
from gnn_tracking_tpu.ops.cc import connected_components
from gnn_tracking_tpu.ops.dbscan import dbscan

__all__ = [
    "gather_edge_endpoints",
    "masked_segment_sum",
    "masked_segment_max",
    "masked_segment_mean",
    "scatter_edges_to_nodes",
    "knn_graph",
    "knn_with_max_radius",
    "radius_graph",
    "connected_components",
    "dbscan",
]
