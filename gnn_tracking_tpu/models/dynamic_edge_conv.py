"""EdgeConv with dynamically-built kNN graph (capability parity: reference
``models/dynamic_edge_conv.py``). The latent-space kNN uses our TPU kernel;
the edge index it computed is returned alongside the node embedding."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tracking_tpu.ops.knn import knn_graph
from gnn_tracking_tpu.ops.segment import masked_segment_max, masked_segment_sum


class DynamicEdgeConv(nn.Module):
    """EdgeConv over a kNN graph built in the current feature space.

    The message network receives ``[x_i, x_j - x_i]``; aggregation is "max"
    by default (like PyG's EdgeConv) or "add".
    """

    mlp: nn.Module
    k: int
    aggr: str = "max"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        node_mask: jax.Array | None = None,
        batch: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (node embedding, edge_index, edge_mask)."""
        edge_index, edge_mask, _ = knn_graph(
            x, min(self.k, x.shape[0] - 1), node_mask=node_mask, batch=batch
        )
        src, dst = edge_index[0], edge_index[1]
        x_i, x_j = x[dst], x[src]
        messages = self.mlp(jnp.concatenate([x_i, x_j - x_i], axis=-1))
        if self.aggr == "max":
            agg = masked_segment_max(messages, dst, x.shape[0], edge_mask)
        elif self.aggr == "add":
            agg = masked_segment_sum(messages, dst, x.shape[0], edge_mask)
        else:
            msg = f"Unknown aggregation {self.aggr}"
            raise ValueError(msg)
        return agg, edge_index, edge_mask
