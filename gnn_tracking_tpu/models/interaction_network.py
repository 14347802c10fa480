"""Interaction network — the core message-passing op.

Capability parity: reference ``models/interaction_network.py``. The PyG
``MessagePassing.propagate`` (native scatter-add) becomes the TPU pattern:
gather endpoints → relational MLP over the [E, ·] batch (MXU) → masked
segment-sum at targets → object MLP. The edge validity mask makes this exact
on padded graphs and implements the reference's dynamic ``edge_subgraph``
cuts as masking.
"""

from __future__ import annotations

import jax
from flax import linen as nn
import jax.numpy as jnp

from gnn_tracking_tpu.models.mlp import MLP
from gnn_tracking_tpu.ops.segment import masked_segment_sum


class InteractionNetwork(nn.Module):
    """Relational + object model message passing (reference
    ``interaction_network.py:12-103``).

    Message for edge (j → i): ``e' = MLP_R([x_i, x_j, e])``; aggregation:
    sum of messages at target i; update: ``x' = MLP_O([x, agg])``.
    Returns (node embedding, edge embedding).
    """

    node_outdim: int = 3
    edge_outdim: int = 4
    node_hidden_dim: int | None = 40
    edge_hidden_dim: int | None = 40
    aggr: str = "add"
    #: promise that edge_index[1] is non-decreasing (cheaper scatter lowering)
    sorted_edges: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_index: jax.Array,
        edge_attr: jax.Array,
        edge_mask: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        num_nodes = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        # x_i = receiving node (target), x_j = sending node (source) —
        # matches reference flow="source_to_target".
        m = jnp.concatenate([x[dst], x[src], edge_attr], axis=1)
        e_tilde = MLP(
            output_size=self.edge_outdim,
            hidden_dim=self.edge_hidden_dim,
            name="relational_model",
        )(m)
        if self.aggr != "add":
            msg = f"Unsupported aggregation: {self.aggr}"
            raise NotImplementedError(msg)
        agg = masked_segment_sum(
            e_tilde, dst, num_nodes, edge_mask, indices_are_sorted=self.sorted_edges
        )
        x_tilde = MLP(
            output_size=self.node_outdim,
            hidden_dim=self.node_hidden_dim,
            name="object_model",
        )(jnp.concatenate([x, agg], axis=1))
        return x_tilde, e_tilde
