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
    #: "xla" or "pallas_sorted" (windowed one-hot matmul aggregation + dst
    #: gather; requires sorted_edges, E % 1024 == 0, bounded window spread)
    segment_impl: str = "xla"
    #: compute the relational MLP's first linear as three split matmuls —
    #: the node-side projections run at NODE level ([N,F]@[F,H] instead of
    #: [E,2F]@[2F,H]) and are gathered per edge, skipping the [E, 3F] concat.
    #: Mathematically identical to the fused layer (the three kernel blocks
    #: are the row-split of the concat kernel); cuts first-layer FLOPs by
    #: ~2·(E−N)/3E and the concat's HBM round trip. Parameter tree differs
    #: (relational_{dst,src,edge} + relational_rest instead of
    #: relational_model).
    split_relational: bool = False

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
        use_pallas = self.segment_impl == "pallas_sorted"
        if use_pallas:
            from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_gather

            assert self.sorted_edges, "pallas_sorted requires sorted_edges"

        # x_i = receiving node (target), x_j = sending node (source) —
        # matches reference flow="source_to_target".
        if self.split_relational:
            from gnn_tracking_tpu.models.mlp import TorchLinear

            hidden = self.edge_hidden_dim
            if hidden is None:
                hidden = max(2 * x.shape[-1] + edge_attr.shape[-1], self.edge_outdim)
            p_dst = TorchLinear(hidden, name="relational_dst")(x)
            p_src = TorchLinear(hidden, use_bias=False, name="relational_src")(x)
            p_e = TorchLinear(hidden, use_bias=False, name="relational_edge")(
                edge_attr
            )
            if use_pallas:
                g_dst = sorted_gather(p_dst, dst)
            else:
                g_dst = p_dst[dst]
            m1 = nn.relu(g_dst + p_src[src] + p_e)
            # remaining layers of the (L=3) relational MLP
            e_tilde = MLP(
                output_size=self.edge_outdim,
                hidden_dim=hidden,
                L=2,
                name="relational_rest",
            )(m1)
        else:
            x_dst = sorted_gather(x, dst) if use_pallas else x[dst]
            m = jnp.concatenate([x_dst, x[src], edge_attr], axis=1)
            e_tilde = MLP(
                output_size=self.edge_outdim,
                hidden_dim=self.edge_hidden_dim,
                name="relational_model",
            )(m)
        if self.aggr != "add":
            from gnn_tracking_tpu.ops.segment import scatter_edges_to_nodes

            agg = scatter_edges_to_nodes(
                e_tilde, edge_index, num_nodes, edge_mask, aggr=self.aggr
            )
        elif use_pallas:
            from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_segment_sum

            masked = e_tilde
            if edge_mask is not None:
                masked = jnp.where(edge_mask[:, None], e_tilde, 0)
            agg = sorted_segment_sum(masked, dst, num_nodes)
        else:
            agg = masked_segment_sum(
                e_tilde, dst, num_nodes, edge_mask, indices_are_sorted=self.sorted_edges
            )
        x_tilde = MLP(
            output_size=self.node_outdim,
            hidden_dim=self.node_hidden_dim,
            name="object_model",
        )(jnp.concatenate([x, agg], axis=1))
        return x_tilde, e_tilde
