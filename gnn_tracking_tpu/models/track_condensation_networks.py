"""Track-condensation networks (capability parity: reference
``models/track_condensation_networks.py``).

The central difference to the reference: where it physically rewrites the
graph after edge classification (``data.edge_subgraph(edge_mask)`` /
orphan-node ``subgraph`` — reference ``tcn.py:252-262``, dynamic shapes), we
keep static shapes and thread masks: the EC cut becomes an edge-validity
mask consumed by the condensation interaction networks, orphan removal
becomes a node mask returned as ``ec_hit_mask``. Outputs keep full padded
length; losses and metrics apply the masks.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN, PerfectEdgeClassification
from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
from gnn_tracking_tpu.models.mlp import MLP, HeterogeneousResFCNN, ResFCNN
from gnn_tracking_tpu.models.resin import ResIN
from gnn_tracking_tpu.ops.segment import node_degrees


class INConvBlock(nn.Module):
    """Dynamic-edge-conv + interaction-network block for point-cloud-direct
    models (reference ``tcn.py:23-66``)."""

    indim: int
    h_dim: int
    e_dim: int
    L: int
    k: int
    hidden_dim: int = 100
    alpha: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        node_mask: jax.Array | None = None,
        batch: jax.Array | None = None,
    ) -> jax.Array:
        from gnn_tracking_tpu.models.dynamic_edge_conv import DynamicEdgeConv

        node_encoder = MLP(
            output_size=self.h_dim, hidden_dim=self.hidden_dim, L=1, name="node_encoder"
        )
        h, edge_index, edge_mask = DynamicEdgeConv(
            mlp=node_encoder, k=self.k, aggr="add", name="edge_conv"
        )(x, node_mask=node_mask, batch=batch)
        h = nn.relu(h)
        edge_attr = jnp.concatenate([h[edge_index[0]], h[edge_index[1]]], axis=1)
        edge_attr = nn.relu(
            MLP(
                output_size=self.e_dim,
                hidden_dim=self.hidden_dim,
                L=1,
                name="edge_encoder",
            )(edge_attr)
        )
        for i in range(self.L):
            delta_h, edge_attr = InteractionNetwork(
                node_outdim=self.h_dim,
                edge_outdim=self.e_dim,
                node_hidden_dim=self.hidden_dim,
                edge_hidden_dim=self.hidden_dim,
                name=f"in_{i}",
            )(h, edge_index, edge_attr, edge_mask)
            h = self.alpha * h + (1 - self.alpha) * delta_h
        return h


class PointCloudTCN(nn.Module):
    """Point-cloud-direct track condensation (no pre-built graph;
    reference ``tcn.py:69-115``)."""

    node_indim: int
    h_dim: int = 10
    e_dim: int = 10
    h_outdim: int = 5
    hidden_dim: int = 100
    N_blocks: int = 3
    L: int = 3

    @nn.compact
    def __call__(self, data: EventGraph, exchange=None) -> dict[str, jax.Array | None]:
        h = data.x
        h = INConvBlock(
            indim=self.node_indim,
            h_dim=self.h_dim,
            e_dim=self.e_dim,
            L=self.L,
            k=self.N_blocks,
            hidden_dim=self.hidden_dim,
            name="block_0",
        )(h, node_mask=data.node_mask, batch=data.batch)
        for i in range(self.N_blocks):
            h = INConvBlock(
                indim=self.h_dim,
                h_dim=self.h_dim,
                e_dim=self.e_dim,
                L=self.L,
                k=max(self.N_blocks - i, 1),
                hidden_dim=self.hidden_dim,
                name=f"block_{i + 1}",
            )(h, node_mask=data.node_mask, batch=data.batch)
        beta = nn.sigmoid(
            MLP(output_size=1, hidden_dim=self.hidden_dim, L=3, name="B")(h)
        ).squeeze(-1) + 1e-11
        h_out = MLP(output_size=self.h_outdim, hidden_dim=self.hidden_dim, L=3, name="X")(h)
        return {"W": None, "H": h_out, "B": beta, "P": None}


class ModularGraphTCN(nn.Module):
    """Modular track condensation network (reference ``tcn.py:118-308``).

    Combines an optional edge classifier, node/edge encoders, a condensation
    interaction-network stack, and beta / cluster-coordinate heads.

    Output dict (full padded shapes): ``W`` edge weights, ``H`` clustering
    coordinates, ``B`` condensation likelihood, ``ec_hit_mask`` /
    ``ec_edge_mask`` validity masks after the EC cut.
    """

    hc_in: nn.Module
    ec: Optional[nn.Module] = None
    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    feed_edge_weights: bool = False
    ec_threshold: float = 0.5
    mask_orphan_nodes: bool = False
    use_ec_embeddings_for_hc: bool = False
    alpha_latent: float = 0.0
    n_embedding_coords: int = 0
    heterogeneous_node_encoder: bool = False

    @nn.compact
    def __call__(
        self, data: EventGraph, exchange=None
    ) -> dict[str, jax.Array | None]:
        """``exchange``: graph-parallel halo hook (see ``ResIN.__call__``).
        With it, this one module IS the sharded model — every config (hetero
        encoder, skip2, EC variants, feed_edge_weights) trains under
        ``shard_map`` with no parallel fork of the network body."""
        edge_weights = None
        ec_edge_mask = data.edge_mask
        hit_mask = data.node_mask
        ec_node_embedding = None
        ec_edge_embedding = None

        if self.ec is not None:
            ec_result = (
                self.ec(data) if exchange is None else self.ec(data, exchange=exchange)
            )
            edge_weights = ec_result["W"]
            ec_node_embedding = ec_result.get("node_embedding")
            ec_edge_embedding = ec_result.get("edge_embedding")
            # EC cut as masking (reference: data.edge_subgraph, tcn.py:252)
            ec_edge_mask = data.edge_mask & (edge_weights > self.ec_threshold)
            if self.mask_orphan_nodes:
                # Orphans: nodes with no surviving edges (reference tcn.py:254-262)
                deg = node_degrees(data.edge_index, data.num_nodes, ec_edge_mask)
                hit_mask = data.node_mask & (deg > 0)

        _xs = [data.x]
        _edge_attrs = [data.edge_attr]
        if self.use_ec_embeddings_for_hc:
            assert ec_node_embedding is not None
            assert ec_edge_embedding is not None
            _xs.append(ec_node_embedding)
            _edge_attrs.append(ec_edge_embedding)
        if self.feed_edge_weights:
            if self.ec is None:
                # baked EC scores from a data transformer (reference tcn.py:264-265)
                _edge_attrs.append(data.extras["ec_score"].reshape(-1, 1))
            else:
                _edge_attrs.append(edge_weights.reshape(-1, 1))
        x = jnp.concatenate(_xs, axis=1)
        edge_attrs = jnp.concatenate(_edge_attrs, axis=1)

        if not self.heterogeneous_node_encoder:
            # depth=1 (≡ L=2), alpha=0 for backwards compat (reference tcn.py:197-208)
            h_hc = ResFCNN(
                out_dim=self.h_dim,
                hidden_dim=self.hidden_dim,
                depth=1,
                bias=False,
                alpha=0.0,
                name="hc_node_encoder",
            )(x)
        else:
            h_hc = HeterogeneousResFCNN(
                out_dim=self.h_dim,
                hidden_dim=self.hidden_dim,
                depth=2,
                bias=False,
                alpha=0.0,
                name="hc_node_encoder",
            )(x, layer=data.layer)
        h_hc = nn.relu(h_hc)
        edge_attr_hc = nn.relu(
            MLP(
                output_size=self.e_dim,
                hidden_dim=self.hidden_dim,
                L=2,
                bias=False,
                name="hc_edge_encoder",
            )(edge_attrs)
        )

        # Track condenser runs under the post-EC edge mask.
        h_hc, _, _ = self.hc_in(
            h_hc, data.edge_index, edge_attr_hc, ec_edge_mask,
            node_mask=hit_mask, extras=data.extras, exchange=exchange,
        )

        beta = nn.sigmoid(MLP(output_size=1, hidden_dim=self.hidden_dim, L=3, name="p_beta")(h_hc))
        # Soft clipping against NaN in arctanh(beta) (reference tcn.py:287-288)
        epsilon = 1e-6
        beta = epsilon + (1 - 2 * epsilon) * beta

        h = MLP(output_size=self.h_outdim, hidden_dim=self.hidden_dim, L=3, name="p_cluster")(h_hc)
        if self.alpha_latent:
            nec = self.n_embedding_coords
            assert nec > 0
            assert nec <= h.shape[1]
            residual = jnp.pad(data.x[:, :nec], ((0, 0), (0, h.shape[1] - nec)))
            h = math.sqrt(self.alpha_latent) * residual + math.sqrt(1 - self.alpha_latent) * h
        latent_normalization = self.param(
            "latent_normalization", lambda k, s: jnp.ones(s), (1,)
        )
        h = h * latent_normalization
        return {
            "W": edge_weights,
            "H": h,
            "B": beta.squeeze(-1),
            "ec_hit_mask": hit_mask,
            "ec_edge_mask": ec_edge_mask,
        }


class GraphTCN(nn.Module):
    """ModularGraphTCN with a fresh ``ECForGraphTCN`` (reference ``tcn.py:311-386``)."""

    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    L_ec: int = 3
    L_hc: int = 3
    alpha_ec: float = 0.5
    alpha_hc: float = 0.5
    ec_threshold: float = 0.5
    mask_orphan_nodes: bool = False
    use_ec_embeddings_for_hc: bool = False
    feed_edge_weights: bool = False
    #: promise that edge_index[1] is non-decreasing (cheaper scatter)
    sorted_edges: bool = False
    #: split the relational MLP first linear into node-level projections
    split_relational: bool = False
    #: IN aggregation implementation: "xla", "pallas_sorted", or "fused"
    #: ("fused" = single-kernel slab pipeline; needs apply_slab_layout data)
    segment_impl: str = "xla"
    #: slab-layout statics + compute dtype for segment_impl="fused"
    fused_window: int = 1024
    fused_block: int = 512
    fused_dtype: str = "bfloat16"
    #: static local/halo edge boundary for compute/comm overlap under an
    #: exchange hook (``ShardedGraph.e_split``); 0 = off
    halo_edge_split: int = 0
    #: rematerialize each IN layer's activations in the backward pass —
    #: trades ~1 extra forward of FLOPs for O(L) less activation HBM;
    #: required for full-detector events (~2M edges) on a 16 GB chip
    remat: bool = False

    @nn.compact
    def __call__(self, data: EventGraph, exchange=None) -> dict[str, jax.Array | None]:
        ec = ECForGraphTCN(
            interaction_node_dim=self.h_dim,
            interaction_edge_dim=self.e_dim,
            hidden_dim=self.hidden_dim,
            L_ec=self.L_ec,
            alpha=self.alpha_ec,
            sorted_edges=self.sorted_edges,
            split_relational=self.split_relational,
            segment_impl=self.segment_impl,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            halo_edge_split=self.halo_edge_split,
            remat=self.remat,
            name="ec",
        )
        hc_in = ResIN(
            node_dim=self.h_dim,
            edge_dim=self.e_dim,
            object_hidden_dim=self.hidden_dim,
            relational_hidden_dim=self.hidden_dim,
            alpha=self.alpha_hc,
            n_layers=self.L_hc,
            sorted_edges=self.sorted_edges,
            split_relational=self.split_relational,
            segment_impl=self.segment_impl,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            halo_edge_split=self.halo_edge_split,
            remat=self.remat,
            name="hc_in",
        )
        return ModularGraphTCN(
            ec=ec,
            hc_in=hc_in,
            h_dim=self.h_dim,
            e_dim=self.e_dim,
            h_outdim=self.h_outdim,
            hidden_dim=self.hidden_dim,
            ec_threshold=self.ec_threshold,
            mask_orphan_nodes=self.mask_orphan_nodes,
            use_ec_embeddings_for_hc=self.use_ec_embeddings_for_hc,
            feed_edge_weights=self.feed_edge_weights,
            name="gtcn",
        )(data, exchange=exchange)


class PerfectECGraphTCN(nn.Module):
    """ModularGraphTCN with a truth-based EC (reference ``tcn.py:389-454``)."""

    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    L_hc: int = 3
    alpha_hc: float = 0.5
    ec_tpr: float = 1.0
    ec_tnr: float = 1.0
    ec_threshold: float = 0.5
    mask_orphan_nodes: bool = False
    feed_edge_weights: bool = False
    #: promise that edge_index[1] is non-decreasing (cheaper scatter)
    sorted_edges: bool = False
    #: IN aggregation implementation: "xla", "pallas_sorted", or "fused"
    #: ("fused" = single-kernel slab pipeline; needs apply_slab_layout data)
    segment_impl: str = "xla"
    #: slab-layout statics + compute dtype for segment_impl="fused"
    fused_window: int = 1024
    fused_block: int = 512
    fused_dtype: str = "bfloat16"
    #: static local/halo edge boundary for compute/comm overlap under an
    #: exchange hook (``ShardedGraph.e_split``); 0 = off
    halo_edge_split: int = 0
    residual_type: str = "skip1"
    #: for skip2: reproduce the reference's overlapping blocks (resin.py:157)
    compat_overlap: bool = False

    @nn.compact
    def __call__(self, data: EventGraph, exchange=None) -> dict[str, jax.Array | None]:
        ec = PerfectEdgeClassification(tpr=self.ec_tpr, tnr=self.ec_tnr, name="ec")
        hc_in = ResIN(
            node_dim=self.h_dim,
            edge_dim=self.e_dim,
            object_hidden_dim=self.hidden_dim,
            relational_hidden_dim=self.hidden_dim,
            alpha=self.alpha_hc,
            n_layers=self.L_hc,
            sorted_edges=self.sorted_edges,
            segment_impl=self.segment_impl,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            halo_edge_split=self.halo_edge_split,
            residual_type=self.residual_type,
            compat_overlap=self.compat_overlap,
            name="hc_in",
        )
        return ModularGraphTCN(
            ec=ec,
            hc_in=hc_in,
            h_dim=self.h_dim,
            e_dim=self.e_dim,
            h_outdim=self.h_outdim,
            hidden_dim=self.hidden_dim,
            ec_threshold=self.ec_threshold,
            mask_orphan_nodes=self.mask_orphan_nodes,
            feed_edge_weights=self.feed_edge_weights,
            name="gtcn",
        )(data, exchange=exchange)


class GraphTCNForMLGCPipeline(nn.Module):
    """ModularGraphTCN without EC, for the metric-learning graph-construction
    pipeline (reference ``tcn.py:522-580``)."""

    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    L_hc: int = 3
    alpha_hc: float = 0.5
    alpha_latent: float = 0.0
    n_embedding_coords: int = 0
    feed_edge_weights: bool = False
    heterogeneous_node_encoder: bool = False
    #: promise that edge_index[1] is non-decreasing (cheaper scatter)
    sorted_edges: bool = False
    #: split the relational MLP first linear into node-level projections
    split_relational: bool = False
    #: IN aggregation implementation: "xla", "pallas_sorted", or "fused"
    #: ("fused" = single-kernel slab pipeline; needs apply_slab_layout data)
    segment_impl: str = "xla"
    #: slab-layout statics + compute dtype for segment_impl="fused"
    fused_window: int = 1024
    fused_block: int = 512
    fused_dtype: str = "bfloat16"
    #: static local/halo edge boundary for compute/comm overlap under an
    #: exchange hook (``ShardedGraph.e_split``); 0 = off
    halo_edge_split: int = 0
    residual_type: str = "skip1"
    #: for skip2: reproduce the reference's overlapping blocks (resin.py:157)
    compat_overlap: bool = False

    @nn.compact
    def __call__(self, data: EventGraph, exchange=None) -> dict[str, jax.Array | None]:
        hc_in = ResIN(
            node_dim=self.h_dim,
            edge_dim=self.e_dim,
            object_hidden_dim=self.hidden_dim,
            relational_hidden_dim=self.hidden_dim,
            alpha=self.alpha_hc,
            n_layers=self.L_hc,
            sorted_edges=self.sorted_edges,
            split_relational=self.split_relational,
            segment_impl=self.segment_impl,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            halo_edge_split=self.halo_edge_split,
            residual_type=self.residual_type,
            compat_overlap=self.compat_overlap,
            name="hc_in",
        )
        return ModularGraphTCN(
            ec=None,
            hc_in=hc_in,
            h_dim=self.h_dim,
            e_dim=self.e_dim,
            h_outdim=self.h_outdim,
            hidden_dim=self.hidden_dim,
            alpha_latent=self.alpha_latent,
            n_embedding_coords=self.n_embedding_coords,
            feed_edge_weights=self.feed_edge_weights,
            heterogeneous_node_encoder=self.heterogeneous_node_encoder,
            name="gtcn",
        )(data, exchange=exchange)


class PreTrainedECGraphTCN(nn.Module):
    """ModularGraphTCN around a pre-trained (frozen) EC
    (reference ``tcn.py:457-519``). The EC module is passed in; freezing is
    done at the optimizer level (see ``training.freeze``)."""

    ec: nn.Module
    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    L_hc: int = 3
    alpha_hc: float = 0.5
    ec_threshold: float = 0.5
    mask_orphan_nodes: bool = False
    use_ec_embeddings_for_hc: bool = False
    feed_edge_weights: bool = False
    #: promise that edge_index[1] is non-decreasing (cheaper scatter)
    sorted_edges: bool = False
    #: IN aggregation implementation: "xla", "pallas_sorted", or "fused"
    #: ("fused" = single-kernel slab pipeline; needs apply_slab_layout data)
    segment_impl: str = "xla"
    #: slab-layout statics + compute dtype for segment_impl="fused"
    fused_window: int = 1024
    fused_block: int = 512
    fused_dtype: str = "bfloat16"
    #: static local/halo edge boundary for compute/comm overlap under an
    #: exchange hook (``ShardedGraph.e_split``); 0 = off
    halo_edge_split: int = 0
    residual_type: str = "skip1"
    #: for skip2: reproduce the reference's overlapping blocks (resin.py:157)
    compat_overlap: bool = False

    @nn.compact
    def __call__(self, data: EventGraph, exchange=None) -> dict[str, jax.Array | None]:
        hc_in = ResIN(
            node_dim=self.h_dim,
            edge_dim=self.e_dim,
            object_hidden_dim=self.hidden_dim,
            relational_hidden_dim=self.hidden_dim,
            alpha=self.alpha_hc,
            n_layers=self.L_hc,
            sorted_edges=self.sorted_edges,
            segment_impl=self.segment_impl,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            halo_edge_split=self.halo_edge_split,
            residual_type=self.residual_type,
            compat_overlap=self.compat_overlap,
            name="hc_in",
        )
        return ModularGraphTCN(
            ec=self.ec,
            hc_in=hc_in,
            h_dim=self.h_dim,
            e_dim=self.e_dim,
            h_outdim=self.h_outdim,
            hidden_dim=self.hidden_dim,
            ec_threshold=self.ec_threshold,
            mask_orphan_nodes=self.mask_orphan_nodes,
            use_ec_embeddings_for_hc=self.use_ec_embeddings_for_hc,
            feed_edge_weights=self.feed_edge_weights,
            name="gtcn",
        )(data, exchange=exchange)
