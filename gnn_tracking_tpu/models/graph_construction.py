"""Metric-learning embeddings and learned graph construction
(capability parity: reference ``models/graph_construction.py``).

``MLGraphConstruction`` is the full learned pipeline: embed hits → build a
fixed-degree kNN graph in embedding space (our TPU kernel replaces
torch_cluster) → label edges with truth → optional edge features / edge
filter / false-edge subsampling. Where the reference reshapes the graph, we
emit a fixed-size padded ``EventGraph`` with masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.mlp import MLP, HeterogeneousResFCNN, ResFCNN
from gnn_tracking_tpu.models.resin import ResIN
from gnn_tracking_tpu.ops.knn import knn_with_max_radius


class _LatentNormalization(nn.Module):
    """Learnable scalar scale on the latent space (reference
    ``graph_construction.py:46-48``)."""

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        scale = self.param("latent_normalization", lambda k, s: jnp.ones(s), (1,))
        return h * scale


class GraphConstructionFCNN(nn.Module):
    """ResFCNN embedding with learnable latent normalization
    (reference ``graph_construction.py:25-53``)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    depth: int
    alpha: float = 0.6

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        assert data.x.shape[-1] == self.in_dim
        h = ResFCNN(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            depth=self.depth,
            alpha=self.alpha,
            bias=False,
            name="fcnn",
        )(data.x)
        return {"H": _LatentNormalization(name="latent_norm")(h)}


class GraphConstructionHeteroResFCNN(nn.Module):
    """Heterogeneous (pixel/strip) embedding
    (reference ``graph_construction.py:56-85``)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    depth: int
    alpha: float = 0.6

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        h = HeterogeneousResFCNN(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            depth=self.depth,
            alpha=self.alpha,
            bias=False,
            name="fcnn",
        )(data.x, layer=data.layer)
        return {"H": _LatentNormalization(name="latent_norm")(h)}


class GraphConstructionHeteroEncResFCNN(nn.Module):
    """Heterogeneous encoder → shared ResFCNN
    (reference ``graph_construction.py:88-133``)."""

    in_dim: int
    hidden_dim_enc: int
    hidden_dim: int
    out_dim: int
    depth_enc: int
    depth: int
    alpha: float = 0.6

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        assert data.x.shape[-1] == self.in_dim
        enc = nn.relu(
            HeterogeneousResFCNN(
                out_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim_enc,
                depth=self.depth_enc,
                alpha=self.alpha,
                bias=False,
                name="encoder",
            )(data.x, layer=data.layer)
        )
        h = ResFCNN(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            depth=self.depth,
            alpha=self.alpha,
            bias=False,
            name="fcnn",
        )(enc)
        return {"H": _LatentNormalization(name="latent_norm")(h)}


class GraphConstructionResIN(nn.Module):
    """Graph-construction refinement: interaction-network stack over the
    FCNN latent space with a residual back to the first ``h_outdim`` input
    coordinates (reference ``graph_construction.py:136-219``)."""

    node_indim: int
    edge_indim: int
    h_outdim: int = 8
    hidden_dim: int = 40
    alpha: float = 0.5
    n_layers: int = 1
    alpha_fcnn: float = 0.5

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        assert data.x.shape[-1] == self.node_indim
        assert data.edge_attr.shape[-1] == self.edge_indim
        x_fcnn = data.x[:, : self.h_outdim]
        x = MLP(
            output_size=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            L=2,
            bias=False,
            name="node_encoder",
        )(data.x)
        edge_attr = MLP(
            output_size=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            L=2,
            bias=False,
            name="edge_encoder",
        )(data.edge_attr)
        x, _, _ = ResIN(
            node_dim=self.hidden_dim,
            edge_dim=self.hidden_dim,
            object_hidden_dim=self.hidden_dim,
            relational_hidden_dim=self.hidden_dim,
            n_layers=self.n_layers,
            alpha=self.alpha,
            name="resin",
        )(x, data.edge_index, edge_attr, data.edge_mask)
        delta = MLP(
            output_size=self.h_outdim,
            hidden_dim=self.hidden_dim,
            L=2,
            bias=False,
            name="decoder",
        )(x)
        h = self.alpha_fcnn * x_fcnn + (1 - self.alpha_fcnn) * delta
        return {"H": _LatentNormalization(name="latent_norm")(h)}


class MLGraphConstruction(nn.Module):
    """Learned graph construction: embed → kNN(+radius) → truth labels →
    optional edge features / edge-filter cut / false-edge subsampling
    (reference ``graph_construction.py:240-413``).

    Emits a fixed-size padded ``EventGraph`` with ``E = N * max_num_neighbors``
    edge slots; cuts and subsampling update ``edge_mask`` instead of
    reshaping. ``true_edge_index`` is preserved for the losses.
    """

    ml: Optional[nn.Module] = None
    ef: Optional[nn.Module] = None
    max_radius: float = 1.0
    max_num_neighbors: int = 256
    use_embedding_features: bool = False
    ratio_of_false: float | None = None
    build_edge_features: bool = True
    ec_threshold: float | None = None
    embedding_slice: tuple[int | None, int | None] = (None, None)

    def setup(self):
        if self.ef is not None and self.ec_threshold is None:
            msg = "ec_threshold must be set if ec/ef is not None"
            raise ValueError(msg)
        if self.ml is None and self.use_embedding_features:
            msg = "use_embedding_features requires ml to be not None"
            raise ValueError(msg)
        if self.ml is not None and self.embedding_slice != (None, None):
            msg = "embedding_slice requires ml to be None"
            raise ValueError(msg)

    def __call__(self, data: EventGraph, *, training: bool = False) -> EventGraph:
        if self.ml is not None:
            embedding = self.ml(data)["H"]
        else:
            s = self.embedding_slice
            embedding = data.x[:, s[0] : s[1]]

        edge_index, edge_mask = knn_with_max_radius(
            embedding,
            k=min(self.max_num_neighbors, data.num_nodes - 1),
            max_radius=self.max_radius,
            node_mask=data.node_mask,
            batch=data.batch,
        )
        pid = data.particle_id
        y = (pid[edge_index[0]] == pid[edge_index[1]]) & (pid[edge_index[0]] > 0)
        y = y & edge_mask

        if self.ml is not None and self.use_embedding_features:
            x = jnp.concatenate([embedding, data.x], axis=1)
        else:
            x = data.x

        if self.ratio_of_false and training:
            # Keep only the first num_true * ratio false edges (by edge slot
            # order — reference graph_construction.py:373-384) via masking.
            num_true = y.sum()
            false_mask = edge_mask & ~y
            false_rank = jnp.cumsum(false_mask.astype(jnp.int32)) - 1
            keep_false = false_rank < (num_true * self.ratio_of_false).astype(jnp.int32)
            edge_mask = edge_mask & (y | (false_mask & keep_false))

        edge_attr = data.edge_attr
        if self.build_edge_features:
            edge_attr = jnp.concatenate(
                [
                    x[edge_index[0]] - x[edge_index[1]],
                    x[edge_index[0]] + x[edge_index[1]],
                ],
                axis=1,
            )

        out = EventGraph(
            x=x,
            particle_id=data.particle_id,
            pt=data.pt,
            eta=data.eta,
            reconstructable=data.reconstructable,
            node_mask=data.node_mask,
            layer=data.layer,
            sector=data.sector,
            batch=data.batch,
            edge_index=edge_index,
            edge_attr=edge_attr,
            y=y,
            edge_mask=edge_mask,
            true_edge_index=data.true_edge_index,
            true_edge_mask=data.true_edge_mask,
            extras=dict(data.extras),
        )
        if self.ef is not None:
            w = self.ef(out)["W"]
            out = out.mask_edges(w > self.ec_threshold)
        return out


class MLPCTransformer(nn.Module):
    """Replace (or augment) point-cloud features with the ML latent space
    without building a graph (reference ``graph_construction.py:422-481``)."""

    model: nn.Module
    original_features: bool = False

    @nn.compact
    def __call__(self, data: EventGraph) -> EventGraph:
        out = self.model(data)
        if self.original_features:
            x = jnp.concatenate([out["H"], data.x], axis=1)
        else:
            x = out["H"]
        return data.replace(x=x)
