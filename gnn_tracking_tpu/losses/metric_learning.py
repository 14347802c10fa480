"""Metric-learning (hinge embedding) losses for learned graph construction.

Capability parity: reference ``metrics/losses/metric_learning.py``. The
attractive term pulls hits of the same particle together along true edges;
the repulsive term pushes different-particle hits apart along a radius graph
in the embedding space (our fixed-degree TPU radius graph replaces
torch_cluster's).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from gnn_tracking_tpu.losses import MultiLossFct, MultiLossFctReturn
from gnn_tracking_tpu.ops.knn import radius_graph
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask_tensors

_EPS = 1e-9


@functools.partial(jax.jit, static_argnames=("normalization",))
def _hinge_loss_components(
    *,
    x: jax.Array,
    att_edges: jax.Array,
    att_mask: jax.Array,
    rep_edges: jax.Array,
    rep_mask: jax.Array,
    rep_dists: jax.Array,
    r_emb_hinge: float,
    p_attr: float,
    p_rep: float,
    n_hits_oi: jax.Array,
    normalization: str,
) -> tuple[jax.Array, jax.Array]:
    """Masked version of reference ``metric_learning.py:14-54``."""
    diff = x[att_edges[0]] - x[att_edges[1]]
    d2 = jnp.sum(diff * diff, axis=-1)
    # Safe norm: padded edges are (0, 0) self-pairs with zero distance whose
    # sqrt gradient would be NaN and poison the masked sum.
    safe = att_mask & (d2 > 0)
    d_att = jnp.where(safe, jnp.sqrt(jnp.where(safe, d2, 1.0)), 0.0)
    norm_att = att_mask.sum() + _EPS
    v_att = jnp.sum(jnp.where(att_mask, d_att**p_attr, 0.0)) / norm_att

    if normalization == "n_rep_edges":
        norm_rep = rep_mask.sum() + _EPS
    elif normalization == "n_hits_oi":
        norm_rep = n_hits_oi + _EPS
    elif normalization == "n_att_edges":
        norm_rep = att_mask.sum() + _EPS
    else:
        msg = f"Normalization {normalization} not recognized."
        raise ValueError(msg)
    hinge = jax.nn.relu(r_emb_hinge - rep_dists**p_rep)
    v_rep = jnp.sum(jnp.where(rep_mask, hinge, 0.0)) / norm_rep
    return v_att, v_rep


class GraphConstructionHingeEmbeddingLoss(MultiLossFct):
    """Hinge embedding loss for metric-learning graph construction
    (reference ``metric_learning.py:57-178``)."""

    def __init__(
        self,
        *,
        lw_repulsive: float = 1.0,
        r_emb: float = 1.0,
        max_num_neighbors: int = 256,
        pt_thld: float = 0.9,
        max_eta: float = 4.0,
        p_attr: float = 1.0,
        p_rep: float = 1.0,
        rep_normalization: str = "n_hits_oi",
        rep_oi_only: bool = True,
    ):
        self.lw_repulsive = lw_repulsive
        self.r_emb = r_emb
        self.max_num_neighbors = max_num_neighbors
        self.pt_thld = pt_thld
        self.max_eta = max_eta
        self.p_attr = p_attr
        self.p_rep = p_rep
        self.rep_normalization = rep_normalization
        self.rep_oi_only = rep_oi_only

    def __call__(
        self,
        *,
        x: jax.Array,
        particle_id: jax.Array,
        batch: jax.Array | None = None,
        true_edge_index: jax.Array,
        pt: jax.Array,
        eta: jax.Array,
        reconstructable: jax.Array,
        node_mask: jax.Array | None = None,
        true_edge_mask: jax.Array | None = None,
        **kwargs: Any,
    ) -> MultiLossFctReturn:
        if true_edge_index is None:
            msg = (
                "true_edge_index must be given and not be None. Are you trying "
                "to use this loss for OC training? Double check that you are "
                "properly passing on the true edges."
            )
            raise ValueError(msg)
        mask = get_good_node_mask_tensors(
            pt=pt,
            particle_id=particle_id,
            reconstructable=reconstructable,
            eta=eta,
            pt_thld=self.pt_thld,
            max_eta=self.max_eta,
        )
        if node_mask is not None:
            mask = mask & node_mask
        n_hits_oi = mask.sum()

        # attractive edges: true edges starting at a hit of interest
        att_mask = mask[true_edge_index[0]]
        if true_edge_mask is not None:
            att_mask = att_mask & true_edge_mask

        # repulsive edges: radius-graph neighbors with different particle id
        rep_edges, rep_edge_mask, rep_dists = radius_graph(
            x,
            self.r_emb,
            max_num_neighbors=self.max_num_neighbors,
            node_mask=node_mask,
            batch=batch,
            loop=False,
        )
        if self.rep_oi_only:
            rep_edge_mask = rep_edge_mask & mask[rep_edges[0]]
        rep_edge_mask = rep_edge_mask & (
            particle_id[rep_edges[0]] != particle_id[rep_edges[1]]
        )

        attr, rep = _hinge_loss_components(
            x=x,
            att_edges=true_edge_index,
            att_mask=att_mask,
            rep_edges=rep_edges,
            rep_mask=rep_edge_mask,
            rep_dists=rep_dists,
            r_emb_hinge=self.r_emb,
            p_attr=self.p_attr,
            p_rep=self.p_rep,
            n_hits_oi=n_hits_oi,
            normalization=self.rep_normalization,
        )
        losses = {"attractive": attr, "repulsive": rep}
        weights = {"attractive": 1.0, "repulsive": self.lw_repulsive}
        extra = {
            "n_hits_oi": n_hits_oi,
            "n_edges_att": att_mask.sum(),
            "n_edges_rep": rep_edge_mask.sum(),
        }
        return MultiLossFctReturn(
            loss_dct=losses, weight_dct=weights, extra_metrics=extra
        )


class OldGraphConstructionHingeEmbeddingLoss(MultiLossFct):
    """Legacy hinge embedding loss (reference ``metric_learning.py:206-273``):
    one merged edge set (high-pt true edges ∪ radius graph); attraction over
    true edges, repulsion over non-true edges, both normalized by the number
    of high-pt true edges."""

    def __init__(
        self,
        *,
        r_emb: float = 1.0,
        max_num_neighbors: int = 256,
        attr_pt_thld: float = 0.9,
        p_attr: float = 1.0,
        p_rep: float = 1.0,
        lw_repulsive: float = 1.0,
    ):
        self.r_emb = r_emb
        self.max_num_neighbors = max_num_neighbors
        self.attr_pt_thld = attr_pt_thld
        self.p_attr = p_attr
        self.p_rep = p_rep
        self.lw_repulsive = lw_repulsive

    def __call__(
        self,
        *,
        x: jax.Array,
        particle_id: jax.Array,
        batch: jax.Array | None = None,
        true_edge_index: jax.Array,
        pt: jax.Array,
        node_mask: jax.Array | None = None,
        true_edge_mask: jax.Array | None = None,
        **kwargs: Any,
    ) -> MultiLossFctReturn:
        # merged edge set as concatenation with masks (duplicates between the
        # two sources keep the same loss value up to the reference's unique())
        te_mask = pt[true_edge_index[0]] > self.attr_pt_thld
        if true_edge_mask is not None:
            te_mask = te_mask & true_edge_mask
        near_edges, near_mask, _ = radius_graph(
            x,
            self.r_emb,
            max_num_neighbors=self.max_num_neighbors,
            node_mask=node_mask,
            batch=batch,
            loop=False,
        )
        # reference dedups via torch.unique over ordered pairs
        # (metric_learning.py:239-241): drop radius edges that duplicate a
        # true edge in the same (min, max) orientation — true_edge_index
        # contains every intra-particle (i < j) pair by construction.
        near_pid0 = particle_id[near_edges[0]]
        near_pid1 = particle_id[near_edges[1]]
        dup = (
            (near_pid0 == near_pid1)
            & (near_pid0 > 0)
            & (near_edges[0] < near_edges[1])
            # only high-pt true edges entered the merged set
            & (pt[near_edges[0]] > self.attr_pt_thld)
        )
        near_mask = near_mask & ~dup
        edges = jnp.concatenate([true_edge_index, near_edges], axis=1)
        mask = jnp.concatenate([te_mask, near_mask])

        pid0, pid1 = particle_id[edges[0]], particle_id[edges[1]]
        true_edge = (pid0 == pid1) & (pid0 > 0)
        true_high_pt = true_edge & (pt[edges[0]] > self.attr_pt_thld)
        diff = x[edges[0]] - x[edges[1]]
        d2 = jnp.sum(diff * diff, axis=-1)
        safe = mask & (d2 > 0)
        dists = jnp.where(safe, jnp.sqrt(jnp.where(safe, d2, 1.0)), 0.0)
        normalization = (true_high_pt & mask).sum() + 1e-8
        attr = (
            jnp.sum(jnp.where(true_high_pt & mask, dists**self.p_attr, 0.0))
            / normalization
        )
        hinge = jax.nn.relu(self.r_emb - dists**self.p_rep)
        rep = jnp.sum(jnp.where(~true_edge & mask, hinge, 0.0)) / normalization
        return MultiLossFctReturn(
            loss_dct={"attractive": attr, "repulsive": rep},
            weight_dct={"attractive": 1.0, "repulsive": self.lw_repulsive},
        )
