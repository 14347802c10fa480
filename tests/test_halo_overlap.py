"""Compute/communication-overlap halo split: exactness vs single device.

``partition_event(halo_edges_last=True)`` gives every shard a static
``[local-source | halo-source]`` edge layout; with
``halo_edge_split=sg.e_split`` each interaction layer computes the local
block's messages independently of the halo collective (XLA can overlap
them). Results must be bit-compatible with the unsharded model.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCN,
    GraphTCNForMLGCPipeline,
)
from gnn_tracking_tpu.parallel.halo import (
    partition_event,
    ring_halo_distance,
    unpartition_nodes,
)
from gnn_tracking_tpu.parallel.sharded_model import (
    ShardedGraphTCNTrainer,
    ShardedTCTrainer,
)

from .test_models import make_graph

N_SHARDS = 4
K = 16


def test_partition_halo_edges_last_layout():
    g = make_graph(2)
    sg = partition_event(g, N_SHARDS, halo_edges_last=True)
    assert sg.e_split > 0
    ei = np.asarray(sg.edge_index)
    em = np.asarray(sg.edge_mask)
    n_loc = sg.n_local
    # every valid edge before the boundary has a local source
    for s in range(N_SHARDS):
        head = em[s, : sg.e_split]
        assert (ei[s, 0, : sg.e_split][head] < n_loc).all()
    # the full edge set is preserved
    eg = np.asarray(sg.edge_global)[em]
    assert sorted(eg.tolist()) == sorted(
        np.nonzero(np.asarray(g.edge_mask))[0].tolist()
    )


@pytest.mark.parametrize("halo_impl", ["a2a", "ring"])
def test_overlap_split_matches_single_device(halo_impl):
    g = make_graph(2)
    h_dim, e_dim, h_outdim, hidden, L_hc = 6, 6, 3, 16, 2
    ref_model = GraphTCNForMLGCPipeline(
        h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden,
        L_hc=L_hc,
    )
    variables = ref_model.init(jax.random.PRNGKey(5), g)
    out_ref = ref_model.apply(variables, g)

    sg = partition_event(g, N_SHARDS, halo_edges_last=True)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedTCTrainer(
        mesh,
        model=GraphTCNForMLGCPipeline(
            h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden,
            L_hc=L_hc, halo_edge_split=sg.e_split,
        ),
        max_n_objects=K,
        halo_impl=halo_impl,
        ring_max_dist=ring_halo_distance(sg),
    )
    trainer.params = {"model": variables["params"]}
    h_shards, _ = trainer.forward(sg)
    h_global = np.asarray(unpartition_nodes(h_shards, sg, g.num_nodes))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        h_global[nm], np.asarray(out_ref["H"])[nm], rtol=1e-6, atol=1e-7
    )


def test_overlap_split_graphtcn_with_ec():
    """EC + HC stacks both run the split path (EC cut mask included)."""
    g = make_graph(3)
    kw = dict(h_dim=6, e_dim=5, h_outdim=3, hidden_dim=16, L_ec=2, L_hc=2,
              ec_threshold=0.35)
    ref_model = GraphTCN(**kw)
    variables = ref_model.init(jax.random.PRNGKey(7), g)
    out_ref = ref_model.apply(variables, g)

    sg = partition_event(g, N_SHARDS, halo_edges_last=True)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedGraphTCNTrainer(
        mesh,
        model=GraphTCN(**kw, halo_edge_split=sg.e_split),
        max_n_objects=K,
    )
    trainer.params = {"model": variables["params"]}
    h_shards, beta_shards, w_shards, em_shards = trainer.forward(sg)
    h_global = np.asarray(unpartition_nodes(h_shards, sg, g.num_nodes))
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        h_global[nm], np.asarray(out_ref["H"])[nm], rtol=1e-6, atol=1e-7
    )
