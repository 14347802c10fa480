"""ShardedTCTrainer: full-detector TC training over the graph axis — loss
decreases and the forward unpartitions consistently."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gnn_tracking_tpu.parallel.halo import partition_event, unpartition_nodes
from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCNForMLGCPipeline,
)
from gnn_tracking_tpu.parallel.sharded_model import ShardedTCTrainer
from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

from .test_learning import synthetic_event

N_SHARDS = 4
K = 16


@pytest.mark.slow
def test_sharded_tc_trainer_learns():
    g = synthetic_event(0)
    sg = partition_event(g, N_SHARDS)
    cd = partition_condensation(g, sg, max_n_objects=K)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedTCTrainer(
        mesh,
        model=GraphTCNForMLGCPipeline(h_dim=8, e_dim=8, h_outdim=3, hidden_dim=24, L_hc=2),
        max_n_objects=K,
        loss_weights={"attractive": 1.0, "repulsive": 1.0, "coward": 0.5, "noise": 1.0},
        optimizer=__import__("optax").adam(3e-3),
    )
    trainer.init(jax.random.PRNGKey(0), sg)
    losses = [trainer.training_step(sg, cd)["total"] for _ in range(40)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    h, beta = trainer.forward(sg)
    h_global = unpartition_nodes(h, sg, g.num_nodes)
    assert h_global.shape == (g.num_nodes, 3)
    assert np.isfinite(np.asarray(h_global)).all()
    b = np.asarray(beta)[np.asarray(sg.node_mask)]
    assert (b > 0).all() and (b < 1).all()


def test_sharded_body_matches_single_device_tcn():
    """The SAME GraphTCNForMLGCPipeline module with the SAME parameter tree
    (under the adapter's ``model/`` prefix) reproduces single-device outputs
    exactly when run sharded — no renaming, no parallel model fork."""
    from tests.test_models import make_graph

    g = make_graph(2)
    h_dim, e_dim, h_outdim, hidden, L_hc = 6, 6, 3, 16, 2
    ref_model = GraphTCNForMLGCPipeline(
        h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden, L_hc=L_hc
    )
    variables = ref_model.init(jax.random.PRNGKey(5), g)
    out_ref = ref_model.apply(variables, g)

    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedTCTrainer(
        mesh,
        model=GraphTCNForMLGCPipeline(
            h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden, L_hc=L_hc
        ),
        max_n_objects=K,
    )
    trainer.params = {"model": variables["params"]}
    h_shards, beta_shards = trainer.forward(sg)
    h_global = np.asarray(unpartition_nodes(h_shards, sg, g.num_nodes))
    beta_global = np.asarray(unpartition_nodes(beta_shards, sg, g.num_nodes))

    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        h_global[nm], np.asarray(out_ref["H"])[nm], rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        beta_global[nm], np.asarray(out_ref["B"])[nm], rtol=1e-6, atol=1e-10
    )


def test_sharded_graphtcn_matches_single_device():
    """ShardedGraphTCN (EC + condensation, halo exchange) with transplanted
    parameters reproduces the unsharded GraphTCN exactly: H, B, W, and the
    EC edge cut."""
    import jax.numpy as jnp

    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.halo import unpartition_edges
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_model import ShardedGraphTCNTrainer
    from tests.test_models import make_graph

    g = make_graph(3)
    h_dim, e_dim, h_outdim, hidden, L_ec, L_hc = 6, 5, 3, 16, 2, 2
    ref_model = GraphTCN(
        h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden,
        L_ec=L_ec, L_hc=L_hc, ec_threshold=0.35,
    )
    variables = ref_model.init(jax.random.PRNGKey(7), g)
    out_ref = ref_model.apply(variables, g)

    sharded_params = {"model": variables["params"]}

    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedGraphTCNTrainer(
        mesh,
        model=GraphTCN(
            h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden,
            L_ec=L_ec, L_hc=L_hc, ec_threshold=0.35,
        ),
        max_n_objects=K,
    )
    trainer.params = sharded_params
    h_shards, beta_shards, w_shards, em_shards = trainer.forward(sg)
    h_global = np.asarray(unpartition_nodes(h_shards, sg, g.num_nodes))
    beta_global = np.asarray(unpartition_nodes(beta_shards, sg, g.num_nodes))
    w_global = np.asarray(unpartition_edges(w_shards, sg, g.num_edges))
    em_global = np.asarray(
        unpartition_edges(em_shards.astype(jnp.int32), sg, g.num_edges)
    ).astype(bool)

    nm = np.asarray(g.node_mask)
    em = np.asarray(g.edge_mask)
    np.testing.assert_allclose(
        h_global[nm], np.asarray(out_ref["H"])[nm], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        beta_global[nm], np.asarray(out_ref["B"])[nm], rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        w_global[em], np.asarray(out_ref["W"])[em], rtol=1e-6, atol=1e-10
    )
    np.testing.assert_array_equal(
        em_global[em], np.asarray(out_ref["ec_edge_mask"])[em]
    )


@pytest.mark.slow
def test_sharded_graphtcn_trainer_learns():
    """Full sharded GraphTCN training: condensation + EC losses all decrease."""
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_model import ShardedGraphTCNTrainer

    g = synthetic_event(1)
    sg = partition_event(g, N_SHARDS)
    cd = partition_condensation(g, sg, max_n_objects=K)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = ShardedGraphTCNTrainer(
        mesh,
        model=GraphTCN(
            h_dim=8, e_dim=6, h_outdim=3, hidden_dim=24, L_ec=2, L_hc=2
        ),
        max_n_objects=K,
        loss_weights={
            "attractive": 1.0, "repulsive": 1.0, "coward": 0.5,
            "noise": 1.0, "edge": 1.0,
        },
        optimizer=__import__("optax").adam(3e-3),
    )
    trainer.init(jax.random.PRNGKey(0), sg)
    history = [trainer.training_step(sg, cd) for _ in range(40)]
    totals = [h["total"] for h in history]
    edges = [h["edge"] for h in history]
    assert np.isfinite(totals).all()
    assert totals[-1] < totals[0]
    assert edges[-1] < edges[0]


def test_sharded_graphtcn_sorted_edges_matches_unsorted():
    """``partition_event(sort_edges=True)`` + the models' ``sorted_edges``
    promise must not change any output (order-independent comparison via
    unpartition with identical transplanted parameters)."""
    from gnn_tracking_tpu.parallel.halo import unpartition_edges
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_model import ShardedGraphTCNTrainer
    from tests.test_models import make_graph

    g = make_graph(4)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    results = {}
    params = None
    for sort in (False, True):
        sg = partition_event(g, N_SHARDS, sort_edges=sort)
        if sort:
            dsts = np.asarray(sg.edge_index)[:, 1]
            assert all((np.diff(d) >= 0).all() for d in dsts)
        trainer = ShardedGraphTCNTrainer(
            mesh,
            model=GraphTCN(
                h_dim=5, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2,
                sorted_edges=sort,
            ),
            max_n_objects=K,
        )
        if params is None:
            trainer.init(jax.random.PRNGKey(3), sg)
            params = trainer.params
        else:
            trainer.params = params
        h, beta, w, em = trainer.forward(sg)
        results[sort] = {
            "h": np.asarray(unpartition_nodes(h, sg, g.num_nodes)),
            "w": np.asarray(unpartition_edges(w, sg, g.num_edges)),
        }
    nm = np.asarray(g.node_mask)
    emask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(
        results[True]["h"][nm], results[False]["h"][nm], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results[True]["w"][emask], results[False]["w"][emask], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize(
    "variant",
    ["skip2", "hetero", "feed_ec"],
)
def test_sharded_config_variants_match_single_device(variant):
    """Every TCN config trains sharded from the one module tree (VERDICT #4):
    skip2 residuals, heterogeneous node encoder, feed_edge_weights +
    use_ec_embeddings_for_hc — exact parity with transplanted (prefix-only)
    parameters."""
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_model import ShardedGraphTCNTrainer
    from tests.test_models import make_graph

    g = make_graph(11)
    common = dict(h_dim=6, e_dim=5, h_outdim=3, hidden_dim=16)
    if variant == "skip2":
        model = GraphTCNForMLGCPipeline(
            **common, L_hc=2, residual_type="skip2"
        )
        trainer_cls, keys = ShardedTCTrainer, ("H", "B")
    elif variant == "hetero":
        model = GraphTCNForMLGCPipeline(
            **common, L_hc=2, heterogeneous_node_encoder=True
        )
        trainer_cls, keys = ShardedTCTrainer, ("H", "B")
    else:
        model = GraphTCN(
            **common, L_ec=2, L_hc=2,
            feed_edge_weights=True, use_ec_embeddings_for_hc=True,
        )
        trainer_cls, keys = ShardedGraphTCNTrainer, ("H", "B", "W")

    variables = model.init(jax.random.PRNGKey(13), g)
    out_ref = model.apply(variables, g)

    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    trainer = trainer_cls(mesh, model=model, max_n_objects=K)
    trainer.params = {"model": variables["params"]}
    outs = trainer.forward(sg)

    nm = np.asarray(g.node_mask)
    h_global = np.asarray(unpartition_nodes(outs[0], sg, g.num_nodes))
    beta_global = np.asarray(unpartition_nodes(outs[1], sg, g.num_nodes))
    np.testing.assert_allclose(
        h_global[nm], np.asarray(out_ref["H"])[nm], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        beta_global[nm], np.asarray(out_ref["B"])[nm], rtol=1e-5, atol=1e-8
    )
    if "W" in keys:
        from gnn_tracking_tpu.parallel.halo import unpartition_edges

        em = np.asarray(g.edge_mask)
        w_global = np.asarray(unpartition_edges(outs[2], sg, g.num_edges))
        np.testing.assert_allclose(
            w_global[em], np.asarray(out_ref["W"])[em], rtol=1e-5, atol=1e-8
        )


def test_sharded_ring_halo_matches_a2a():
    """halo_impl='ring' (neighbor ppermute) gives the same forward as the
    default a2a exchange on a phi-contiguous partition."""
    from gnn_tracking_tpu.parallel.halo import ring_halo_distance

    g = synthetic_event(4)
    sg = partition_event(g, N_SHARDS)
    dist = ring_halo_distance(sg)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    model = GraphTCNForMLGCPipeline(h_dim=6, e_dim=5, h_outdim=3, hidden_dim=16, L_hc=2)
    outs = {}
    params = None
    for impl in ("a2a", "ring"):
        trainer = ShardedTCTrainer(
            mesh, model=model, max_n_objects=K,
            halo_impl=impl, ring_max_dist=max(dist, 1),
        )
        if params is None:
            trainer.init(jax.random.PRNGKey(2), sg)
            params = trainer.params
        else:
            trainer.params = params
        h, beta = trainer.forward(sg)
        outs[impl] = (np.asarray(h), np.asarray(beta))
    np.testing.assert_array_equal(outs["ring"][0], outs["a2a"][0])
    np.testing.assert_array_equal(outs["ring"][1], outs["a2a"][1])
