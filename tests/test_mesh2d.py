"""Two-level (data x graph) mesh training: exactness vs per-event sharded
trainers and learning."""

import jax
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from gnn_tracking_tpu.parallel.halo import partition_event
from gnn_tracking_tpu.parallel.mesh2d import (
    DataGraphTCNTrainer,
    make_data_graph_mesh,
    sharded_buckets,
    stack_sharded,
)
from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
from gnn_tracking_tpu.parallel.sharded_model import (
    ShardedGraphTCNTrainer,
)
from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

from .test_learning import synthetic_event

N_DATA, N_GRAPH, K = 2, 4, 16


def _events_and_tables():
    events = [synthetic_event(s) for s in (0, 1)]
    buckets = sharded_buckets(events, N_GRAPH, sort_edges=True)
    sgs = [
        partition_event(g, N_GRAPH, sort_edges=True, pad_to=buckets)
        for g in events
    ]
    cds = [
        partition_condensation(g, sg, max_n_objects=K)
        for g, sg in zip(events, sgs)
    ]
    return events, sgs, cds


def _model():
    return GraphTCN(
        h_dim=6, e_dim=5, h_outdim=3, hidden_dim=16, L_ec=2, L_hc=2,
        sorted_edges=True,
    )


def test_2d_losses_match_per_event_average():
    """The 2-D step's reported losses must equal the average of the two
    per-event 1-D sharded trainers' losses at identical parameters."""
    events, sgs, cds = _events_and_tables()
    mesh2d = make_data_graph_mesh(N_DATA, N_GRAPH)
    trainer = DataGraphTCNTrainer(
        mesh2d, model=_model(), max_n_objects=K,
        optimizer=optax.sgd(0.0),  # lr 0: inspect losses without moving
    )
    trainer.init(jax.random.PRNGKey(0), stack_sharded(sgs))
    params = jax.tree_util.tree_map(lambda v: np.asarray(v), trainer.params)
    losses_2d = trainer.training_step(stack_sharded(sgs), stack_sharded(cds))

    mesh1d = Mesh(np.asarray(jax.devices()[:N_GRAPH]), ("graph",))
    per_event = []
    for sg, cd in zip(sgs, cds):
        t1 = ShardedGraphTCNTrainer(
            mesh1d, model=_model(), max_n_objects=K, optimizer=optax.sgd(0.0),
            loss_weights=trainer.loss_weights,
        )
        t1.params = jax.tree_util.tree_map(lambda v: v.copy(), params)
        t1.opt_state = t1.tx.init(t1.params)
        per_event.append(t1.training_step(sg, cd))
    for key in losses_2d:
        expected = np.mean([p[key] for p in per_event])
        np.testing.assert_allclose(losses_2d[key], expected, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_2d_trainer_learns():
    events, sgs, cds = _events_and_tables()
    mesh2d = make_data_graph_mesh(N_DATA, N_GRAPH)
    trainer = DataGraphTCNTrainer(
        mesh2d, model=_model(), max_n_objects=K,
        optimizer=optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-3)),
    )
    sgs_s, cds_s = stack_sharded(sgs), stack_sharded(cds)
    trainer.init(jax.random.PRNGKey(0), sgs_s)
    history = [trainer.training_step(sgs_s, cds_s) for _ in range(30)]
    totals = [h["total"] for h in history]
    assert np.isfinite(totals).all()
    assert totals[-1] < totals[0]
    assert history[-1]["edge"] < history[0]["edge"]


def test_2d_forward_matches_1d():
    """2-D forward per event equals the 1-D sharded trainer's forward."""
    events, sgs, cds = _events_and_tables()
    mesh2d = make_data_graph_mesh(N_DATA, N_GRAPH)
    trainer = DataGraphTCNTrainer(mesh2d, model=_model(), max_n_objects=K)
    trainer.init(jax.random.PRNGKey(1), stack_sharded(sgs))
    h2, b2, w2, em2 = trainer.forward(stack_sharded(sgs))

    host_params = jax.tree_util.tree_map(np.asarray, trainer.params)
    mesh1d = Mesh(np.asarray(jax.devices()[:N_GRAPH]), ("graph",))
    for i, sg in enumerate(sgs):
        t1 = ShardedGraphTCNTrainer(mesh1d, model=_model(), max_n_objects=K)
        t1.params = host_params
        h1, b1, w1, em1 = t1.forward(sg)
        np.testing.assert_allclose(
            np.asarray(h2[i]), np.asarray(h1), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(w2[i]), np.asarray(w1), rtol=1e-6, atol=1e-8
        )


def test_single_device_fast_path_matches_shard_map():
    """The 1x1-mesh fast path (no shard_map/halo, identity collectives)
    must produce the same losses and updated params as the general path."""
    import copy

    import jax
    import numpy as np

    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.halo import partition_event
    from gnn_tracking_tpu.parallel.mesh2d import (
        DataGraphTCNTrainer,
        make_data_graph_mesh,
        stack_sharded,
    )
    from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

    from .test_training import make_graph

    g = make_graph(0)
    sg = partition_event(g, 1, sort_edges=True)
    cd = partition_condensation(g, sg, max_n_objects=16, subsample_seed=0)
    sgs, cds = stack_sharded([sg]), stack_sharded([cd])

    mesh = make_data_graph_mesh(1, 1)
    model = GraphTCN(h_dim=8, e_dim=8, h_outdim=4, hidden_dim=16,
                     L_ec=1, L_hc=1, sorted_edges=True)

    t1 = DataGraphTCNTrainer(mesh, model=model, max_n_objects=16)
    t1.init(jax.random.PRNGKey(0), sgs)
    t2 = DataGraphTCNTrainer(mesh, model=model, max_n_objects=16)
    t2.params = copy.deepcopy(t1.params)
    t2.opt_state = t2.tx.init(t2.params)

    # force each path explicitly
    t1._step = t1._build_step_single(sgs)
    t2._step = t2._build_step_sharded(sgs)
    h1 = t1.training_step(sgs, cds)
    h2 = t2.training_step(sgs, cds)
    for k in h2:
        np.testing.assert_allclose(h1[k], h2[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    for p1, p2 in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-4, atol=1e-5)
