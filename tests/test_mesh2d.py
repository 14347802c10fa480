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
