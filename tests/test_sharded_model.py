"""ShardedTCTrainer: full-detector TC training over the graph axis — loss
decreases and the forward unpartitions consistently."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gnn_tracking_tpu.parallel.halo import partition_event, unpartition_nodes
from gnn_tracking_tpu.parallel.sharded_model import ShardedTCNBody, ShardedTCTrainer
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
        model=ShardedTCNBody(h_dim=8, e_dim=8, h_outdim=3, hidden_dim=24, L_hc=2),
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
