"""Data-parallel training tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from gnn_tracking_tpu.losses.oc import CondensationLossTiger
from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
from gnn_tracking_tpu.parallel.dp import DPTrainer, make_dp_train_step, stack_graphs
from gnn_tracking_tpu.parallel.mesh import make_mesh, shard_batch
from gnn_tracking_tpu.training.module import TCModule
from gnn_tracking_tpu.utils.loading import PaddingConfig, TestTrackingDataModule

from .test_training import make_graph

N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(n_data=N_DEV, devices=jax.devices()[:N_DEV])
    padding = PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512)
    graphs = [padding.pad(make_graph(s)) for s in range(2 * N_DEV)]
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
    )
    module.setup_params(graphs[0])
    return mesh, graphs, module


def test_dp_step_runs_and_updates(setup):
    mesh, graphs, module = setup
    batch = shard_batch(stack_graphs(graphs[:N_DEV]), mesh)
    step = make_dp_train_step(module, mesh)
    params0 = jax.tree.map(lambda v: np.asarray(v).copy(), module.params)
    params, opt_state, metrics = step(
        module.params, module.opt_state, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["total"]))
    changed = [
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params0), jax.tree_util.tree_leaves(params)
        )
    ]
    assert any(changed)
    module.params, module.opt_state = params, opt_state


def test_dp_matches_mean_of_per_event_losses(setup):
    """The DP loss must equal the mean of per-event losses."""
    mesh, graphs, _ = setup
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
        rng_seed=7,
    )
    module.setup_params(graphs[0])
    rng = jax.random.PRNGKey(3)
    # per-event losses FIRST: the DP step donates the parameter buffers
    rngs = jax.random.split(rng, N_DEV)
    per_event = []
    for g, r in zip(graphs[:N_DEV], rngs):
        out, pdata = module.full_model.apply(
            {"params": module.params}, g, rngs=module._apply_rngs(r)
        )
        loss, _ = module.get_losses(out, pdata, r)
        per_event.append(float(loss))

    batch = shard_batch(stack_graphs(graphs[:N_DEV]), mesh)
    step = make_dp_train_step(module, mesh)
    _, _, metrics = step(module.params, module.opt_state, batch, rng)
    assert float(metrics["total"]) == pytest.approx(np.mean(per_event), rel=1e-6)


def test_dp_trainer_fit(setup):
    mesh, graphs, _ = setup
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
    )
    dm = TestTrackingDataModule(
        graphs, padding=PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512)
    )
    trainer = DPTrainer(module, mesh)
    metrics = trainer.fit(dm, max_epochs=2)
    assert np.isfinite(metrics["total"])
    assert module.step == 2 * (len(graphs) // N_DEV)
