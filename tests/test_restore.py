"""Checkpoint-restore tests: get_model from checkpoint + param injection for
pretrained-frozen submodules (reference `ECFromChkpt` semantics)."""

import numpy as np

import jax

from gnn_tracking_tpu.losses.ec import EdgeWeightBCELoss
from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
from gnn_tracking_tpu.models.track_condensation_networks import PreTrainedECGraphTCN
from gnn_tracking_tpu.training.module import ECModule, TCModule
from gnn_tracking_tpu.training.restore import get_model, inject_params
from gnn_tracking_tpu.training.trainer import Trainer
from gnn_tracking_tpu.utils.loading import PaddingConfig, TestTrackingDataModule

from .test_training import make_graph

EC_CONFIG = {
    "class_path": "gnn_tracking_tpu.models.edge_classifier.ECForGraphTCN",
    "init_args": {
        "interaction_node_dim": 4,
        "interaction_edge_dim": 4,
        "L_ec": 2,
        "hidden_dim": 12,
    },
}


def _train_ec(tmp_path):
    dm = TestTrackingDataModule(
        [make_graph(0)],
        padding=PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512),
    )
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12
        ),
        loss_fct=EdgeWeightBCELoss(),
    )
    trainer = Trainer(max_epochs=1, log_dir=tmp_path, print_validation_results=False)
    config = {"model": {"init_args": {"model": EC_CONFIG}}}
    trainer.fit(module, dm, config=config)
    ckpt = sorted((trainer.log_dir / "checkpoints").glob("checkpoint_*"))
    return module, [c for c in ckpt if c.is_dir()][0], dm


def test_get_model_roundtrip(tmp_path):
    module, ckpt, dm = _train_ec(tmp_path)
    bound = get_model(ckpt)
    g = next(iter(dm.val_dataloader()))
    out_direct = module.forward(g)
    out_bound = bound(g)
    np.testing.assert_allclose(
        np.asarray(out_direct["W"]), np.asarray(out_bound["W"]), rtol=1e-6
    )


def test_pretrained_frozen_ec(tmp_path):
    module, ckpt, dm = _train_ec(tmp_path)
    bound = get_model(ckpt)
    g = next(iter(dm.val_dataloader()))

    from gnn_tracking_tpu.losses.oc import CondensationLossTiger

    tc = TCModule(
        model=PreTrainedECGraphTCN(
            ec=bound.module, h_dim=4, e_dim=4, hidden_dim=12, L_hc=2
        ),
        loss_fct=CondensationLossTiger(max_n_objects=32),
        frozen_prefixes=("model/ec",),
    )
    tc.setup_params(g)
    tc.params = inject_params(tc.params, "model/ec", bound.params)
    before = np.asarray(
        jax.tree_util.tree_leaves(tc.params["model"]["ec"])[0]
    ).copy()
    tc.training_step(g)
    after = np.asarray(jax.tree_util.tree_leaves(tc.params["model"]["ec"])[0])
    np.testing.assert_array_equal(before, after)
    # and the injected EC reproduces the pretrained scores
    out = tc.forward(g)
    np.testing.assert_allclose(
        np.asarray(out["W"]), np.asarray(bound(g)["W"]), rtol=1e-6
    )


def test_ml_graph_construction_from_chkpt(tmp_path):
    """Learned-GC pipeline restored from a checkpoint: embeds, builds the
    kNN graph, preserves truth (reference MLGraphConstructionFromChkpt)."""
    from gnn_tracking_tpu.losses.metric_learning import (
        GraphConstructionHingeEmbeddingLoss,
    )
    from gnn_tracking_tpu.models.graph_construction import GraphConstructionFCNN
    from gnn_tracking_tpu.training.module import MLModule
    from gnn_tracking_tpu.training.restore import ml_graph_construction_from_chkpt

    dm = TestTrackingDataModule(
        [make_graph(0)],
        padding=PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512),
    )
    ml_config = {
        "class_path": "gnn_tracking_tpu.models.graph_construction.GraphConstructionFCNN",
        "init_args": {"in_dim": 14, "hidden_dim": 16, "out_dim": 4, "depth": 2},
    }
    module = MLModule(
        model=GraphConstructionFCNN(in_dim=14, hidden_dim=16, out_dim=4, depth=2),
        loss_fct=GraphConstructionHingeEmbeddingLoss(max_num_neighbors=16),
    )
    trainer = Trainer(max_epochs=1, log_dir=tmp_path, print_validation_results=False)
    config = {"model": {"init_args": {"model": ml_config}}}
    trainer.fit(module, dm, config=config)
    ckpt = sorted(
        c for c in (trainer.log_dir / "checkpoints").glob("checkpoint_*") if c.is_dir()
    )[0]

    gc = ml_graph_construction_from_chkpt(
        ckpt, max_num_neighbors=8, max_radius=100.0, build_edge_features=True
    )
    g = next(iter(dm.val_dataloader()))
    out = gc(g)
    assert out.num_edges == g.num_nodes * 8
    assert np.asarray(out.edge_mask).sum() > 0
    # truth preserved for downstream losses
    np.testing.assert_array_equal(
        np.asarray(out.true_edge_index), np.asarray(g.true_edge_index)
    )
    # reference builds edge features from data.x (graph_construction.py:386-393)
    assert out.edge_attr.shape[1] == 2 * g.x.shape[1]
