"""Full learned-graph-construction pipeline composition (SURVEY §3.4):
train a metric-learning embedding → checkpoint → restore → bake kNN graphs
into a dataset with DataTransformer → train object condensation on the baked
graphs. Exercises restore + MLGraphConstruction + transformer + TC training
in one chain."""

import numpy as np
import pytest

import jax

from gnn_tracking_tpu.graph_construction.data_transformer import DataTransformer
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.losses.metric_learning import GraphConstructionHingeEmbeddingLoss
from gnn_tracking_tpu.losses.oc import CondensationLossTiger
from gnn_tracking_tpu.models.graph_construction import (
    GraphConstructionFCNN,
    MLGraphConstruction,
)
from gnn_tracking_tpu.models.track_condensation_networks import GraphTCNForMLGCPipeline
from gnn_tracking_tpu.training.module import MLModule, TCModule
from gnn_tracking_tpu.training.restore import get_model
from gnn_tracking_tpu.training.trainer import Trainer
from gnn_tracking_tpu.utils.loading import (
    PaddingConfig,
    TestTrackingDataModule,
    TrackingDataModule,
    load_graph,
    save_graph,
)

N, DIM = 96, 10


def point_cloud(seed):
    rng = np.random.default_rng(seed)
    pid = rng.integers(0, 12, size=N)
    centers = rng.normal(scale=3.0, size=(12, DIM))
    x = centers[pid] + 0.3 * rng.normal(size=(N, DIM))
    iu = np.triu_indices(N, k=1)
    keep = (pid[iu[0]] == pid[iu[1]]) & (pid[iu[0]] != 0)
    te = np.stack([iu[0][keep], iu[1][keep]])
    return EventGraph.from_arrays(
        x=x,
        particle_id=pid,
        pt=np.where(pid > 0, 2.0, 0.0),
        eta=np.zeros(N),
        reconstructable=(pid > 0).astype(float),
        true_edge_index=te,
    )


ML_CONFIG = {
    "class_path": "gnn_tracking_tpu.models.graph_construction.GraphConstructionFCNN",
    "init_args": {"in_dim": DIM, "hidden_dim": 16, "out_dim": 4, "depth": 2},
}


@pytest.mark.slow
def test_ml_to_tc_pipeline(tmp_path):
    padding = PaddingConfig(node_bucket=128, edge_bucket=1024, true_edge_bucket=1024)
    clouds = [point_cloud(s) for s in range(3)]
    dm = TestTrackingDataModule(clouds, padding=padding)

    # 1) train the metric-learning embedding
    ml_module = MLModule(
        model=GraphConstructionFCNN(in_dim=DIM, hidden_dim=16, out_dim=4, depth=2),
        loss_fct=GraphConstructionHingeEmbeddingLoss(max_num_neighbors=16),
        lr=3e-3,
    )
    trainer = Trainer(max_epochs=4, log_dir=tmp_path / "ml", print_validation_results=False)
    trainer.fit(ml_module, dm, config={"model": {"init_args": {"model": ML_CONFIG}}})

    # 2) restore from checkpoint
    ckpts = [c for c in (trainer.log_dir / "checkpoints").glob("checkpoint_*") if c.is_dir()]
    bound_ml = get_model(sorted(ckpts)[-1])

    # 3) bake kNN graphs into a dataset
    mlgc = MLGraphConstruction(ml=bound_ml.module, max_radius=50.0, max_num_neighbors=8)

    def transform(g):
        return mlgc.apply({"params": {"ml": bound_ml.params}}, g)

    in_dir = tmp_path / "clouds"
    in_dir.mkdir()
    for i, g in enumerate(clouds):
        save_graph(padding.pad(g), in_dir / f"data{i}_s0.npz")
    out_dir = tmp_path / "baked"
    DataTransformer(transform, compact=True).process_directories([in_dir], [out_dir])
    baked_files = sorted(out_dir.glob("*.npz"))
    assert len(baked_files) == 3
    baked = load_graph(baked_files[0])
    assert baked.num_edges > 0
    assert baked.edge_attr.shape[1] == 2 * DIM  # [xi - xj, xi + xj]

    # 4) train object condensation on the baked graphs
    tc_dm = TrackingDataModule(
        train={"dirs": [out_dir], "batch_size": 1},
        val={"dirs": [out_dir]},
        padding=padding,
    )
    tc_module = TCModule(
        model=GraphTCNForMLGCPipeline(h_dim=6, e_dim=6, h_outdim=3, hidden_dim=16, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=16),
    )
    tc_trainer = Trainer(max_epochs=1, log_dir=tmp_path / "tc", print_validation_results=False)
    metrics = tc_trainer.fit(tc_module, tc_dm)
    assert np.isfinite(metrics["total"])
    assert "attractive" in metrics
