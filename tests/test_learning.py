"""End-to-end learning test: on clusterable synthetic events, object
condensation training must lift the double-majority tracking efficiency —
the full loop (graphs → GNN → condensation loss → on-device DBSCAN →
tracking metrics) demonstrably works, not just runs."""

import numpy as np
import pytest

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.losses.oc import CondensationLossTiger
from gnn_tracking_tpu.models.track_condensation_networks import PerfectECGraphTCN
from gnn_tracking_tpu.ops.knn import knn_graph
from gnn_tracking_tpu.postprocessing.dbscanscanner import DBSCANHyperParamScannerFixed
from gnn_tracking_tpu.training.module import TCModule
from gnn_tracking_tpu.utils.loading import PaddingConfig, TestTrackingDataModule


def synthetic_event(seed: int, n_tracks=10, hits_per_track=8) -> EventGraph:
    """Tracks = tight clusters in a 6-d feature space, plus a few noise hits."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(n_tracks, 6))
    pid = np.repeat(np.arange(1, n_tracks + 1), hits_per_track)
    x = centers[pid - 1] + 0.25 * rng.normal(size=(len(pid), 6))
    # a few noise hits
    n_noise = 6
    x = np.concatenate([x, rng.normal(scale=4.0, size=(n_noise, 6))])
    pid = np.concatenate([pid, np.zeros(n_noise, dtype=pid.dtype)])
    n = len(pid)

    import jax.numpy as jnp

    ei, mask, _ = knn_graph(jnp.asarray(x), 6)
    y = (pid[np.asarray(ei[0])] == pid[np.asarray(ei[1])]) & (pid[np.asarray(ei[0])] > 0)
    edge_attr = x[np.asarray(ei[0])] - x[np.asarray(ei[1])]
    return EventGraph.from_arrays(
        x=x,
        edge_index=np.asarray(ei),
        edge_attr=edge_attr,
        y=y & np.asarray(mask),
        particle_id=pid,
        pt=np.where(pid > 0, 2.0, 0.0),
        eta=np.zeros(n),
        reconstructable=(pid > 0).astype(float),
    ).mask_edges(mask)


@pytest.mark.slow
def test_condensation_training_improves_tracking():
    events = [synthetic_event(s) for s in range(4)]
    padding = PaddingConfig(node_bucket=128, edge_bucket=1024, true_edge_bucket=1)
    dm = TestTrackingDataModule(events, padding=padding)

    def foms_for(module):
        scanner = DBSCANHyperParamScannerFixed(
            trials=[{"eps": e, "min_samples": 2} for e in (0.2, 0.4, 0.7, 1.0)]
        )
        for i, batch in enumerate(dm.val_dataloader()):
            module.setup_params(batch)
            out = module.forward(batch)
            scanner(batch, out, i)
        return scanner.get_foms()

    module = TCModule(
        model=PerfectECGraphTCN(h_dim=8, e_dim=8, h_outdim=3, hidden_dim=24, L_hc=2),
        loss_fct=CondensationLossTiger(lw_noise=1.0, lw_coward=0.5, max_n_objects=16),
        lr=3e-3,
    )
    g0 = next(iter(dm.train_dataloader()))
    module.setup_params(g0)
    before = foms_for(module)["trk.double_majority_pt0.9"]

    losses = []
    for _epoch in range(30):
        for batch in dm.train_dataloader():
            losses.append(module.training_step(batch)["total"])
    after = foms_for(module)["trk.double_majority_pt0.9"]

    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert after >= before - 0.05
    assert after > 0.6, f"double majority after training: {after} (before: {before})"
