"""Serving pipeline (gnn_tracking_tpu/inference.py): checkpoint -> labels.

Covers both model flavors (condensation latent -> DBSCAN; EC-only ->
threshold + connected components), padding invariance of the predicted
labels, and the end-to-end CLI against a real orbax checkpoint.
"""

from __future__ import annotations

import numpy as np
import jax

from gnn_tracking_tpu.inference import TrackingPredictor, main as infer_main
from gnn_tracking_tpu.losses.ec import EdgeWeightBCELoss
from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
from gnn_tracking_tpu.training.module import ECModule
from gnn_tracking_tpu.training.restore import BoundModel
from gnn_tracking_tpu.training.trainer import Trainer
from gnn_tracking_tpu.utils.loading import (
    PaddingConfig,
    TestTrackingDataModule,
    save_graph,
)

from .test_training import make_graph


def _tc_bound(graph):
    model = GraphTCN(h_dim=8, e_dim=8, h_outdim=4, hidden_dim=16, L_ec=1, L_hc=1)
    params = model.init(jax.random.PRNGKey(0), graph)["params"]
    return BoundModel(model, params)


def test_predict_condensation_labels_and_padding_invariance():
    g = make_graph(0)
    pred = TrackingPredictor(_tc_bound(g), eps=0.5, min_samples=1)
    out = pred.predict(g)
    n = g.x.shape[0]
    assert out["labels"].shape == (n,)
    assert out["beta"].shape == (n,)
    assert out["labels"].min() >= -1
    assert np.isfinite(out["beta"]).all()

    # padding to a bucket must not change the labels of the real hits
    pred_p = TrackingPredictor(
        _tc_bound(g), eps=0.5, min_samples=1,
        padding=PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512),
    )
    out_p = pred_p.predict(g)
    np.testing.assert_array_equal(out["labels"], out_p["labels"])

    # deterministic
    np.testing.assert_array_equal(out["labels"], pred.predict(g)["labels"])


def test_predict_ec_only_connected_components():
    g = make_graph(1)
    model = ECForGraphTCN(
        interaction_node_dim=4, interaction_edge_dim=4, L_ec=1, hidden_dim=8
    )
    params = model.init(jax.random.PRNGKey(1), g)["params"]
    pred = TrackingPredictor(BoundModel(model, params), ec_threshold=0.5)
    out = pred.predict(g)
    n, e = g.x.shape[0], g.edge_index.shape[1]
    assert out["labels"].shape == (n,)
    assert out["w"].shape == (e,)
    # labels are a valid partition: compacted, contiguous from 0 (or all -1)
    lab = out["labels"]
    used = np.unique(lab[lab >= 0])
    assert used.size == 0 or (used == np.arange(used.size)).all()


def test_predict_batch_matches_per_event():
    """vmapped batch predict == per-event predict, label for label."""
    gs = [make_graph(s) for s in (0, 5, 6)]
    bound = _tc_bound(gs[0])
    pad = PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512)
    pred = TrackingPredictor(bound, eps=0.5, min_samples=1, padding=pad)
    batch = pred.predict_batch(gs)
    for g, res in zip(gs, batch):
        single = pred.predict(g)
        np.testing.assert_array_equal(res["labels"], single["labels"])
        np.testing.assert_allclose(res["beta"], single["beta"], rtol=1e-5)


def test_predict_with_learned_graph_construction():
    """Serving from bare point clouds: ML embed -> kNN graph -> predict."""
    from gnn_tracking_tpu.models.graph_construction import (
        GraphConstructionFCNN,
        MLGraphConstruction,
    )

    g = make_graph(2)
    ml = GraphConstructionFCNN(in_dim=14, hidden_dim=16, out_dim=4, depth=2)
    ml_params = ml.init(jax.random.PRNGKey(0), g)["params"]
    gc = MLGraphConstruction(
        ml=BoundModel(ml, ml_params), max_num_neighbors=8, max_radius=100.0,
        build_edge_features=True,
    )
    transform = lambda data: gc.apply({}, data)

    built = transform(g)
    model = GraphTCN(
        h_dim=8, e_dim=8, h_outdim=4, hidden_dim=16, L_ec=1, L_hc=1
    )
    params = model.init(jax.random.PRNGKey(3), built)["params"]
    pred = TrackingPredictor(
        BoundModel(model, params), eps=0.5, graph_transform=transform
    )
    out = pred.predict(g)
    assert out["labels"].shape == (g.x.shape[0],)
    assert out["labels"].min() >= -1


def test_inference_cli_end_to_end(tmp_path):
    """Train 1 epoch -> checkpoint -> CLI predict over a dir of events."""
    dm = TestTrackingDataModule(
        [make_graph(0)],
        padding=PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512),
    )
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=4, interaction_edge_dim=4, L_ec=1, hidden_dim=8
        ),
        loss_fct=EdgeWeightBCELoss(),
    )
    trainer = Trainer(max_epochs=1, log_dir=tmp_path, print_validation_results=False)
    config = {
        "model": {
            "init_args": {
                "model": {
                    "class_path": (
                        "gnn_tracking_tpu.models.edge_classifier.ECForGraphTCN"
                    ),
                    "init_args": {
                        "interaction_node_dim": 4,
                        "interaction_edge_dim": 4,
                        "L_ec": 1,
                        "hidden_dim": 8,
                    },
                }
            }
        }
    }
    trainer.fit(module, dm, config=config)
    ckpt = [
        c
        for c in sorted((trainer.log_dir / "checkpoints").glob("checkpoint_*"))
        if c.is_dir()
    ][0]

    indir = tmp_path / "events"
    indir.mkdir()
    for i in range(3):
        save_graph(make_graph(10 + i), indir / f"ev{i}.npz")
    outdir = tmp_path / "labels"
    stats = infer_main(
        [
            "--chkpt", str(ckpt),
            "--indir", str(indir),
            "--outdir", str(outdir),
            "--node-bucket", "128",
            "--edge-bucket", "512",
        ]
    )
    assert stats["n_events"] == 3
    outs = sorted(outdir.glob("*_labels.npz"))
    assert len(outs) == 3
    first = np.load(outs[0])
    assert first["labels"].shape == (make_graph(10).x.shape[0],)

    # --evaluate adds averaged tracking FOMs from particle_id truth
    stats_ev = infer_main(
        [
            "--chkpt", str(ckpt),
            "--indir", str(indir),
            "--node-bucket", "128",
            "--edge-bucket", "512",
            "--evaluate",
        ]
    )
    dm_keys = [
        k for k in stats_ev if "double_majority" in k and "fake" not in k
    ]
    assert dm_keys, stats_ev.keys()
    assert all(0.0 <= stats_ev[k] <= 1.0 or np.isnan(stats_ev[k]) for k in dm_keys)

    # batched CLI path writes the same label files
    outdir_b = tmp_path / "labels_batched"
    stats_b = infer_main(
        [
            "--chkpt", str(ckpt),
            "--indir", str(indir),
            "--outdir", str(outdir_b),
            "--node-bucket", "128",
            "--edge-bucket", "512",
            "--batch-size", "3",
        ]
    )
    assert stats_b["n_events"] == 3
    for f in sorted(outdir.glob("*_labels.npz")):
        a = np.load(f)["labels"]
        b = np.load(outdir_b / f.name)["labels"]
        np.testing.assert_array_equal(a, b)


def test_predict_sorted_edges_matches_default():
    """sort_edges=True must keep labels identical and report per-edge W in
    the ORIGINAL edge order (serving perf knob, battery #24 follow-up)."""
    g = make_graph(3)
    base = TrackingPredictor(_tc_bound(g), eps=0.5, min_samples=1)
    srt = TrackingPredictor(
        _tc_bound(g), eps=0.5, min_samples=1, sort_edges=True
    )
    out_b, out_s = base.predict(g), srt.predict(g)
    np.testing.assert_array_equal(out_b["labels"], out_s["labels"])
    if "w" in out_b:
        np.testing.assert_allclose(out_b["w"], out_s["w"], rtol=1e-5, atol=1e-6)

    # EC-only flavor: W order must survive the sort/unsort round trip
    model = ECForGraphTCN(
        interaction_node_dim=4, interaction_edge_dim=4, L_ec=1, hidden_dim=8
    )
    params = model.init(jax.random.PRNGKey(1), g)["params"]
    bm = BoundModel(model, params)
    w_b = TrackingPredictor(bm, ec_threshold=0.5).predict(g)["w"]
    w_s = TrackingPredictor(bm, ec_threshold=0.5, sort_edges=True).predict(g)["w"]
    np.testing.assert_allclose(w_b, w_s, rtol=1e-5, atol=1e-6)


def test_predict_bf16_precision_close_to_f32():
    g = make_graph(4)
    bm = _tc_bound(g)
    out_f32 = TrackingPredictor(bm, eps=0.5).predict(g)
    out_bf16 = TrackingPredictor(bm, eps=0.5, precision="bf16").predict(g)
    assert out_bf16["labels"].shape == out_f32["labels"].shape
    assert np.isfinite(out_bf16["beta"]).all()
    # bf16 beta tracks f32 beta to ~1e-2 (mantissa-8 truncation through
    # a shallow net)
    np.testing.assert_allclose(out_bf16["beta"], out_f32["beta"], atol=0.05)
