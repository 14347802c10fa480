"""End-to-end demo on the bundled TrackML test event.

Runs the complete pipeline: CSV → point cloud → candidate-edge graph →
object-condensation training (truth-based EC) → on-device DBSCAN scan →
tracking figures of merit.

Usage::

    python scripts/demo_pipeline.py --workdir /tmp/demo [--trackml-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# The axon TPU plugin ignores JAX_PLATFORMS=cpu; force the platform
# in-process (before any jax use) unless --tpu is passed — the demo should
# never claim the single-claimant chip by accident.
if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tpu", action="store_true", help="run on the TPU chip")
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/gnn_tracking_demo"))
    parser.add_argument(
        "--trackml-dir",
        type=Path,
        default=Path(__file__).parent.parent / "tests" / "test_data" / "trackml",
        help="Directory with TrackML event CSVs + detectors.csv.gz",
    )
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args()

    from gnn_tracking_tpu.graph_construction.graph_builder import GraphBuilder
    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import PerfectECGraphTCN
    from gnn_tracking_tpu.postprocessing.dbscanscanner import DBSCANHyperParamScanner
    from gnn_tracking_tpu.preprocessing.point_cloud_builder import PointCloudBuilder
    from gnn_tracking_tpu.training.module import TCModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import PaddingConfig, TrackingDataModule
    from gnn_tracking_tpu.utils.log import logger
    from gnn_tracking_tpu.utils.timing import timing

    pc_dir = args.workdir / "point_clouds"
    graph_dir = args.workdir / "graphs"

    with timing("Point-cloud building"):
        PointCloudBuilder(
            indir=args.trackml_dir,
            outdir=pc_dir,
            detector_config=args.trackml_dir / "detectors.csv.gz",
            n_sectors=1,
            pixel_only=True,
            add_true_edges=True,
            collect_data=False,
        ).process()

    with timing("Geometric graph building"):
        builder = GraphBuilder(pc_dir, graph_dir, measurement_mode=True)
        builder.process(stop=None)
        logger.info("Graph stats: %s", builder.get_measurements())

    dm = TrackingDataModule(
        train={"dirs": [graph_dir], "batch_size": 1},
        val={"dirs": [graph_dir]},
        padding=PaddingConfig(node_bucket=1024, edge_bucket=4096, true_edge_bucket=4096),
    )
    module = TCModule(
        model=PerfectECGraphTCN(h_dim=16, e_dim=16, h_outdim=4, hidden_dim=48, L_hc=3),
        loss_fct=CondensationLossTiger(lw_noise=1.0, lw_coward=0.1, max_n_objects=512),
        cluster_scanner=DBSCANHyperParamScanner(
            eps_range=(0.01, 0.5), n_trials=12, keep_best=4, seed=0
        ),
        lr=2e-3,
    )
    trainer = Trainer(max_epochs=args.epochs, log_dir=args.workdir / "runs")
    with timing("Training"):
        metrics = trainer.fit(module, dm)
    print("\nFinal figures of merit:")
    for k in sorted(metrics):
        if k.startswith("trk.") and not k.endswith("_std"):
            print(f"  {k:<40} {metrics[k]:.4f}")


if __name__ == "__main__":
    main()
