"""Real-data physics loop on the vendored TrackML event (VERDICT #3).

Closes the BASELINE acceptance loop end to end on REAL detector data
(``tests/test_data/trackml``, the truncated public TrackML challenge event):

  stage A  CSV → point cloud → geometric graphs (GraphBuilder) →
           **edge classifier** training → ROC AUC / max-MCC;
  stage B  point cloud → **metric-learning graph construction**
           (hinge embedding) → kNN graph from the learned embedding →
           true-edge efficiency/purity vs the geometric baseline;
  stage C  graphs → **object condensation** (GraphTCN with learned EC)
           → on-device DBSCAN hyperparameter scan →
           trk.double_majority_pt0.9 and friends.

One bundled event only, so all numbers are single-event train-side fits —
the purpose is the *loop* (every stage through real detector data and real
metrics machinery), with the same headline metrics as the reference papers
(reference ``README.md:20`` → arXiv:2309.16754: EC AUC; double-majority
efficiency; selection metric ``trk.double_majority_pt0.9``,
``postprocessing/dbscanscanner.py:84``).

Usage::

    python scripts/train_trackml.py --workdir /tmp/trackml_loop \
        [--epochs-ec 40] [--epochs-tc 60] [--json out.json]
"""

from __future__ import annotations

import argparse

# The axon TPU plugin ignores JAX_PLATFORMS=cpu; claiming the chip from a
# long CPU-bound training loop wedges it for other clients, so force the
# platform in-process before any JAX import unless --tpu is passed.
if "--tpu" not in __import__("sys").argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_data(trackml_dir: Path, workdir: Path, n_sectors: int = 1):
    from gnn_tracking_tpu.graph_construction.graph_builder import GraphBuilder
    from gnn_tracking_tpu.preprocessing.point_cloud_builder import PointCloudBuilder
    from gnn_tracking_tpu.utils.timing import timing

    pc_dir = workdir / "point_clouds"
    graph_dir = workdir / "graphs"
    with timing("Point-cloud building"):
        PointCloudBuilder(
            indir=trackml_dir,
            outdir=pc_dir,
            detector_config=trackml_dir / "detectors.csv.gz",
            n_sectors=n_sectors,
            pixel_only=True,
            add_true_edges=True,
            collect_data=False,
        ).process()
    with timing("Geometric graph building"):
        builder = GraphBuilder(pc_dir, graph_dir, measurement_mode=True)
        builder.process(stop=None)
        stats = builder.get_measurements()
    return pc_dir, graph_dir, stats


def split_sectors(
    src_dir: Path, workdir: Path, tag: str, holdout: int, n_sectors: int,
    fold: int | None = None, select: int = 0,
) -> tuple[Path, Path, Path | None]:
    """Symlink-split per-sector files into train/val(test)/select dirs:
    ``holdout`` consecutive sector indices starting at ``fold`` (default:
    the last ``holdout``) are held out as the TEST split, and — when
    ``select > 0`` — the next ``select`` sectors become a disjoint
    SELECTION split (azimuthal sectors are statistically exchangeable, so
    any fixed split is unbiased; sweeping ``fold`` gives k-fold
    cross-validation). The selection split is what the trainer's
    ``monitor`` sees; the test split is only ever evaluated, never
    selected on — the leak-free protocol of the reference's
    train/val/test event directories (reference ``utils/loading.py``
    TrackingDataModule)."""
    train_dir = workdir / f"{tag}_train"
    val_dir = workdir / f"{tag}_val"
    sel_dir = workdir / f"{tag}_select"
    for d in (train_dir, val_dir, sel_dir):
        d.mkdir(parents=True, exist_ok=True)
        for f in d.glob("*.npz"):
            f.unlink()
    start = n_sectors - holdout if fold is None else fold
    val_sectors = {(start + i) % n_sectors for i in range(holdout)}
    sel_sectors = {
        (start + holdout + i) % n_sectors for i in range(select)
    }
    for f in sorted(src_dir.glob("*.npz")):
        s = int(f.stem.rsplit("_s", 1)[1])
        if s in val_sectors:
            dst = val_dir / f.name
        elif s in sel_sectors:
            dst = sel_dir / f.name
        else:
            dst = train_dir / f.name
        dst.symlink_to(f.resolve())
    return train_dir, val_dir, (sel_dir if select else None)


def stage_ec(
    graph_dir: Path, workdir: Path, epochs: int, val_dir: Path | None = None,
    z_reflect: bool = True, select_dir: Path | None = None,
    ema_decay: float | None = None,
) -> dict[str, float]:
    from gnn_tracking_tpu.losses.ec import EdgeWeightFocalLoss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
    from gnn_tracking_tpu.training.module import ECModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import PaddingConfig, TrackingDataModule

    padding = PaddingConfig(
        node_bucket=1024, edge_bucket=4096, true_edge_bucket=4096
    )
    # like the ML stage, EC does no model selection, so the selection
    # sectors are legitimate extra train data (the test split stays unseen)
    train_dirs = [graph_dir] if select_dir is None else [graph_dir, select_dir]
    dm = TrackingDataModule(
        train={"dirs": train_dirs, "batch_size": 1},
        val={"dirs": [select_dir or val_dir or graph_dir]},
        padding=padding,
    )
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=32,
            interaction_edge_dim=32,
            hidden_dim=64,
            L_ec=4,
        ),
        loss_fct=EdgeWeightFocalLoss(alpha=0.25, gamma=2.0),
        lr=2e-3,
    )
    from gnn_tracking_tpu.utils.augmentation import (
        Compose,
        PhiRotation,
        ZReflection,
    )

    transform = (
        Compose([ZReflection(p=0.5, seed=1), PhiRotation(seed=1)])
        if z_reflect
        else PhiRotation(seed=1)
    )
    trainer = Trainer(
        max_epochs=epochs, log_dir=workdir / "runs_ec",
        train_transform=transform,
        ema_decay=ema_decay,
        checkpoint_every_epoch=False,
    )
    metrics = trainer.fit(module, dm)
    if select_dir is not None and val_dir is not None:
        # final-model evaluation on the report (test) sectors — no
        # selection happened in this stage, so last-epoch (EMA) weights
        # on the test split are leak-free
        from gnn_tracking_tpu.utils.loading import TrackingDataModule as TDM

        test_dm = TDM(val={"dirs": [val_dir]}, padding=padding)
        test_dm.setup("validate")
        metrics = trainer.validate(
            module, loader=test_dm.val_dataloader(), params=trainer.ema_params
        )
    return {
        "ec.roc_auc": metrics.get("roc_auc", float("nan")),
        "ec.max_mcc": metrics.get("max_mcc", float("nan")),
        "ec.max_ba": metrics.get("max_ba", float("nan")),
        "ec.roc_auc_pt0.9": metrics.get("roc_auc_pt0.9", float("nan")),
    }


def stage_ml(
    pc_dir: Path | list[Path], workdir: Path, epochs: int,
    ks: tuple[int, ...] = (8, 12, 16),
    val_dir: Path | None = None, dropout: float = 0.0,
    z_reflect: bool = True, ema_decay: float | None = None,
    hidden_dim: int = 128, out_dim: int = 16, depth: int = 4,
) -> dict[str, float]:
    import optax

    from gnn_tracking_tpu.losses.metric_learning import (
        GraphConstructionHingeEmbeddingLoss,
    )
    from gnn_tracking_tpu.models.graph_construction import GraphConstructionFCNN
    from gnn_tracking_tpu.ops.knn import knn_graph
    from gnn_tracking_tpu.training.module import MLModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import (
        PaddingConfig,
        TrackingDataModule,
        load_graph,
    )

    pc_dirs = [pc_dir] if isinstance(pc_dir, (str, Path)) else list(pc_dir)
    dm = TrackingDataModule(
        train={"dirs": pc_dirs, "batch_size": 1},
        val={"dirs": [val_dir or pc_dirs[0]]},
        padding=PaddingConfig(
            node_bucket=1024, edge_bucket=4096, true_edge_bucket=65536
        ),
    )
    g_probe = load_graph(sorted(Path(pc_dirs[0]).glob("*.npz"))[0])
    in_dim = g_probe.x.shape[1]
    # Recipe (mlb_scan sweep, BENCH_NOTES round 3): the round-2 defaults
    # (pt_thld=0.9, out_dim=8, 120 epochs) plateaued at eff 0.47 @ k=8.
    # The three levers that matter, in order: (1) pt_thld=0.0 — train the
    # attraction on ALL true edges, not just the pt>0.9 population
    # (reference metric_learning.py trains pt-filtered; on a sparse event
    # that starves the loss); (2) training length — epochs are the dominant
    # lever, 120 -> 4800 takes eff@12 from 0.59 to 0.91; (3) out_dim=16 +
    # cosine decay (+0.015). lw_repulsive=0.5 stabilizes late training.
    # Round-4 battery #30: phi_scale=1.0 (raw-radian point-cloud phi) +
    # ZReflection take held-out eff@k12 0.683 -> 0.845 on fold 3.
    module = MLModule(
        model=GraphConstructionFCNN(
            in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
            depth=depth,
        ),
        loss_fct=GraphConstructionHingeEmbeddingLoss(
            r_emb=1.0, max_num_neighbors=64, p_attr=1.0, p_rep=1.0,
            lw_repulsive=0.5, pt_thld=0.0,
        ),
        lr=2e-3,
        optimizer=optax.adam(
            optax.cosine_decay_schedule(2e-3, decay_steps=epochs, alpha=0.01)
        ),
    )
    from gnn_tracking_tpu.utils.augmentation import (
        Compose,
        HitDropout,
        PhiRotation,
        ZReflection,
    )

    # point-cloud features store RAW phi radians (unit feature_scale), so
    # phi_scale=1.0 — the graph-stage default pi would wrap-distort col 1.
    # (Transform order is immaterial: PhiRotation co-rotates cell_refl.)
    parts = []
    if z_reflect:
        parts.append(ZReflection(p=0.5, seed=2))
    parts.append(PhiRotation(seed=2, phi_scale=1.0))
    if dropout > 0:
        parts.append(HitDropout(p=dropout, seed=2))
    transform = parts[0] if len(parts) == 1 else Compose(parts)
    trainer = Trainer(
        max_epochs=epochs, log_dir=workdir / "runs_ml",
        train_transform=transform,
        ema_decay=ema_decay,
        checkpoint_every_epoch=False,
    )
    trainer.fit(module, dm)

    # learned-embedding kNN graph: efficiency/purity vs truth edges
    # (on the held-out sector when a val split is active); EMA weights
    # when enabled — the ML stage has no model selection, so last/EMA on
    # the test sectors is leak-free
    loader = dm.val_dataloader() if val_dir else dm.train_dataloader()
    g = next(iter(loader))
    if trainer.ema_params is not None:
        module.params = trainer.ema_params
    out = module.forward(g)
    h = out["H"]
    pid = np.asarray(g.particle_id)
    # efficiency: fraction of truth edges (by construction, segment-level
    # truth pairs) captured; purity: fraction of built edges that are true
    te = np.asarray(g.true_edge_index)
    tem = np.asarray(g.true_edge_mask)
    te_set = {
        (int(a), int(b))
        for a, b in zip(*np.sort(te[:, tem], axis=0))
    }
    results: dict[str, float] = {}
    for k in ks:
        ei, mask, _ = knn_graph(h, k, node_mask=g.node_mask)
        src, dst = np.asarray(ei[0]), np.asarray(ei[1])
        mask = np.asarray(mask)
        true_pair = (pid[src] == pid[dst]) & (pid[src] > 0) & mask
        built = {
            (int(min(a, b)), int(max(a, b)))
            for a, b, m in zip(src, dst, mask)
            if m
        }
        found = sum((p in built) for p in te_set)
        results.update({
            f"ml.edge_purity_k{k}": float(true_pair.sum() / max(mask.sum(), 1)),
            f"ml.true_edge_efficiency_k{k}": float(found / max(len(te_set), 1)),
        })
    # headline (BASELINE/VERDICT criterion): k=12
    results["ml.true_edge_efficiency"] = results.get(
        "ml.true_edge_efficiency_k12", float("nan")
    )
    results["ml.edge_purity"] = results.get("ml.edge_purity_k12", float("nan"))
    return results


def stage_tc(
    graph_dir: Path, workdir: Path, epochs: int, val_dir: Path | None = None,
    *, h_outdim: int = 4, hidden_dim: int = 48, dropout: float = 0.0,
    cosine: bool = False, z_reflect: bool = True,
    select_dir: Path | None = None, ema_decay: float | None = None,
    val_every: int = 1, seed: int = 0,
) -> dict[str, float]:
    """TC stage. With ``select_dir`` set, runs the LEAK-FREE protocol
    (VERDICT r4 #1): the trainer's monitor selects ``checkpoint_best`` on
    the selection sectors, and the ``val_dir`` (test) sectors are evaluated
    exactly twice after training — once with the final (EMA) weights
    (``tc.test.last.*``) and once with the selected checkpoint
    (``tc.test.selected.*``). Selection split and report split are
    disjoint; reference protocol: ``training/tc.py:86-105`` +
    ``postprocessing/dbscanscanner.py:74-188`` with Lightning's separate
    val/test dirs (``utils/loading.py:116-248``)."""
    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import PerfectECGraphTCN
    from gnn_tracking_tpu.postprocessing.dbscanscanner import DBSCANHyperParamScanner
    from gnn_tracking_tpu.training.module import TCModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import PaddingConfig, TrackingDataModule

    padding = PaddingConfig(
        node_bucket=1024, edge_bucket=4096, true_edge_bucket=4096
    )
    dm = TrackingDataModule(
        train={"dirs": [graph_dir], "batch_size": 1},
        val={"dirs": [select_dir or val_dir or graph_dir]},
        padding=padding,
    )
    import optax

    # truth-based EC isolates condensation + clustering quality on real
    # data (the reference's TC stage equally assumes a trained/perfect EC:
    # reference training/tc.py + tcn.py:389-454). Recipe (sweep 2026-08-17,
    # BENCH_NOTES): q_min=0.5 keeps the potentials alive when beta sags
    # (gradient floor ~q_min^2 instead of 1e-4), lw_coward=0.5 + lw_noise=1.0
    # re-inflate beta, clip_by_global_norm guards the flat-potential adam
    # divergence. 800 epochs -> double-majority(pt>0.9) = 1.000 on the
    # bundled event; the earlier pure-potential recipe collapsed to 0.016.
    module = TCModule(
        rng_seed=42 + 1000 * seed,
        model=PerfectECGraphTCN(
            h_dim=16, e_dim=16, h_outdim=h_outdim, hidden_dim=hidden_dim,
            L_hc=3,
        ),
        loss_fct=CondensationLossTiger(
            q_min=0.5, lw_noise=1.0, lw_coward=0.5, max_n_objects=512
        ),
        cluster_scanner=DBSCANHyperParamScanner(
            eps_range=(0.01, 0.5), n_trials=12, keep_best=4, seed=0
        ),
        optimizer=optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(
                optax.cosine_decay_schedule(
                    2e-3,
                    max(len(list(Path(graph_dir).glob("*.npz"))), 1) * epochs,
                    alpha=0.02,
                )
                if cosine
                else 2e-3
            ),
        ),
    )
    from gnn_tracking_tpu.utils.augmentation import (
        Compose,
        HitDropout,
        PhiRotation,
        ZReflection,
    )

    parts = []
    if z_reflect:
        parts.append(ZReflection(p=0.5, seed=3 + 100 * seed))
    parts.append(PhiRotation(seed=3 + 100 * seed))
    if dropout > 0:
        parts.append(HitDropout(p=dropout, seed=3 + 100 * seed))
    transform = parts[0] if len(parts) == 1 else Compose(parts)
    trainer = Trainer(
        max_epochs=epochs, log_dir=workdir / "runs_tc",
        train_transform=transform,
        monitor="trk.double_majority_pt0.9",
        ema_decay=ema_decay,
        checkpoint_every_epoch=False,
        val_every_n_epochs=val_every,
    )
    metrics = trainer.fit(module, dm)
    out = {}
    for key in (
        "trk.double_majority_pt0.9",
        "trk.lhc_pt0.9",
        "trk.perfect_pt0.9",
        "trk.double_majority_pt1.5",
        "trk.fake_double_majority_pt0.9",
        "best_trk.double_majority_pt0.9",
    ):
        if key in metrics:
            prefix = "tc.select." if select_dir is not None else "tc."
            out[prefix + key] = metrics[key]
    # best-epoch companion metrics (the model checkpoint_best serves)
    for key, val in trainer.best_metrics.items():
        if (
            key.startswith("trk.")
            and "double_majority" in key
            and not key.endswith("_std")
            and np.isfinite(val)
        ):
            out["tc.best_epoch." + key] = val
    if select_dir is not None and val_dir is not None:
        # leak-free test-split evaluation (the selection monitor never saw
        # these sectors)
        from gnn_tracking_tpu.utils.loading import TrackingDataModule as TDM

        test_dm = TDM(val={"dirs": [val_dir]}, padding=padding)
        test_dm.setup("validate")
        test_loader = test_dm.val_dataloader()
        report_keys = (
            "trk.double_majority_pt0.9",
            "trk.lhc_pt0.9",
            "trk.perfect_pt0.9",
            "trk.fake_double_majority_pt0.9",
        )
        last = trainer.validate(
            module, loader=test_loader, params=trainer.ema_params
        )
        out |= {
            "tc.test.last." + k: v for k, v in last.items() if k in report_keys
        }
        best_ckpt = trainer.log_dir / "checkpoints" / "checkpoint_best"
        if best_ckpt.exists():
            trainer.checkpointer.restore(module, best_ckpt)
            sel = trainer.validate(module, loader=test_loader)
            out |= {
                "tc.test.selected." + k: v
                for k, v in sel.items()
                if k in report_keys
            }
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/trackml_loop"))
    parser.add_argument(
        "--trackml-dir",
        type=Path,
        default=Path(__file__).parent.parent / "tests" / "test_data" / "trackml",
    )
    parser.add_argument("--epochs-ec", type=int, default=80)
    parser.add_argument("--epochs-ml", type=int, default=4800)
    parser.add_argument("--epochs-tc", type=int, default=1600)
    parser.add_argument("--json", type=Path, default=None)
    parser.add_argument(
        "--stages", default="A,B,C", help="comma subset of A (EC), B (ML), C (TC)"
    )
    parser.add_argument(
        "--tpu",
        action="store_true",
        help="run on the TPU (default: force the CPU backend in-process)",
    )
    # defaults = the locked round-4 recipe (BENCH_NOTES: sector-CV DM 0.941)
    parser.add_argument(
        "--ml-dropout", type=float, default=0.05,
        help="per-step hit-dropout probability for the ML stage "
        "(dose-response under the pre-#30 recipe: 0 -> 0.587, "
        "0.05 -> 0.683, 0.10 -> 0.558 held-out eff@k12; with the "
        "phi-convention fix + z-reflection, 0.05 -> 0.845)",
    )
    parser.add_argument("--ml-hidden", type=int, default=128)
    parser.add_argument("--ml-out-dim", type=int, default=16)
    parser.add_argument("--ml-depth", type=int, default=4)
    parser.add_argument("--tc-h-outdim", type=int, default=8)
    parser.add_argument("--tc-hidden", type=int, default=64)
    parser.add_argument(
        "--tc-dropout", type=float, default=0.08,
        help="per-step hit-dropout probability for the TC stage "
        "(topology-changing regularizer, utils/augmentation.HitDropout)",
    )
    parser.add_argument(
        "--seed", type=int, default=0,
        help="repeat-seed for the TC stage (model init + augmentation "
        "streams); sweep for seed-averaged CV statistics",
    )
    parser.add_argument(
        "--tc-val-every", type=int, default=1,
        help="run the TC selection validation every N epochs (EMA makes "
        "sparse selection near-lossless; cuts the 12-trial DBSCAN scan "
        "cost when selecting on several events)",
    )
    parser.add_argument(
        "--tc-cosine", action="store_true",
        help="cosine-decay the TC lr over the run (stabilizes late epochs)",
    )
    parser.add_argument(
        "--no-z-reflect", action="store_true",
        help="disable the exact z-reflection augmentation (on by default "
        "in all stages; utils/augmentation.ZReflection)",
    )
    parser.add_argument(
        "--n-sectors", type=int, default=1,
        help="azimuthal sectors to split the event into (>1 enables --holdout)",
    )
    parser.add_argument(
        "--holdout", type=int, default=0,
        help="number of sectors held out for validation: all reported "
        "metrics then come from sectors the model never trained on",
    )
    parser.add_argument(
        "--fold", type=int, default=None,
        help="first held-out sector index (default: last `holdout` "
        "sectors); sweep 0..n_sectors-1 for cross-validation",
    )
    parser.add_argument(
        "--select-holdout", type=int, default=0,
        help="number of additional sectors held out as the SELECTION "
        "split: the TC monitor/checkpoint_best then selects on these, and "
        "the --holdout (test) sectors are only evaluated after training "
        "(leak-free protocol; reported as tc.test.last.* / "
        "tc.test.selected.*)",
    )
    parser.add_argument(
        "--select-on-train", action="store_true",
        help="leak-free variant that keeps all non-test sectors as train "
        "data: the TC monitor/checkpoint_best selects on the TRAIN "
        "sectors' metric (with EMA smoothing), and the test sectors stay "
        "evaluation-only — the VERDICT r4 #1 'select by train-side "
        "monitor' protocol",
    )
    parser.add_argument(
        "--ema-decay", type=float, default=0.998,
        help="parameter-EMA decay used for validation/selection/final "
        "eval (0 disables; variance reduction for the noisy quantized "
        "double-majority selection metric)",
    )
    args = parser.parse_args()
    if args.holdout and args.holdout + args.select_holdout >= args.n_sectors:
        parser.error("--holdout + --select-holdout must be < --n-sectors")
    if args.select_holdout and not args.holdout:
        parser.error("--select-holdout requires --holdout")
    if args.select_on_train and (args.select_holdout or not args.holdout):
        parser.error(
            "--select-on-train requires --holdout and excludes "
            "--select-holdout"
        )

    pc_dir, graph_dir, gstats = build_data(
        args.trackml_dir, args.workdir, n_sectors=args.n_sectors
    )
    results: dict[str, float] = {
        "graph." + k: float(v) for k, v in gstats.items() if np.isscalar(v)
    }
    pc_val = g_val = pc_sel = g_sel = None
    if args.holdout:
        pc_dir, pc_val, pc_sel = split_sectors(
            pc_dir, args.workdir, "pc", args.holdout, args.n_sectors,
            fold=args.fold, select=args.select_holdout,
        )
        graph_dir, g_val, g_sel = split_sectors(
            graph_dir, args.workdir, "graphs", args.holdout, args.n_sectors,
            fold=args.fold, select=args.select_holdout,
        )
    stages = {s.strip().upper() for s in args.stages.split(",")}
    z_reflect = not args.no_z_reflect
    ema_decay = args.ema_decay if args.ema_decay > 0 else None
    if "A" in stages:
        results.update(
            stage_ec(
                graph_dir, args.workdir, args.epochs_ec, val_dir=g_val,
                z_reflect=z_reflect, select_dir=g_sel, ema_decay=ema_decay,
            )
        )
    if "B" in stages:
        # the ML stage does no model selection, so the selection sectors
        # are legitimate extra TRAIN data for it (test stays untouched)
        ml_train = [pc_dir] if pc_sel is None else [pc_dir, pc_sel]
        results.update(
            stage_ml(
                ml_train, args.workdir, args.epochs_ml, val_dir=pc_val,
                dropout=args.ml_dropout, z_reflect=z_reflect,
                ema_decay=ema_decay, hidden_dim=args.ml_hidden,
                out_dim=args.ml_out_dim, depth=args.ml_depth,
            )
        )
    if "C" in stages:
        # --select-on-train: the selection loader IS the train sectors
        # (test sectors still never touch the monitor)
        tc_select = graph_dir if args.select_on_train else g_sel
        results.update(
            stage_tc(
                graph_dir, args.workdir, args.epochs_tc, val_dir=g_val,
                h_outdim=args.tc_h_outdim, hidden_dim=args.tc_hidden,
                dropout=args.tc_dropout, cosine=args.tc_cosine,
                z_reflect=z_reflect, select_dir=tc_select,
                ema_decay=ema_decay, val_every=args.tc_val_every,
                seed=args.seed,
            )
        )

    side = (
        f"held-out sectors ({args.holdout}/{args.n_sectors})"
        if args.holdout
        else "train-side"
    )
    print(f"\n=== TrackML physics loop (single bundled event, {side}) ===")
    for k in sorted(results):
        print(f"  {k:<40} {results[k]:.4f}")
    if args.json:
        args.json.write_text(json.dumps(results, indent=2))
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
