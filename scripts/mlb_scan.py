"""Stage-B (metric-learning graph construction) recipe investigation.

Round-2 verdict weak #4: true-edge efficiency 0.472 @ k=8 on the real
bundled TrackML event — half the true edges missed. This scan finds the
recipe that reaches >=0.9, mirroring the stage-C q_min investigation
(BENCH_NOTES round 2). Reference workflow: training/ml.py:86-96 +
k_scanner target-k.

Reports, per config and k: true-edge efficiency over ALL true edges,
efficiency over hits-of-interest (pt>0.9) true edges — the population the
hinge loss actually trains (reference metric_learning.py:111 `att_edges`
start at OI hits) — and edge purity.

Usage: python scripts/mlb_scan.py [--quick] [--json out.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def eval_knn(h, g, ks):
    """Efficiency/purity of the kNN graph in embedding space vs truth."""
    from gnn_tracking_tpu.ops.knn import knn_graph

    pid = np.asarray(g.particle_id)
    pt = np.asarray(g.pt)
    te = np.asarray(g.true_edge_index)[:, np.asarray(g.true_edge_mask)]
    te_sorted = np.sort(te, axis=0)
    te_set = set(zip(te_sorted[0].tolist(), te_sorted[1].tolist()))
    # hits of interest: the population the hinge loss trains
    oi = (pt > 0.9) & (pid > 0)
    te_oi = [p for p in te_set if oi[p[0]] or oi[p[1]]]
    out = {}
    for k in ks:
        ei, mask, _ = knn_graph(h, k, node_mask=g.node_mask)
        src, dst = np.asarray(ei[0]), np.asarray(ei[1])
        m = np.asarray(mask)
        built = set(
            zip(
                np.minimum(src[m], dst[m]).tolist(),
                np.maximum(src[m], dst[m]).tolist(),
            )
        )
        true_pair = (pid[src] == pid[dst]) & (pid[src] > 0) & m
        out[k] = {
            "eff": sum(p in built for p in te_set) / max(len(te_set), 1),
            "eff_oi": sum(p in built for p in te_oi) / max(len(te_oi), 1),
            "purity": float(true_pair.sum() / max(m.sum(), 1)),
            "n_edges": int(m.sum()),
        }
    return out


def train_one(g, cfg, in_dim):
    from gnn_tracking_tpu.losses.metric_learning import (
        GraphConstructionHingeEmbeddingLoss,
    )
    from gnn_tracking_tpu.models.graph_construction import GraphConstructionFCNN
    from gnn_tracking_tpu.training.module import MLModule
    from gnn_tracking_tpu.utils.loading import TestTrackingDataModule
    from gnn_tracking_tpu.training.trainer import Trainer

    import optax

    optimizer = None
    if cfg.get("schedule") == "cosine":
        optimizer = optax.adam(
            optax.cosine_decay_schedule(
                cfg["lr"], decay_steps=cfg["epochs"], alpha=0.01
            )
        )
    module = MLModule(
        model=GraphConstructionFCNN(
            in_dim=in_dim,
            hidden_dim=cfg["hidden"],
            out_dim=cfg.get("out_dim", 8),
            depth=cfg["depth"],
        ),
        loss_fct=GraphConstructionHingeEmbeddingLoss(
            r_emb=cfg["r_emb"],
            max_num_neighbors=64,
            p_attr=cfg.get("p_attr", 1.0),
            p_rep=1.0,
            lw_repulsive=cfg["lw_rep"],
            pt_thld=cfg["pt_thld"],
        ),
        lr=cfg["lr"],
        optimizer=optimizer,
    )
    dm = TestTrackingDataModule([g])
    trainer = Trainer(
        max_epochs=cfg["epochs"],
        log_dir=Path("/tmp/mlb_scan_runs"),
        checkpoint_every_epoch=False,
        print_validation_results=False,
        val_every_n_epochs=10_000,
    )
    trainer.fit(module, dm)
    return module


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument("--stage3", action="store_true")
    ap.add_argument("--json", type=Path, default=None)
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/mlb_scan"))
    args = ap.parse_args()

    from train_trackml import build_data

    sys.path.insert(0, str(Path(__file__).parent))
    pc_dir, _, _ = build_data(
        Path(__file__).parent.parent / "tests" / "test_data" / "trackml",
        args.workdir,
    )
    from gnn_tracking_tpu.utils.loading import PaddingConfig, load_graph

    padding = PaddingConfig(
        node_bucket=1024, edge_bucket=4096, true_edge_bucket=65536
    )
    g = padding.pad(load_graph(sorted(Path(pc_dir).glob("*.npz"))[0]))
    in_dim = g.x.shape[1]
    ks = (4, 8, 12, 16, 24)

    base = {
        "hidden": 128, "depth": 4, "r_emb": 1.0, "lw_rep": 1.0,
        "pt_thld": 0.9, "lr": 2e-3, "epochs": 120,
    }
    grid = [
        {},  # round-2 baseline
        {"lw_rep": 0.5},
        {"lw_rep": 0.1},
        {"pt_thld": 0.0},
        {"pt_thld": 0.0, "lw_rep": 0.5},
        {"pt_thld": 0.0, "lw_rep": 0.1},
        {"pt_thld": 0.0, "lw_rep": 0.5, "epochs": 480},
        {"pt_thld": 0.0, "lw_rep": 0.5, "epochs": 480, "hidden": 256, "depth": 6},
        {"pt_thld": 0.0, "lw_rep": 0.5, "epochs": 480, "lr": 1e-3},
    ]
    if args.stage2:
        # round 2: epochs are the dominant lever (0.47 -> 0.59 @ k8 going
        # 120 -> 480); push length + cosine decay + attraction power
        base.update({"pt_thld": 0.0, "lw_rep": 0.5})
        grid = [
            {"epochs": 1200},
            {"epochs": 1200, "schedule": "cosine"},
            {"epochs": 2400, "schedule": "cosine"},
            {"epochs": 1200, "schedule": "cosine", "p_attr": 2.0},
            {"epochs": 1200, "schedule": "cosine", "lw_rep": 0.2},
        ]
    if args.stage3:
        # round 3: 2400-epoch constant-lr matched 2400 cosine; push run
        # length, latent width, and the hinge radius at the long-run recipe
        base.update({"pt_thld": 0.0, "lw_rep": 0.5})
        grid = [
            {"epochs": 4800},
            {"epochs": 4800, "schedule": "cosine"},
            {"epochs": 2400, "out_dim": 16},
            {"epochs": 4800, "out_dim": 16, "schedule": "cosine"},
            {"epochs": 2400, "r_emb": 0.5, "schedule": "cosine"},
            {"epochs": 2400, "lr": 4e-3, "schedule": "cosine"},
        ]
    if args.quick:
        grid = grid[:3]
        base["epochs"] = 30

    results = []
    for over in grid:
        cfg = {**base, **over}
        tag = ",".join(f"{k}={v}" for k, v in sorted(cfg.items()))
        t0 = time.time()
        module = train_one(g, cfg, in_dim)
        h = module.forward(g)["H"]
        evals = eval_knn(h, g, ks)
        dt = time.time() - t0
        row = {"cfg": cfg, "train_s": round(dt, 1), "evals": evals}
        results.append(row)
        best_k = max(evals, key=lambda k: evals[k]["eff_oi"])
        print(
            json.dumps(
                {
                    "tag": tag,
                    "train_s": round(dt, 1),
                    "k8": evals.get(8),
                    "best": {"k": best_k, **evals[best_k]},
                }
            ),
            flush=True,
        )
    if args.json:
        args.json.write_text(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
