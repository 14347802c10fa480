"""Multi-event generalization drill at small scale (VERDICT r3 #8).

The bundled TrackML event is the only real data in the image, so round-3
physics numbers were single-event fits. This script de-saturates them:
derive N genuinely distinct events from the bundled event via

* a fixed per-event azimuthal rotation (physics-exact — tracking is
  φ-symmetric; ``utils/augmentation.rotate_phi``), and
* per-event random hit dropout (keep_frac of hits survive), which changes
  the graph TOPOLOGY (edges incident to dropped hits disappear,
  short tracks fall below the 3-hit reconstructability threshold);

train on events ``0..N-2``, validate on event ``N-1`` (unseen rotation AND
unseen dropout pattern), and report the same headline metrics as the
reference acceptance surface: EC ROC-AUC (reference ``training/ec.py:55-84``)
and trk.double_majority_pt0.9 via the DBSCAN scanner (reference
``postprocessing/dbscanscanner.py:74-188``, ``training/tc.py:86-105``).
This is the single-file analog of the reference's multi-file datamodule
semantics (``utils/loading.py:116-248``).

Usage::

    python scripts/train_multievent.py --workdir /tmp/multievent \
        [--n-events 8] [--keep-frac 0.9] [--epochs-tc 800] [--json out.json]
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
sys.path.insert(0, str(Path(__file__).parent))


def derive_event(g, seed: int, n_events: int, keep_frac: float):
    """Event variant ``seed``: φ-rotation by 2π·seed/N + jittered angle,
    plus hit dropout with per-event RNG. Masks (node/edge/true-edge) carry
    the dropout; ``reconstructable`` is recomputed for tracks that fall
    under 3 surviving hits (reference ``point_cloud_builder.py:400-411``
    layer-count semantics, approximated by hit count on the subsampled
    event)."""
    import jax.numpy as jnp

    from gnn_tracking_tpu.utils.augmentation import reflect_z, rotate_phi

    rng = np.random.default_rng([97, seed])
    delta = 2.0 * np.pi * seed / n_events + rng.uniform(-0.2, 0.2)
    # z-reflect half the variants (exact detector symmetry)
    if rng.random() < 0.5:
        g = reflect_z(g)
    # keep the mirror-frame cell_refl gphi in the rotated frame (same
    # invariant PhiRotation maintains): a ZReflection applied during TC
    # training on this derived event then swaps in a CONSISTENT gphi
    extras = g.extras
    if extras and "cell_refl" in extras:
        refl = np.asarray(extras["cell_refl"]).copy()
        refl[:, 1] = (refl[:, 1] + delta + np.pi) % (2.0 * np.pi) - np.pi
        extras = dict(extras)
        extras["cell_refl"] = refl.astype(np.float32)
        g = g.replace(extras=extras)

    node_mask = np.asarray(g.node_mask)
    keep = rng.random(node_mask.shape[0]) < keep_frac
    keep &= node_mask

    pid = np.asarray(g.particle_id)
    # surviving-hit count per particle -> reconstructability update
    kept_pids, counts = np.unique(pid[keep & (pid > 0)], return_counts=True)
    enough = np.zeros(int(pid.max()) + 2, dtype=bool)
    enough[kept_pids[counts >= 3]] = True
    reco = np.asarray(g.reconstructable).astype(bool) & enough[
        np.clip(pid, 0, enough.shape[0] - 1)
    ]

    src, dst = np.asarray(g.edge_index)
    edge_mask = np.asarray(g.edge_mask) & keep[src] & keep[dst]
    ta, tb = np.asarray(g.true_edge_index)
    true_edge_mask = np.asarray(g.true_edge_mask) & keep[ta] & keep[tb]

    return g.replace(
        x=rotate_phi(g.x, jnp.float32(delta)),
        node_mask=jnp.asarray(keep),
        edge_mask=jnp.asarray(edge_mask),
        true_edge_mask=jnp.asarray(true_edge_mask),
        reconstructable=jnp.asarray(reco.astype(np.float32)),
    )


def make_event_dirs(
    graph_path: Path, workdir: Path, n_events: int, keep_frac: float,
    n_select: int = 0, n_val: int = 1,
) -> tuple[Path, Path, Path | None]:
    """Derive ``n_events`` variants: the first ``n_events - n_select -
    n_val`` train, the next ``n_select`` form the SELECTION split (the TC
    monitor sees only these), and the last ``n_val`` are the REPORT split
    (evaluated only after training — leak-free; the single-file analog of
    the reference's separate val/test event dirs,
    ``utils/loading.py:116-248``)."""
    from gnn_tracking_tpu.utils.loading import load_graph, save_graph

    g = load_graph(graph_path)
    train_dir = workdir / "events_train"
    sel_dir = workdir / "events_select"
    val_dir = workdir / "events_val"
    for d in (train_dir, sel_dir, val_dir):
        d.mkdir(parents=True, exist_ok=True)
        for f in d.glob("*.npz"):
            f.unlink()
    n_train = n_events - n_select - n_val
    for i in range(n_events):
        gi = derive_event(g, i, n_events, keep_frac)
        if i < n_train:
            d = train_dir
        elif i < n_train + n_select:
            d = sel_dir
        else:
            d = val_dir
        save_graph(gi, d / f"event{i:03d}.npz")
    return train_dir, val_dir, (sel_dir if n_select else None)


def stage_ec(train_dir, val_dir, workdir, epochs) -> dict[str, float]:
    from gnn_tracking_tpu.losses.ec import EdgeWeightFocalLoss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
    from gnn_tracking_tpu.training.module import ECModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import PaddingConfig, TrackingDataModule

    dm = TrackingDataModule(
        train={"dirs": [train_dir], "batch_size": 1},
        val={"dirs": [val_dir]},
        padding=PaddingConfig(
            node_bucket=4096, edge_bucket=16384, true_edge_bucket=16384
        ),
    )
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=32, interaction_edge_dim=32,
            hidden_dim=64, L_ec=4,
        ),
        loss_fct=EdgeWeightFocalLoss(alpha=0.25, gamma=2.0),
        lr=2e-3,
    )
    metrics = Trainer(max_epochs=epochs, log_dir=workdir / "runs_ec").fit(
        module, dm
    )
    return {
        "ec.roc_auc": metrics.get("roc_auc", float("nan")),
        "ec.max_mcc": metrics.get("max_mcc", float("nan")),
        "ec.roc_auc_pt0.9": metrics.get("roc_auc_pt0.9", float("nan")),
    }


def stage_tc(
    train_dir, val_dir, workdir, epochs, *, h_outdim: int = 4,
    hidden_dim: int = 48, dropout: float = 0.0,
    select_dir=None, ema_decay: float | None = None,
    cosine: bool = False,
) -> dict[str, float]:
    """TC stage. With ``select_dir``, the monitor/checkpoint_best selects on
    the selection events only; each report event in ``val_dir`` is then
    evaluated individually post-training with (a) the final EMA weights and
    (b) the selected checkpoint, and the summary reports mean±std across
    the unseen report events (VERDICT r4 #3 leak-free protocol)."""
    import optax

    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import (
        PerfectECGraphTCN,
    )
    from gnn_tracking_tpu.postprocessing.dbscanscanner import (
        DBSCANHyperParamScanner,
    )
    from gnn_tracking_tpu.training.module import TCModule
    from gnn_tracking_tpu.training.trainer import Trainer
    from gnn_tracking_tpu.utils.loading import PaddingConfig, TrackingDataModule

    padding = PaddingConfig(
        node_bucket=4096, edge_bucket=16384, true_edge_bucket=16384
    )
    dm = TrackingDataModule(
        train={"dirs": [train_dir], "batch_size": 1},
        val={"dirs": [select_dir or val_dir]},
        padding=padding,
    )
    # stage-C recipe from scripts/train_trackml.py (sweep 2026-08-17)
    module = TCModule(
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
                    max(len(sorted(Path(train_dir).glob("*.npz"))), 1)
                    * epochs,
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

    transform = Compose(
        [ZReflection(p=0.5, seed=4), PhiRotation(seed=4)]
    )
    if dropout > 0:
        transform = Compose([transform, HitDropout(p=dropout, seed=4)])
    trainer = Trainer(
        max_epochs=epochs, log_dir=workdir / "runs_tc",
        monitor="trk.double_majority_pt0.9",
        train_transform=transform,
        ema_decay=ema_decay,
        checkpoint_every_epoch=False,
    )
    metrics = trainer.fit(module, dm)
    prefix = "tc.select." if select_dir is not None else "tc."
    out = {
        prefix + k: metrics[k]
        for k in (
            "trk.double_majority_pt0.9",
            "trk.lhc_pt0.9",
            "trk.perfect_pt0.9",
            "trk.fake_double_majority_pt0.9",
            "best_trk.double_majority_pt0.9",
        )
        if k in metrics
    }
    if select_dir is not None:
        from gnn_tracking_tpu.utils.loading import TrackingDataModule as TDM

        n_val = len(sorted(Path(val_dir).glob("*.npz")))

        def eval_per_event(tag: str, params=None) -> list[float]:
            """DM_pt0.9 per report event (``params`` overrides the
            evaluated weights, e.g. the final EMA tree)."""
            vals = []
            for i in range(n_val):
                ev_dm = TDM(
                    val={"dirs": [val_dir], "start": i, "stop": i + 1},
                    padding=padding,
                )
                ev_dm.setup("validate")
                m = trainer.validate(
                    module, loader=ev_dm.val_dataloader(), params=params
                )
                vals.append(m.get("trk.double_majority_pt0.9", float("nan")))
                out[f"tc.test.ev{i}.{tag}.dm_pt0.9"] = vals[-1]
            out[f"tc.test.{tag}.dm_pt0.9_mean"] = float(np.mean(vals))
            out[f"tc.test.{tag}.dm_pt0.9_std"] = float(np.std(vals))
            return vals

        eval_per_event("last", params=trainer.ema_params)
        best_ckpt = trainer.log_dir / "checkpoints" / "checkpoint_best"
        if best_ckpt.exists():
            trainer.checkpointer.restore(module, best_ckpt)
            eval_per_event("selected")
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/multievent"))
    parser.add_argument(
        "--trackml-dir",
        type=Path,
        default=Path(__file__).parent.parent / "tests" / "test_data" / "trackml",
    )
    parser.add_argument("--n-events", type=int, default=8)
    parser.add_argument(
        "--n-select", type=int, default=0,
        help="events reserved for model SELECTION (monitor/checkpoint_best "
        "sees only these; leak-free protocol)",
    )
    parser.add_argument(
        "--n-val", type=int, default=1,
        help="unseen REPORT events (evaluated only after training)",
    )
    parser.add_argument("--keep-frac", type=float, default=0.9)
    parser.add_argument("--epochs-ec", type=int, default=40)
    parser.add_argument("--epochs-tc", type=int, default=300)
    parser.add_argument("--stages", default="A,C")
    parser.add_argument("--tc-h-outdim", type=int, default=4)
    parser.add_argument("--tc-hidden", type=int, default=48)
    parser.add_argument("--tc-dropout", type=float, default=0.0)
    parser.add_argument(
        "--ema-decay", type=float, default=0.998,
        help="parameter-EMA decay for validation/selection (0 disables)",
    )
    parser.add_argument(
        "--tc-cosine", action="store_true",
        help="cosine-decay the TC lr over the run",
    )
    parser.add_argument("--json", type=Path, default=None)
    parser.add_argument("--tpu", action="store_true")
    args = parser.parse_args()
    if args.n_select + args.n_val >= args.n_events:
        parser.error("--n-select + --n-val must be < --n-events")

    from train_trackml import build_data

    _, graph_dir, _ = build_data(args.trackml_dir, args.workdir, n_sectors=1)
    graph_path = sorted(Path(graph_dir).glob("*.npz"))[0]
    train_dir, val_dir, sel_dir = make_event_dirs(
        graph_path, args.workdir, args.n_events, args.keep_frac,
        n_select=args.n_select, n_val=args.n_val,
    )
    results: dict[str, float] = {}
    stages = {s.strip().upper() for s in args.stages.split(",")}
    ema_decay = args.ema_decay if args.ema_decay > 0 else None
    if "A" in stages:
        results.update(stage_ec(train_dir, val_dir, args.workdir, args.epochs_ec))
    if "C" in stages:
        results.update(
            stage_tc(
                train_dir, val_dir, args.workdir, args.epochs_tc,
                h_outdim=args.tc_h_outdim, hidden_dim=args.tc_hidden,
                dropout=args.tc_dropout, select_dir=sel_dir,
                ema_decay=ema_decay, cosine=args.tc_cosine,
            )
        )

    n_train = args.n_events - args.n_select - args.n_val
    print(
        f"\n=== Multi-event generalization ({n_train} train events, "
        f"{args.n_select} selection events, {args.n_val} unseen report "
        f"events, keep_frac={args.keep_frac}) ==="
    )
    for k in sorted(results):
        print(f"  {k:<40} {results[k]:.4f}")
    if args.json:
        args.json.write_text(json.dumps(results, indent=2))
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
