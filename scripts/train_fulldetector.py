"""Sustained full-detector-scale OC training (BASELINE config 5).

Trains a GraphTCN on synthetic full-detector events (~262k hits, ~2.1M
candidate edges each) with the 2-D data x graph mesh: events sharded over
``data``, each event's hits/edges partitioned over ``graph`` with halo
exchange, condensation loss with cross-shard reductions and per-event
particle subsampling (the reference ``sample_pids`` analog,
reference ``metrics/losses/oc.py:410-415``). Reference never trained at
this scale in-repo (its DDP analog: Lightning Trainer, SURVEY §2.10).

Defaults run on the virtual 8-device CPU mesh (2 data x 4 graph); pass
``--tpu`` to claim the real chip (single device -> 1x1 mesh unless a pod).
Emits a JSONL loss curve + a summary JSON with events/s and memory use.

Usage:
  python scripts/train_fulldetector.py --steps 100 --json /tmp/fd.json
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def full_detector_event(
    seed: int,
    *,
    n_tracks: int = 16384,
    hits_per_track: int = 16,
    k_edges: int = 8,
    noise_frac: float = 0.02,
    feat_dim: int = 8,
):
    """Synthetic full-detector event: ~n_tracks*hits_per_track hits on
    azimuthally-ordered tracks (so contiguous-range partition = azimuthal
    sectors, the reference's sector_hits analog), locality-structured
    candidate edges (kNN-like), separable per-track latent structure."""
    from gnn_tracking_tpu.graphs import EventGraph

    rng = np.random.default_rng(seed)
    n_hits = n_tracks * hits_per_track
    phi_track = rng.uniform(0, 2 * np.pi, n_tracks)
    embed = rng.normal(size=(n_tracks, feat_dim - 4)).astype(np.float32)
    pt_track = (0.3 + rng.exponential(0.9, n_tracks)).astype(np.float32)

    pid = np.repeat(np.arange(1, n_tracks + 1), hits_per_track)
    t = np.tile(np.linspace(0.0, 1.0, hits_per_track), n_tracks).astype(np.float32)
    phi = phi_track[pid - 1] + 0.03 * t * rng.normal(size=n_hits)

    n_noise = int(noise_frac * n_hits)
    phi = np.concatenate([phi, rng.uniform(0, 2 * np.pi, n_noise)])
    t = np.concatenate([t, rng.uniform(0, 1, n_noise).astype(np.float32)])
    pid = np.concatenate([pid, np.zeros(n_noise, dtype=pid.dtype)])
    n = len(pid)

    x = np.concatenate(
        [
            np.cos(phi)[:, None],
            np.sin(phi)[:, None],
            t[:, None],
            (t**2)[:, None],
            np.where(
                (pid > 0)[:, None],
                embed[np.clip(pid - 1, 0, None)],
                rng.normal(size=(n, feat_dim - 4)),
            )
            + 0.15 * rng.normal(size=(n, feat_dim - 4)),
        ],
        axis=1,
    ).astype(np.float32)

    # azimuthal hit order -> contiguous partition = sectors; graph.x[:, 1]
    # is the partitioner's default sort key, already monotone here
    order = np.argsort(phi, kind="stable")
    x, pid, phi, t = x[order], pid[order], phi[order], t[order]

    # locality-structured candidate edges (kNN-like: neighbors in the
    # azimuthal order), 2% far pairs
    e = n * k_edges
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    src = np.clip(
        dst + rng.integers(-64, 64, size=e), 0, n - 1
    ).astype(np.int32)
    far = rng.random(e) < 0.02
    src = np.where(far, rng.integers(0, n, size=e), src).astype(np.int32)
    y = (pid[src] == pid[dst]) & (pid[src] > 0) & (src != dst)
    edge_attr = (x[src, :4] - x[dst, :4]).astype(np.float32)

    return EventGraph.from_arrays(
        x=x,
        edge_index=np.stack([src, dst]),
        edge_attr=edge_attr,
        y=y.astype(np.float32),
        particle_id=pid,
        pt=np.concatenate([pt_track, [0.0]])[np.where(pid > 0, pid - 1, n_tracks)],
        eta=np.zeros(n, dtype=np.float32),
        reconstructable=(pid > 0).astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--n-events", type=int, default=2)
    ap.add_argument("--n-data", type=int, default=2)
    ap.add_argument("--n-graph", type=int, default=4)
    ap.add_argument("--n-tracks", type=int, default=16384)
    ap.add_argument("--hits-per-track", type=int, default=16)
    ap.add_argument("--max-objects", type=int, default=512)
    ap.add_argument("--h-dim", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--l-ec", type=int, default=6)
    ap.add_argument("--l-hc", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--json", type=Path, default=None)
    ap.add_argument("--jsonl", type=Path, default=None)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 model forward/backward (params f32, mixed precision)",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="rematerialize IN layers in backward (fits 2M-edge events in "
        "16 GB HBM at the cost of ~1 extra forward)",
    )
    args = ap.parse_args()

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            flags += (
                f" --xla_force_host_platform_device_count="
                f"{args.n_data * args.n_graph}"
            )
        if "collective_call_terminate_timeout" not in flags:
            # virtual devices share physical cores: a loaded machine can
            # stagger threads past the 40 s default rendezvous kill
            flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        os.environ["XLA_FLAGS"] = flags.strip()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.halo import partition_event
    from gnn_tracking_tpu.parallel.mesh2d import (
        DataGraphTCNTrainer,
        make_data_graph_mesh,
        sharded_buckets,
        stack_sharded,
    )
    from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

    t0 = time.time()
    events = [
        full_detector_event(
            s, n_tracks=args.n_tracks, hits_per_track=args.hits_per_track
        )
        for s in range(args.n_events)
    ]
    n_hits = int(np.asarray(events[0].node_mask).sum())
    n_edges = events[0].edge_index.shape[1]
    print(f"# events built: {len(events)} x {n_hits} hits / {n_edges} edges "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    buckets = sharded_buckets(events, args.n_graph, sort_edges=True)
    sgs = [
        partition_event(g, args.n_graph, sort_edges=True, pad_to=buckets)
        for g in events
    ]
    cds = [
        partition_condensation(
            g, sg, max_n_objects=args.max_objects, subsample_seed=1000 + i
        )
        for i, (g, sg) in enumerate(zip(events, sgs))
    ]
    print(f"# partitioned: {args.n_graph} shards/event, "
          f"n_local={sgs[0].n_local} ({time.time() - t0:.1f}s)", flush=True)

    mesh = make_data_graph_mesh(args.n_data, args.n_graph)
    trainer = DataGraphTCNTrainer(
        mesh,
        model=GraphTCN(
            h_dim=args.h_dim, e_dim=args.h_dim, h_outdim=8,
            hidden_dim=args.hidden, L_ec=args.l_ec, L_hc=args.l_hc,
            sorted_edges=True, remat=args.remat,
        ),
        max_n_objects=args.max_objects,
        optimizer=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(args.lr)
        ),
        precision="bf16" if args.bf16 else "f32",
    )
    sgs_s, cds_s = stack_sharded(sgs), stack_sharded(cds)
    t0 = time.time()
    trainer.init(jax.random.PRNGKey(0), sgs_s)
    print(f"# params initialized ({time.time() - t0:.1f}s)", flush=True)

    jsonl = open(args.jsonl, "w") if args.jsonl else None
    history = []
    t_compile0 = time.time()
    h = trainer.training_step(sgs_s, cds_s)  # compile + step 0
    compile_s = time.time() - t_compile0
    history.append({k: float(v) for k, v in h.items()})
    print(f"# step 0 (compile): {compile_s:.1f}s total={history[0]['total']:.4f}",
          flush=True)

    t_run0 = time.time()
    for step in range(1, args.steps):
        h = trainer.training_step(sgs_s, cds_s)
        rec = {"step": step, **{k: float(v) for k, v in h.items()}}
        history.append(rec)
        if jsonl:
            jsonl.write(json.dumps(rec) + "\n")
            jsonl.flush()
        if step % 10 == 0 or step == args.steps - 1:
            dt = (time.time() - t_run0) / step
            print(
                f"# step {step:4d} total={rec['total']:.4f} "
                f"edge={rec.get('edge', float('nan')):.4f} "
                f"{dt:.2f}s/step", flush=True)
    steady_s = (time.time() - t_run0) / max(args.steps - 1, 1)

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {
            "device_bytes_in_use": stats.get("bytes_in_use"),
            "device_peak_bytes": stats.get("peak_bytes_in_use"),
            "device_bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:  # noqa: BLE001
        pass

    summary = {
        "n_hits_per_event": n_hits,
        "n_edges_per_event": n_edges,
        "n_events": len(events),
        "mesh": f"{args.n_data}x{args.n_graph}",
        "steps": args.steps,
        "step_s": steady_s,
        "events_per_s": len(events) / steady_s,
        "compile_s": compile_s,
        "loss_first": history[0]["total"],
        "loss_last": history[-1]["total"],
        "edge_first": history[0].get("edge"),
        "edge_last": history[-1].get("edge"),
        "all_finite": bool(np.isfinite([h["total"] for h in history]).all()),
        "peak_rss_gb": round(peak_rss_gb, 2),
        **{k: v for k, v in mem.items() if v is not None},
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        args.json.write_text(json.dumps({"summary": summary, "history": history}))
    if jsonl:
        jsonl.close()


if __name__ == "__main__":
    main()
