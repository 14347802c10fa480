"""End-to-end multi-chip demo: one event sharded across a device mesh.

Runs on any device count — including a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/demo_sharded.py

Pipeline: synthetic tracking event → azimuthal graph partition over the
``graph`` mesh axis → full sharded GraphTCN (edge classifier + condensation,
halo exchange over ICI) trained with globally-reduced losses → latent space
unpartitioned → on-device DBSCAN → double-majority tracking metrics.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

if os.environ.get("DEMO_PLATFORM", "cpu") == "cpu":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )

import jax

if os.environ.get("DEMO_PLATFORM", "cpu") == "cpu":
    # The env var JAX_PLATFORMS=cpu is NOT honored when the axon TPU plugin
    # is present; forcing the platform in-process is the only reliable way
    # to keep a demo off the (single, claim-serialized) TPU.
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import optax
from jax.sharding import Mesh


def synthetic_event(seed: int, n_tracks=48, hits_per_track=8):
    import jax.numpy as jnp

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.ops.knn import knn_graph

    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(n_tracks, 6))
    pid = np.repeat(np.arange(1, n_tracks + 1), hits_per_track)
    x = centers[pid - 1] + 0.25 * rng.normal(size=(len(pid), 6))
    n_noise = 16
    x = np.concatenate([x, rng.normal(scale=4.0, size=(n_noise, 6))])
    pid = np.concatenate([pid, np.zeros(n_noise, dtype=pid.dtype)])
    n = len(pid)
    ei, mask, _ = knn_graph(jnp.asarray(x), 6)
    y = (pid[np.asarray(ei[0])] == pid[np.asarray(ei[1])]) & (
        pid[np.asarray(ei[0])] > 0
    )
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


def main() -> None:
    from gnn_tracking_tpu.metrics.cluster_metrics import tracking_metrics
    from gnn_tracking_tpu.parallel.halo import partition_event, unpartition_nodes
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_model import ShardedGraphTCNTrainer
    from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

    n_shards = min(8, len(jax.devices()))
    print(f"devices: {len(jax.devices())} ({jax.default_backend()}), "
          f"sharding one event over {n_shards}")

    g = synthetic_event(0)
    sg = partition_event(g, n_shards, sort_edges=True)
    cd = partition_condensation(g, sg, max_n_objects=64)
    print(f"event: {g.num_nodes} hits, {int(np.asarray(g.edge_mask).sum())} edges "
          f"-> {n_shards} shards x {sg.n_local} hits (halo {sg.halo_mask.shape[1]})")

    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("graph",))
    trainer = ShardedGraphTCNTrainer(
        mesh,
        model=GraphTCN(
            h_dim=8, e_dim=6, h_outdim=3, hidden_dim=32, L_ec=2, L_hc=2,
            sorted_edges=True,
        ),
        max_n_objects=64,
        # pure potentials + edge BCE: with the beta terms on, beta
        # collapses toward 0 on this tiny synthetic event (q -> q_min) and
        # the latent never condenses; the potential losses alone are enough
        loss_weights={
            "attractive": 1.0, "repulsive": 1.0, "coward": 0.0,
            "noise": 0.0, "edge": 1.0,
        },
        # clip: the condensation potentials go ~flat early (repulsive
        # hinge inactive, attractive tiny), adam's second moment decays,
        # and the first real gradient otherwise produces a divergent step
        optimizer=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(3e-3)
        ),
    )
    trainer.init(jax.random.PRNGKey(0), sg)
    for step in range(120):
        losses = trainer.training_step(sg, cd)
        if step % 20 == 0 or step == 119:
            print(f"step {step:4d}: total={losses['total']:.4f} "
                  f"edge={losses['edge']:.4f} "
                  f"attr={losses['attractive']:.4f} rep={losses['repulsive']:.4f}")

    h_shards, beta_shards, w_shards, _ = trainer.forward(sg)
    h = unpartition_nodes(h_shards, sg, g.num_nodes)
    # scanner-style eps sweep: the whole trial grid in one vmapped dispatch
    from gnn_tracking_tpu.postprocessing.fastrescanner import DBSCANFastRescan

    trials = [
        {"eps": e, "min_samples": 3} for e in (0.05, 0.1, 0.2, 0.3, 0.5)
    ]
    rescan = DBSCANFastRescan(
        np.asarray(h), max_eps=0.5, max_num_neighbors=32,
        node_mask=np.asarray(g.node_mask),
    )
    all_labels = rescan.cluster_many(trials)
    best_dm, best_eps = 0.0, None
    for trial, labels in zip(trials, all_labels):
        metrics = tracking_metrics(
            truth=np.asarray(g.particle_id),
            predicted=np.asarray(labels),
            pts=np.asarray(g.pt),
            eta=np.asarray(g.eta),
            reconstructable=np.asarray(g.reconstructable),
            pt_thlds=[0.9],
            node_mask=np.asarray(g.node_mask),
        )
        dm = metrics[0.9]["double_majority"]
        if dm > best_dm:
            best_dm, best_eps = dm, trial["eps"]
    print(f"best double-majority efficiency (pt>0.9): {best_dm:.3f} at eps={best_eps}")
    assert best_dm > 0.7, "sharded training failed to learn"
    print("demo OK")


if __name__ == "__main__":
    main()
