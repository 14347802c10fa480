"""Subprocess worker for the real two-process ``jax.distributed`` test.

Each process owns ``8 // nproc`` virtual CPU devices; together they form the
same 8-device global mesh the single-process suite uses. The worker loads
only ITS OWN events (process-local data), assembles the global batch with
``parallel.multihost.local_batch_to_global``, and runs one DP train step.
Process 0 writes the loss and a parameter fingerprint; the parent test
(``test_multihost.py``) compares against the single-process run — the
correctness form of the reference's Lightning-DDP boundary (SURVEY §5.8).

Run as ``python tests/_multihost_worker.py --pid I --nproc N --port P --out F``.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    n_local = 8 // args.nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    os.environ["JAX_ENABLE_X64"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    repo = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo))
    sys.path.insert(0, str(repo / "tests"))

    import numpy as np

    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.dp import make_dp_train_step
    from gnn_tracking_tpu.parallel.mesh import make_mesh
    from gnn_tracking_tpu.parallel.multihost import (
        initialize_from_env,
        local_batch_to_global,
    )
    from gnn_tracking_tpu.training.module import TCModule
    from gnn_tracking_tpu.utils.loading import PaddingConfig

    from test_training import make_graph

    if args.nproc > 1:
        ok = initialize_from_env(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
        )
        assert ok, "distributed init failed"
        assert jax.process_count() == args.nproc
    assert jax.device_count() == 8
    assert jax.local_device_count() == n_local

    mesh = make_mesh(n_data=8)

    padding = PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512)
    # every process constructs the SAME module (same seed -> same init), but
    # loads ONLY its own slice of the global batch
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
        rng_seed=7,
    )
    module.setup_params(padding.pad(make_graph(0)))

    lo = jax.process_index() * n_local
    local_graphs = [padding.pad(make_graph(s)) for s in range(lo, lo + n_local)]
    local_batch = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *local_graphs
    )
    global_batch = local_batch_to_global(local_batch, mesh)

    step = make_dp_train_step(module, mesh)
    # hand numpy (process-uniform) values to jit: they become replicated
    # global arrays without requiring committed single-device transfers
    params = jax.tree.map(np.asarray, module.params)
    opt_state = jax.tree.map(np.asarray, module.opt_state)
    rng = np.asarray(jax.random.PRNGKey(3))
    params, opt_state, metrics = step(params, opt_state, global_batch, rng)

    loss = float(np.asarray(metrics["total"].addressable_data(0)))
    fingerprint = float(
        sum(
            float(np.abs(np.asarray(leaf.addressable_data(0))).sum())
            for leaf in jax.tree.leaves(params)
        )
    )
    if jax.process_index() == 0:
        result = {
            "loss": loss,
            "fingerprint": fingerprint,
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
        }
        pathlib.Path(args.out).write_text(json.dumps(result))
    # make sure no process exits before process 0 has read every remote
    # shard it needs
    jax.effects_barrier()


if __name__ == "__main__":
    main()
