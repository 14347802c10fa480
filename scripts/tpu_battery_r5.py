"""Round-5 TPU battery: HC-stack anatomy + serving CC attribution.

VERDICT r4 #4: the HC stack (19.9 ms/layer by L_hc 0→3 subtraction) was
never given the membw3-style treatment the EC stack got — but the round-3
arithmetic hid that L_hc 0→1 jumps +35.6 ms while 1→3 adds only ~12 ms per
layer, i.e. the TRUE HC-layer marginal may already sit at the EC stack's
gather ceiling and the jump is the hc edge encoder + first-layer backward
becoming live. `hcanat` separates fwd/bwd intercepts and marginals.

VERDICT r4 #5: serving DBSCAN's CC while-loop pays ~10 ms per sweep for the
[32k, 64] label gather (battery #27); `ccanat` measures the free-first-sweep
reformulation (labels==iota ⇒ the gather is the index table itself — one
full gathered sweep saved, landed in ops/cc.py), sweep counts, and the
pointer-jump dose; `servepipe` times the production predict loop
(dispatch/fetch pipelining, inference.predict_dir semantics) next to the
synced per-event path.

Usage: python scripts/tpu_battery_r5.py [exp ...]   (default: all)
BATTERY_SMOKE=1 BATTERY_CPU=1 for the CPU sanity pass.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import jax

if os.environ.get("BATTERY_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tpu_experiments import claim_or_exit, describe, report, sync, timeit

SMOKE = bool(int(os.environ.get("BATTERY_SMOKE", "0")))
N, E = (2048, 16384) if SMOKE else (32768, 262144)
IDIM, HDIM = 32, 128
ITERS = 2 if SMOKE else 10


def _tc_graph(rng_seed=6, n_parts=2048):
    from tpu_battery_r2 import local_graph

    from gnn_tracking_tpu.graphs import EventGraph

    rng = np.random.default_rng(rng_seed)
    src, dst = local_graph(rng, N, E, 128 if SMOKE else 1024)
    pid = rng.integers(0, n_parts, size=N)
    return EventGraph.from_arrays(
        x=rng.normal(size=(N, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
        y=((pid[src] == pid[dst]) & (pid[src] > 0)).astype(np.float32),
        particle_id=pid,
        pt=(2 * np.random.default_rng(1).random(n_parts))[pid].astype(np.float32),
        eta=(8 * (np.random.default_rng(2).random(n_parts) - 0.5))[pid].astype(
            np.float32
        ),
        reconstructable=np.ones(N, np.float32),
    )


def exp_hcanat():
    """TC-step anatomy: fwd and step at L_hc 0..3 → fwd/bwd intercept +
    per-layer marginal; plus the isolated hc edge encoder (the piece that
    goes live at L_hc=1) and isolated per-layer ResIN cost."""
    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.mlp import MLP
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.module import TCModule

    g = _tc_graph().sort_edges_by_target()

    for l_hc in (0, 1, 2, 3):
        module = TCModule(
            model=GraphTCN(
                h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
                L_ec=3, L_hc=l_hc, sorted_edges=True,
            ),
            loss_fct=CondensationLossTiger(
                max_n_objects=2048, object_block_size=256
            ),
            precision="bf16",
        )
        module.setup_params(g)
        try:
            # forward only (jitted apply, loss excluded)
            var = {"params": module.params}
            policy = module.policy

            def fwd(p, data):
                cp = policy.cast_to_compute(p)
                out, _ = module.full_model.apply(
                    {"params": cp["params"]}, policy.cast_to_compute(data)
                )
                return out["H"].astype(jnp.float32).sum() + out["B"].astype(
                    jnp.float32
                ).sum()

            jf = jax.jit(fwd)
            sync(jf(var, g))
            t_fwd = timeit(lambda: jf(var, g), iters=ITERS)
            l0 = float(sync(module.training_step(g)["total"]))
            t_step = timeit(
                lambda: module.training_step(g)["total"], iters=ITERS
            )
            report(
                f"hcanat_Lhc{l_hc}", fwd_ms=t_fwd * 1e3, step_ms=t_step * 1e3,
                loss=l0,
            )
        except Exception as ex:
            report(f"hcanat_Lhc{l_hc}", error=describe(ex)[:400])

    # isolated hc edge encoder (4+0 -> 128 -> 32, E edges): the module that
    # becomes live (non-DCE) once L_hc >= 1
    rng = np.random.default_rng(3)
    ea = jnp.asarray(rng.normal(size=(E, 4)).astype(np.float32))
    enc = MLP(output_size=IDIM, hidden_dim=HDIM, L=2, bias=False)
    p_enc = enc.init(jax.random.PRNGKey(0), ea)

    def enc_fwd(p, a):
        return jax.nn.relu(enc.apply(p, a.astype(jnp.bfloat16))).astype(
            jnp.float32
        ).sum()

    try:
        jf = jax.jit(enc_fwd)
        sync(jf(p_enc, ea))
        t = timeit(lambda: jf(p_enc, ea), iters=ITERS)
        jg = jax.jit(lambda p, a: jax.grad(enc_fwd)(p, a))
        sync(jg(p_enc, ea))
        tg = timeit(lambda: jg(p_enc, ea), iters=ITERS)
        report("hcanat_edge_encoder", fwd_ms=t * 1e3, fwd_bwd_ms=tg * 1e3)
    except Exception as ex:
        report("hcanat_edge_encoder", error=describe(ex)[:400])


def _cluster_latent(rng_seed=7, n_tracks=2048, dim=8):
    rng = np.random.default_rng(rng_seed)
    pid = rng.integers(0, n_tracks, size=N)
    centers = rng.normal(size=(n_tracks, dim)).astype(np.float32)
    return (
        jnp.asarray(
            centers[pid] + 0.02 * rng.normal(size=(N, dim)).astype(np.float32)
        ),
        pid,
    )


def exp_ccanat():
    """Serving-scale CC/DBSCAN attribution + free-first-sweep validation."""
    from gnn_tracking_tpu.ops.cc import connected_components_neighbors
    from gnn_tracking_tpu.ops.dbscan import dbscan_from_graph
    from gnn_tracking_tpu.ops.knn import radius_graph

    cap = 64
    eps = 0.3
    h, _ = _cluster_latent()
    rg = jax.jit(
        lambda h_: radius_graph(h_, eps, max_num_neighbors=cap, loop=False)
    )
    ei, em, dists = sync(rg(h))
    t_rg = timeit(lambda: rg(h), iters=ITERS)
    report("ccanat_radius", ms=t_rg * 1e3)

    db = jax.jit(
        lambda ei_, d_, em_: dbscan_from_graph(
            ei_, d_, N, eps=eps, min_samples=1, edge_mask=em_,
            neighbor_cap=cap,
        )
    )
    lab = sync(db(ei, dists, em))
    t_db = timeit(lambda: db(ei, dists, em), iters=ITERS)
    report(
        "ccanat_dbscan_full", ms=t_db * 1e3,
        n_clusters=int(np.asarray(lab).max() + 1),
    )

    # CC alone on the core-core adjacency (min_samples=1 -> all core)
    idx2d = ei[0].reshape(N, cap)
    mask2d = (em & (dists <= eps)).reshape(N, cap)
    ccj = jax.jit(connected_components_neighbors)
    ref = sync(ccj(idx2d, mask2d))
    t_cc = timeit(lambda: ccj(idx2d, mask2d), iters=ITERS)
    report("ccanat_cc_freefirst", ms=t_cc * 1e3)

    # how many gathered sweeps does the loop actually run?
    def cc_count(neighbor_idx, neighbor_mask):
        n = neighbor_idx.shape[0]
        sentinel = jnp.int32(n)
        init = jnp.arange(n, dtype=jnp.int32)

        def propagate(labels):
            neigh = jnp.where(
                neighbor_mask, labels[neighbor_idx], sentinel
            )
            labels = jnp.minimum(labels, jnp.min(neigh, axis=1))
            for _ in range(6):
                labels = jnp.minimum(labels, labels[labels])
            return labels

        labels0 = propagate(init)
        labels, _, it = jax.lax.while_loop(
            lambda s: jnp.any(s[0] != s[1]) & (s[2] < n),
            lambda s: (propagate(s[0]), s[0], s[2] + 1),
            (labels0, init, jnp.int32(0)),
        )
        return labels, it + 1  # +1 for the pre-loop sweep

    jc = jax.jit(cc_count)
    lab_old, sweeps = sync(jc(idx2d, mask2d))
    exact = bool(np.array_equal(np.asarray(lab_old), np.asarray(ref)))
    t_old = timeit(lambda: jc(idx2d, mask2d), iters=ITERS)
    report(
        "ccanat_cc_legacy", ms=t_old * 1e3,
        gathered_sweeps=int(sweeps), matches_freefirst=exact,
    )

    # pointer-jump dose: does a heavier jump block cut sweep count?
    for jumps in (2, 6, 12):

        def cc_j(neighbor_idx, neighbor_mask, jumps=jumps):
            n = neighbor_idx.shape[0]
            sentinel = jnp.int32(n)
            init = jnp.arange(n, dtype=jnp.int32)

            def propagate(labels):
                neigh = jnp.where(
                    neighbor_mask, labels[neighbor_idx], sentinel
                )
                labels = jnp.minimum(labels, jnp.min(neigh, axis=1))
                for _ in range(jumps):
                    labels = jnp.minimum(labels, labels[labels])
                return labels

            neigh0 = jnp.where(
                neighbor_mask, neighbor_idx.astype(jnp.int32), sentinel
            )
            labels0 = jnp.minimum(init, jnp.min(neigh0, axis=1))
            for _ in range(jumps):
                labels0 = jnp.minimum(labels0, labels0[labels0])
            labels, _, _ = jax.lax.while_loop(
                lambda s: jnp.any(s[0] != s[1]) & (s[2] < n),
                lambda s: (propagate(s[0]), s[0], s[2] + 1),
                (propagate(labels0), labels0, jnp.int32(0)),
            )
            return labels

        try:
            jj = jax.jit(cc_j)
            labj = sync(jj(idx2d, mask2d))
            ok = bool(np.array_equal(np.asarray(labj), np.asarray(ref)))
            t = timeit(lambda: jj(idx2d, mask2d), iters=ITERS)
            report(f"ccanat_jumps{jumps}", ms=t * 1e3, exact=ok)
        except Exception as ex:
            report(f"ccanat_jumps{jumps}", error=describe(ex)[:300])

    # one gathered sweep + one jump block, isolated (per-sweep marginal)
    def one_sweep(labels, neighbor_idx, neighbor_mask):
        sentinel = jnp.int32(labels.shape[0])
        neigh = jnp.where(neighbor_mask, labels[neighbor_idx], sentinel)
        labels = jnp.minimum(labels, jnp.min(neigh, axis=1))
        for _ in range(6):
            labels = jnp.minimum(labels, labels[labels])
        return labels

    labels = jnp.arange(N, dtype=jnp.int32)
    js = jax.jit(one_sweep)
    sync(js(labels, idx2d, mask2d))
    t_sweep = timeit(lambda: js(labels, idx2d, mask2d), iters=ITERS)

    def jumps_only(labels):
        for _ in range(6):
            labels = jnp.minimum(labels, labels[labels])
        return labels

    jjo = jax.jit(jumps_only)
    sync(jjo(labels))
    t_jumps = timeit(lambda: jjo(labels), iters=ITERS)
    report(
        "ccanat_sweep_parts", sweep_ms=t_sweep * 1e3,
        jumps_only_ms=t_jumps * 1e3,
    )

    # Pallas VMEM-resident CC: known-Mosaic-blocked (multi-vreg gather);
    # re-probe each round in case Mosaic grew the capability
    try:
        from gnn_tracking_tpu.ops.pallas.cc_kernel import cc_neighbors_pallas

        labp = sync(
            cc_neighbors_pallas(idx2d, mask2d, interpret=False)
        )
        ok = bool(np.array_equal(np.asarray(labp), np.asarray(ref)))
        t = timeit(
            lambda: cc_neighbors_pallas(idx2d, mask2d, interpret=False),
            iters=ITERS,
        )
        report("ccanat_pallas", ms=t * 1e3, exact=ok)
    except Exception as ex:
        report("ccanat_pallas", error=describe(ex)[:300])


def exp_servepipe():
    """Production predict loop: dispatch/fetch pipelining vs synced."""
    from flax import linen as nn

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.inference import TrackingPredictor
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.restore import BoundModel

    rng = np.random.default_rng(7)
    n_tracks = 2048
    events = []
    from tpu_battery_r2 import local_graph

    for s in range(6):
        src, dst = local_graph(np.random.default_rng(s), N, E, 1024)
        pid = rng.integers(0, n_tracks, size=N)
        centers = rng.normal(size=(n_tracks, 8)).astype(np.float32)
        latent = (centers[pid] + 0.02 * rng.normal(size=(N, 8))).astype(
            np.float32
        )
        events.append(
            EventGraph.from_arrays(
                x=rng.normal(size=(N, 14)).astype(np.float32),
                edge_index=np.stack([src, dst]),
                edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
                y=((pid[src] == pid[dst]) & (pid[src] > 0)),
                particle_id=pid,
                extras={"serving_centers": latent},
            )
        )

    class _CondensedGraphTCN(nn.Module):
        tcn: nn.Module

        @nn.compact
        def __call__(self, data, exchange=None):
            out = self.tcn(data, exchange=exchange)
            out["H"] = (
                data.extras["serving_centers"].astype(jnp.float32)
                + 0.02 * out["H"].astype(jnp.float32)
            )
            return out

    model = _CondensedGraphTCN(
        tcn=GraphTCN(
            h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
            L_ec=6, L_hc=3, sorted_edges=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), events[0])["params"]
    pred = TrackingPredictor(
        BoundModel(model, params), eps=0.3, min_samples=1,
        max_num_neighbors=64, sort_edges=True, precision="bf16",
    )
    out = pred.predict(events[0])  # compile
    report("servepipe_compile", n_tracks=float(out["labels"].max() + 1))

    t0 = time.perf_counter()
    for _ in range(3):
        out = pred.predict(events[0])
    t_sync = (time.perf_counter() - t0) / 3
    report("servepipe_synced", ms=t_sync * 1e3, events_per_s=1.0 / t_sync)

    for depth in (2, 3):
        from collections import deque

        inflight: deque = deque()
        # warm pass over all events (any residual compile)
        pred.predict(events[1])
        t0 = time.perf_counter()
        n_done = 0
        for rep in range(3):
            for g in events:
                inflight.append(pred._dispatch(g))
                while len(inflight) >= depth:
                    pred._fetch(inflight.popleft())
                    n_done += 1
        while inflight:
            pred._fetch(inflight.popleft())
            n_done += 1
        dt = (time.perf_counter() - t0) / n_done
        report(
            f"servepipe_depth{depth}", ms=dt * 1e3, events_per_s=1.0 / dt,
            n_events=n_done,
        )


def exp_fdanat():
    """Full-detector per-stage split of the real-cotangent fwd+bwd
    (VERDICT r4 #4 second instrument): battery #29 measured the composite
    loss (edge focal + TC) at 2.30 s fwd+bwd but never split it. Arms:
    (L_ec, L_hc) = (6,3) total / (6,0) minus-HC-stack / (3,3)
    minus-3-EC-layers, grad each, + total fwd."""
    from train_fulldetector import full_detector_event

    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.halo import partition_event
    from gnn_tracking_tpu.parallel.sharded_tc import (
        partition_condensation,
        sharded_condensation_loss,
    )

    n_tracks = 512 if SMOKE else 16384
    g = full_detector_event(0, n_tracks=n_tracks).sort_edges_by_target()
    sg = partition_event(g, 1, sort_edges=True)
    cd = partition_condensation(g, sg, max_n_objects=512, subsample_seed=1000)
    cd1 = jax.tree.map(
        lambda v: v[0]
        if hasattr(v, "shape") and v.ndim and v.shape[0] == 1
        else v,
        cd,
    )
    gb = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )
    iters = 2 if SMOKE else 4

    def arm(tag, l_ec, l_hc, with_fwd=False):
        model = GraphTCN(
            h_dim=32, e_dim=32, h_outdim=8, hidden_dim=128,
            L_ec=l_ec, L_hc=l_hc, sorted_edges=True, remat=True,
        )
        params = model.init(jax.random.PRNGKey(0), gb)

        def real_loss(p):
            out = model.apply(p, gb)
            w = out["W"].astype(jnp.float32)
            h = out["H"].astype(jnp.float32)
            b = out["B"].astype(jnp.float32)
            l_edge = binary_focal_loss(
                inpt=w, target=gb.y.astype(jnp.float32)
            )
            tc = sharded_condensation_loss(
                b, h, cd1, q_min=0.01, max_n_objects=512, axis_name=None
            )
            return l_edge + sum(tc.values())

        try:
            if with_fwd:
                c = jax.jit(real_loss).lower(params).compile()
                sync(c(params))
                report(
                    f"fdanat_{tag}_fwd",
                    ms=timeit(lambda: c(params), iters=iters) * 1e3,
                )
            cg = jax.jit(jax.grad(real_loss)).lower(params).compile()
            sync(jax.tree.leaves(cg(params))[0])
            report(
                f"fdanat_{tag}_fb",
                ms=timeit(lambda: cg(params), iters=iters) * 1e3,
            )
        except Exception as ex:
            report(f"fdanat_{tag}", error=describe(ex)[:400])

    arm("Lec6_Lhc3", 6, 3, with_fwd=True)
    arm("Lec6_Lhc0", 6, 0)
    arm("Lec3_Lhc3", 3, 3)


def exp_servebatch():
    """Throughput of vmapped predict_batch (B events per dispatch) vs the
    depth-2 dispatch/fetch pipeline: does batching amortize dispatch and
    lift VPU occupancy past 7.0 ev/s?"""
    from flax import linen as nn

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.inference import TrackingPredictor
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.restore import BoundModel
    from tpu_battery_r2 import local_graph

    rng = np.random.default_rng(7)
    n_tracks = 2048
    events = []
    for s in range(4):
        src, dst = local_graph(np.random.default_rng(s), N, E, 1024)
        pid = rng.integers(0, n_tracks, size=N)
        centers = rng.normal(size=(n_tracks, 8)).astype(np.float32)
        latent = (centers[pid] + 0.02 * rng.normal(size=(N, 8))).astype(
            np.float32
        )
        events.append(
            EventGraph.from_arrays(
                x=rng.normal(size=(N, 14)).astype(np.float32),
                edge_index=np.stack([src, dst]),
                edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
                y=((pid[src] == pid[dst]) & (pid[src] > 0)),
                particle_id=pid,
                extras={"serving_centers": latent},
            )
        )

    class _CondensedGraphTCN(nn.Module):
        tcn: nn.Module

        @nn.compact
        def __call__(self, data, exchange=None):
            out = self.tcn(data, exchange=exchange)
            out["H"] = (
                data.extras["serving_centers"].astype(jnp.float32)
                + 0.02 * out["H"].astype(jnp.float32)
            )
            return out

    model = _CondensedGraphTCN(
        tcn=GraphTCN(
            h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
            L_ec=6, L_hc=3, sorted_edges=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), events[0])["params"]
    pred = TrackingPredictor(
        BoundModel(model, params), eps=0.3, min_samples=1,
        max_num_neighbors=64, sort_edges=True, precision="bf16",
    )
    for b in (2, 4):
        try:
            pred.predict_batch(events[:b])  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(2):
                    pred.predict_batch(events[:b])
                ts.append((time.perf_counter() - t0) / (2 * b))
            report(
                f"servebatch_b{b}", ms=min(ts) * 1e3,
                events_per_s=1.0 / min(ts),
                spread_ms=(max(ts) - min(ts)) * 1e3,
            )
        except Exception as ex:
            report(f"servebatch_b{b}", error=describe(ex)[:300])


EXPERIMENTS = {
    "hcanat": exp_hcanat,
    "ccanat": exp_ccanat,
    "servepipe": exp_servepipe,
    "fdanat": exp_fdanat,
    "servebatch": exp_servebatch,
}


def main():
    claim_or_exit()
    names = sys.argv[1:] or list(EXPERIMENTS)
    for name in names:
        print(f"# === {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            EXPERIMENTS[name]()
        except Exception as ex:
            report(name, fatal=describe(ex)[:500])
        print(f"# === {name} done in {time.perf_counter() - t0:.1f}s ===", flush=True)


if __name__ == "__main__":
    main()
