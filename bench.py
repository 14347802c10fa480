"""Benchmark: edge-classifier training throughput (fwd+bwd) in edges/s.

Headline metric from BASELINE.md: **edges/s/chip for EC forward+backward**,
target >= 5x the PyG-CPU reference on one TPU chip. The torch-CPU baseline
model mirrors the reference architecture (PyG's MessagePassing bottoms out in
torch's native scatter-add, which is what we time), measured once and cached.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio of our throughput to the 5x-CPU target
(>= 1.0 means the target is met).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

import numpy as np

# --- benchmark configuration (paper-scale EC on a pixel-sector graph) ---
N_NODES = 32768
N_EDGES = 262144
NODE_DIM = 14
EDGE_DIM = 4
INTERACTION_DIM = 32
HIDDEN_DIM = 128
L_EC = 6
N_ITERS = 30
CACHE = Path(__file__).parent / ".bench_cpu_baseline.json"


def make_arrays(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N_NODES, NODE_DIM)).astype(np.float32)
    edge_index = rng.integers(0, N_NODES, size=(2, N_EDGES)).astype(np.int32)
    edge_attr = rng.normal(size=(N_EDGES, EDGE_DIM)).astype(np.float32)
    y = (rng.random(N_EDGES) < 0.3).astype(np.float32)
    return x, edge_index, edge_attr, y


def bench_tpu() -> float:
    """EC train step in the TPU-native configuration: bf16 compute (the
    MXU's native precision; fp32 loss), dst-sorted edges. The CPU baseline
    stays fp32 — the reference trains fp32, and each side runs its hardware's
    natural precision."""
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

    mode = os.environ.get("BENCH_MODE", "bf16_sorted")
    dtype = jnp.float32 if mode.startswith("f32") else jnp.bfloat16
    sorted_edges = "sorted" in mode or "pallas" in mode
    segment_impl = "pallas_sorted" if "pallas" in mode else "xla"

    x, edge_index, edge_attr, y = make_arrays()
    graph = EventGraph.from_arrays(
        x=x, edge_index=edge_index, edge_attr=edge_attr, y=y
    )
    if sorted_edges:
        graph = graph.sort_edges_by_target()
    graph = jax.tree.map(
        lambda v: v.astype(dtype)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        graph,
    )
    model = ECForGraphTCN(
        interaction_node_dim=INTERACTION_DIM,
        interaction_edge_dim=INTERACTION_DIM,
        hidden_dim=HIDDEN_DIM,
        L_ec=L_EC,
        sorted_edges=sorted_edges,
        segment_impl=segment_impl,
    )
    params = jax.tree.map(
        lambda v: v.astype(dtype), model.init(jax.random.PRNGKey(0), graph)
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, graph):
        def loss_fn(p):
            w = model.apply(p, graph)["W"].astype(jnp.float32)
            return binary_focal_loss(inpt=w, target=graph.y.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # warmup/compile
    params, opt_state, loss = step(params, opt_state, graph)
    assert math.isfinite(float(loss))  # D2H fetch = hard sync
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        params, opt_state, loss = step(params, opt_state, graph)
    # NB: block_until_ready alone has been observed not to wait through the
    # axon tunnel; fetching the value is a reliable synchronization.
    final = float(loss)
    dt = time.perf_counter() - t0
    assert math.isfinite(final)
    return N_EDGES * N_ITERS / dt


def bench_torch_cpu(n_iters=3) -> float:
    """Reference-architecture EC in plain torch on CPU (scatter-add message
    passing exactly as PyG's MessagePassing would execute it)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    x_np, ei_np, ea_np, y_np = make_arrays()
    x = torch.from_numpy(x_np)
    edge_index = torch.from_numpy(ei_np.astype(np.int64))
    edge_attr = torch.from_numpy(ea_np)
    y = torch.from_numpy(y_np)

    def mlp(i, o, h, L=3, bias=True):
        layers, d = [], i
        for _ in range(L - 1):
            layers += [nn.Linear(d, h, bias=bias), nn.ReLU()]
            d = h
        layers += [nn.Linear(d, o, bias=bias)]
        return nn.Sequential(*layers)

    class IN(nn.Module):
        def __init__(self, nd, ed, h):
            super().__init__()
            self.rel = mlp(2 * nd + ed, ed, h)
            self.obj = mlp(nd + ed, nd, h)

        def forward(self, x, ei, ea):
            m = torch.cat([x[ei[1]], x[ei[0]], ea], dim=1)
            e = self.rel(m)
            agg = torch.zeros(x.shape[0], e.shape[1])
            agg.index_add_(0, ei[1], e)
            return self.obj(torch.cat([x, agg], dim=1)), e

    class EC(nn.Module):
        def __init__(self):
            super().__init__()
            self.node_enc = mlp(NODE_DIM, INTERACTION_DIM, HIDDEN_DIM, L=2, bias=False)
            self.edge_enc = mlp(EDGE_DIM, INTERACTION_DIM, HIDDEN_DIM, L=2, bias=False)
            self.layers = nn.ModuleList(
                [IN(INTERACTION_DIM, INTERACTION_DIM, HIDDEN_DIM) for _ in range(L_EC)]
            )
            self.w = mlp(INTERACTION_DIM * (L_EC + 1) + 2 * INTERACTION_DIM, 1, HIDDEN_DIM)

        def forward(self, x, ei, ea):
            h = torch.relu(self.node_enc(x))
            e = torch.relu(self.edge_enc(ea))
            es = [e]
            alpha = 0.5
            for i, layer in enumerate(self.layers):
                act = torch.relu if i > 0 else lambda v: v
                dh, e = layer(act(h), ei, act(e))
                h = math.sqrt(alpha) * h + math.sqrt(1 - alpha) * dh
                es.append(e)
            w_in = torch.cat([h[ei[0]], h[ei[1]], *es], dim=1)
            return torch.sigmoid(self.w(w_in)).squeeze(-1)

    model = EC()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    bce = nn.BCELoss()

    def step():
        opt.zero_grad()
        w = model(x, edge_index, edge_attr)
        loss = bce(w.clamp(1e-6, 1 - 1e-6), y)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    dt = time.perf_counter() - t0
    return N_EDGES * n_iters / dt


def get_cpu_baseline() -> float:
    key = f"{N_NODES}x{N_EDGES}_d{INTERACTION_DIM}h{HIDDEN_DIM}L{L_EC}"
    if CACHE.exists():
        cached = json.loads(CACHE.read_text())
        if key in cached:
            return cached[key]
    val = bench_torch_cpu()
    data = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    data[key] = val
    CACHE.write_text(json.dumps(data))
    return val


def main():
    # Watchdog: the axon-tunneled chip serializes claims across processes; if
    # a stale claim wedges the device, exit instead of hanging forever.
    import os
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_S", "480"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(budget):
            print(f"# bench watchdog: no result after {budget}s", file=sys.stderr)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    cpu = get_cpu_baseline()
    tpu = bench_tpu()
    done.set()
    target = 5.0 * cpu
    print(
        json.dumps(
            {
                "metric": "ec_edges_per_s",
                "value": round(tpu),
                "unit": "edges/s",
                "vs_baseline": round(tpu / target, 3),
            }
        )
    )
    print(
        f"# torch-cpu baseline: {cpu:.3e} edges/s; target (5x): {target:.3e}; "
        f"tpu: {tpu:.3e}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
