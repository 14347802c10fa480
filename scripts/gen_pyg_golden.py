"""Generate golden activation files from the REAL reference + torch_geometric.

Run this in an environment with the reference package (``gnn_tracking``) and
``torch_geometric`` installed — NOT in this repo's image (which has neither):

    python scripts/gen_pyg_golden.py tests/test_data/golden/ec_golden.npz

It builds the reference's actual ``ECForGraphTCN`` (whose message passing
bottoms out in PyG ``MessagePassing.propagate`` — the native scatter this
framework re-implements; reference ``models/interaction_network.py:54-103``),
runs it on a deterministic random graph, and saves graph + weights +
activations. ``tests/test_pyg_golden.py`` then transplants the saved torch
weights into this repo's flax model and asserts activation-level allclose —
killing the shared-bias risk of the in-repo torch replica
(``tests/test_torch_parity.py``), which was written by the same authors as
the flax model.

The npz layout:
    cfg_*               model config scalars
    graph_x / graph_edge_index / graph_edge_attr
    sd::<state_dict key>   every torch parameter
    out_W / out_node_embedding / out_edge_embedding
"""

from __future__ import annotations

import sys

import numpy as np

CFG = {
    "node_indim": 7,
    "edge_indim": 4,
    "interaction_node_dim": 5,
    "interaction_edge_dim": 4,
    "hidden_dim": 13,
    "L_ec": 3,
    "alpha": 0.5,
    "residual_type": "skip1",
}
N_NODES, N_EDGES, SEED = 64, 256, 42


def make_graph():
    rng = np.random.default_rng(SEED)
    x = rng.normal(size=(N_NODES, CFG["node_indim"])).astype(np.float32)
    edge_index = rng.integers(0, N_NODES, size=(2, N_EDGES)).astype(np.int64)
    edge_attr = rng.normal(size=(N_EDGES, CFG["edge_indim"])).astype(np.float32)
    return x, edge_index, edge_attr


def main(out_path: str) -> None:
    import torch
    from gnn_tracking.models.edge_classifier import ECForGraphTCN
    from torch_geometric.data import Data

    torch.manual_seed(SEED)
    model = ECForGraphTCN(**CFG).eval()
    x, edge_index, edge_attr = make_graph()
    data = Data(
        x=torch.from_numpy(x),
        edge_index=torch.from_numpy(edge_index),
        edge_attr=torch.from_numpy(edge_attr),
    )
    with torch.no_grad():
        out = model(data)

    payload: dict[str, np.ndarray] = {
        f"cfg_{k}": np.asarray(v if v is not None else -1) for k, v in CFG.items()
        if not isinstance(v, str)
    }
    payload["cfg_residual_type"] = np.asarray(CFG["residual_type"])
    payload["graph_x"] = x
    payload["graph_edge_index"] = edge_index
    payload["graph_edge_attr"] = edge_attr
    for k, v in model.state_dict().items():
        payload[f"sd::{k}"] = v.detach().numpy()
    for k in ("W", "node_embedding", "edge_embedding"):
        payload[f"out_{k}"] = out[k].detach().numpy()
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path} ({len(payload)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ec_golden.npz")
