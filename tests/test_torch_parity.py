"""Activation-level parity vs a torch replica of the reference architecture.

BASELINE.md: "Match reference PyG models' per-layer activations (allclose)".
torch_geometric is not installed here, but PyG's ``MessagePassing`` bottoms
out in torch ``index_add`` scatter, so a plain-torch replica following the
reference's module semantics (``models/mlp.py``,
``models/interaction_network.py``, ``models/resin.py``,
``models/edge_classifier.py``) is an exact stand-in. We copy OUR flax
parameters into the torch replica and require allclose outputs on the same
graph.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

from .test_models import EDGE_DIM, N_EDGES, N_NODES, NODE_DIM, make_graph

H_DIM, E_DIM, HID, L_EC = 5, 4, 13, 3


# ----------------------------------------------------------------------
# torch replica of the reference architecture
# ----------------------------------------------------------------------


def _mlp(in_dim, out_dim, hidden, L=3, bias=True):
    layers, d = [], in_dim
    for _ in range(max(L, 2) - 1):
        layers += [tnn.Linear(d, hidden, bias=bias), tnn.ReLU()]
        d = hidden
    layers += [tnn.Linear(d, out_dim, bias=bias)]
    return tnn.Sequential(*layers)


class TorchIN(tnn.Module):
    def __init__(self, node_dim, edge_dim, hidden):
        super().__init__()
        self.relational_model = _mlp(2 * node_dim + edge_dim, edge_dim, hidden)
        self.object_model = _mlp(node_dim + edge_dim, node_dim, hidden)

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        m = torch.cat([x[dst], x[src], edge_attr], dim=1)
        e = self.relational_model(m)
        agg = torch.zeros(x.shape[0], e.shape[1], dtype=x.dtype)
        agg.index_add_(0, dst, e)
        x_new = self.object_model(torch.cat([x, agg], dim=1))
        return x_new, e


class TorchECForGraphTCN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ec_node_encoder = _mlp(NODE_DIM, H_DIM, HID, L=2, bias=False)
        self.ec_edge_encoder = _mlp(EDGE_DIM, E_DIM, HID, L=2, bias=False)
        self.layers = tnn.ModuleList(
            [TorchIN(H_DIM, E_DIM, HID) for _ in range(L_EC)]
        )
        w_in = E_DIM * (L_EC + 1) + 2 * H_DIM
        self.W = _mlp(w_in, 1, HID, L=3)

    def forward(self, x, edge_index, edge_attr):
        h = torch.relu(self.ec_node_encoder(x))
        e = torch.relu(self.ec_edge_encoder(edge_attr))
        embeds = [e]
        alpha = 0.5
        for i, layer in enumerate(self.layers):
            act = torch.relu if i > 0 else (lambda v: v)
            dh, e = layer(act(h), edge_index, act(e))
            h = math.sqrt(alpha) * h + math.sqrt(1 - alpha) * dh
            embeds.append(e)
        w_in = torch.cat([h[edge_index[0]], h[edge_index[1]], *embeds], dim=1)
        eps = 0.001
        w = eps + (1 - 2 * eps) * torch.sigmoid(self.W(w_in)).squeeze(-1)
        return {"W": w, "node_embedding": h, "edge_embedding": e}


# ----------------------------------------------------------------------
# flax → torch parameter transfer
# ----------------------------------------------------------------------


def _copy_mlp(t_mlp: tnn.Sequential, f_params: dict) -> None:
    linears = [m for m in t_mlp if isinstance(m, tnn.Linear)]
    for i, lin in enumerate(linears):
        p = f_params[f"TorchLinear_{i}"]
        lin.weight.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy()).float()
        if "bias" in p:
            lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy()).float()


def test_ec_activations_match_torch_replica():
    graph = make_graph(0)
    model = ECForGraphTCN(
        interaction_node_dim=H_DIM,
        interaction_edge_dim=E_DIM,
        hidden_dim=HID,
        L_ec=L_EC,
    )
    variables = model.init(jax.random.PRNGKey(0), graph)
    params = variables["params"]
    out_jax = model.apply(variables, graph)

    t_model = TorchECForGraphTCN().eval()
    _copy_mlp(t_model.ec_node_encoder, params["ec_node_encoder"])
    _copy_mlp(t_model.ec_edge_encoder, params["ec_edge_encoder"])
    for i in range(L_EC):
        layer_p = params["ec_resin"][f"layer_{i}"]
        _copy_mlp(t_model.layers[i].relational_model, layer_p["relational_model"])
        _copy_mlp(t_model.layers[i].object_model, layer_p["object_model"])
    _copy_mlp(t_model.W, params["W"])

    with torch.no_grad():
        out_t = t_model(
            torch.from_numpy(np.asarray(graph.x)).float(),
            torch.from_numpy(np.asarray(graph.edge_index)).long(),
            torch.from_numpy(np.asarray(graph.edge_attr)).float(),
        )

    for key, rtol in [("W", 1e-4), ("node_embedding", 1e-4), ("edge_embedding", 1e-4)]:
        np.testing.assert_allclose(
            np.asarray(out_jax[key], dtype=np.float64),
            out_t[key].numpy().astype(np.float64),
            rtol=rtol,
            atol=1e-5,
            err_msg=key,
        )


class TorchResFCNN(tnn.Module):
    """Reference ResFCNN semantics (mlp.py:65-120)."""

    def __init__(self, in_dim, hidden, out_dim, depth, alpha=0.6, bias=True):
        super().__init__()
        self.encoder = tnn.Linear(in_dim, hidden, bias=bias)
        self.decoder = tnn.Linear(hidden, out_dim, bias=bias)
        self.layers = tnn.ModuleList(
            [tnn.Linear(hidden, hidden, bias=bias) for _ in range(depth - 1)]
        )
        self.alpha = alpha

    def forward(self, x):
        x = torch.nn.functional.normalize(x, p=2.0, dim=1, eps=1e-12)
        x = self.encoder(x)
        for layer in self.layers:
            x = math.sqrt(self.alpha) * x + math.sqrt(1 - self.alpha) * layer(
                torch.relu(x)
            )
        return self.decoder(torch.relu(x))


class TorchMLGCTCN(tnn.Module):
    """Reference ModularGraphTCN (ec=None) semantics (tcn.py:118-308)."""

    def __init__(self, h_dim, e_dim, h_outdim, hidden, L_hc):
        super().__init__()
        self.hc_node_encoder = TorchResFCNN(NODE_DIM, hidden, h_dim, depth=1, alpha=0.0, bias=False)
        self.hc_edge_encoder = _mlp(EDGE_DIM, e_dim, hidden, L=2, bias=False)
        self.layers = tnn.ModuleList([TorchIN(h_dim, e_dim, hidden) for _ in range(L_hc)])
        self.p_beta = _mlp(h_dim, 1, hidden, L=3)
        self.p_cluster = _mlp(h_dim, h_outdim, hidden, L=3)
        self.latent_normalization = tnn.Parameter(torch.ones(1))

    def forward(self, x, edge_index, edge_attr):
        h = torch.relu(self.hc_node_encoder(x))
        e = torch.relu(self.hc_edge_encoder(edge_attr))
        alpha = 0.5
        for i, layer in enumerate(self.layers):
            act = torch.relu if i > 0 else (lambda v: v)
            dh, e = layer(act(h), edge_index, act(e))
            h = math.sqrt(alpha) * h + math.sqrt(1 - alpha) * dh
        beta = torch.sigmoid(self.p_beta(h))
        eps = 1e-6
        beta = eps + (1 - 2 * eps) * beta
        out = self.p_cluster(h) * self.latent_normalization
        return {"H": out, "B": beta.squeeze(-1)}


def _copy_resfcnn(t_mod: TorchResFCNN, f_params: dict) -> None:
    names = sorted(k for k in f_params if k.startswith("NormalLinear"))
    lins = [t_mod.encoder, *t_mod.layers, t_mod.decoder]
    assert len(names) == len(lins)
    for lin, name in zip(lins, names):
        p = f_params[name]
        lin.weight.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy()).float()
        if "bias" in p:
            lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy()).float()


def test_tcn_activations_match_torch_replica():
    from gnn_tracking_tpu.models.track_condensation_networks import (
        GraphTCNForMLGCPipeline,
    )

    graph = make_graph(1)
    h_dim, e_dim, h_outdim, hidden, L_hc = 5, 4, 3, 11, 2
    model = GraphTCNForMLGCPipeline(
        h_dim=h_dim, e_dim=e_dim, h_outdim=h_outdim, hidden_dim=hidden, L_hc=L_hc
    )
    variables = model.init(jax.random.PRNGKey(3), graph)
    out_jax = model.apply(variables, graph)
    gp = variables["params"]["gtcn"]
    resin_p = variables["params"]["hc_in"]

    t = TorchMLGCTCN(h_dim, e_dim, h_outdim, hidden, L_hc).eval()
    _copy_resfcnn(t.hc_node_encoder, gp["hc_node_encoder"])
    _copy_mlp(t.hc_edge_encoder, gp["hc_edge_encoder"])
    for i in range(L_hc):
        layer_p = resin_p[f"layer_{i}"]
        _copy_mlp(t.layers[i].relational_model, layer_p["relational_model"])
        _copy_mlp(t.layers[i].object_model, layer_p["object_model"])
    _copy_mlp(t.p_beta, gp["p_beta"])
    _copy_mlp(t.p_cluster, gp["p_cluster"])
    t.latent_normalization.data = torch.from_numpy(
        np.asarray(gp["latent_normalization"]).copy()
    ).float()

    with torch.no_grad():
        out_t = t(
            torch.from_numpy(np.asarray(graph.x)).float(),
            torch.from_numpy(np.asarray(graph.edge_index)).long(),
            torch.from_numpy(np.asarray(graph.edge_attr)).float(),
        )
    np.testing.assert_allclose(
        np.asarray(out_jax["H"], dtype=np.float64),
        out_t["H"].numpy().astype(np.float64),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_jax["B"], dtype=np.float64),
        out_t["B"].numpy().astype(np.float64),
        rtol=1e-4,
        atol=1e-6,
    )


# ----------------------------------------------------------------------
# skip2 reference-compat (overlapping pairwise blocks, resin.py:157)
# ----------------------------------------------------------------------


class TorchSkip2Overlap(tnn.Module):
    """Reference ``Skip2ResidualNetwork._forward`` semantics: overlapping
    ``pairwise(range(L))`` blocks sharing layers between consecutive blocks
    (reference resin.py:157-176), no batch norm."""

    def __init__(self, n_layers):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TorchIN(H_DIM, E_DIM, HID) for _ in range(n_layers)]
        )

    def forward(self, x, edge_index, edge_attr):
        embeds = [edge_attr]
        alpha = 0.5
        for i0 in range(len(self.layers) - 1):
            i1 = i0 + 1
            act0 = torch.relu if i0 > 0 else (lambda v: v)
            hx, he = self.layers[i0](act0(x), edge_index, act0(edge_attr))
            dx, edge_attr = self.layers[i1](
                torch.relu(hx), edge_index, torch.relu(he)
            )
            x = math.sqrt(alpha) * x + math.sqrt(1 - alpha) * dx
            embeds.append(edge_attr)
        return x, edge_attr, embeds


def test_skip2_compat_overlap_matches_torch_replica():
    from gnn_tracking_tpu.models.resin import ResIN

    n_layers = 4
    rng = np.random.default_rng(7)
    graph = make_graph(3)
    x = rng.normal(size=(N_NODES, H_DIM)).astype(np.float32)
    e = rng.normal(size=(N_EDGES, E_DIM)).astype(np.float32)
    ei = np.asarray(graph.edge_index)

    model = ResIN(
        node_dim=H_DIM,
        edge_dim=E_DIM,
        object_hidden_dim=HID,
        relational_hidden_dim=HID,
        n_layers=n_layers,
        residual_type="skip2",
        compat_overlap=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), x, jax.numpy.asarray(ei), e
    )
    x_jax, e_jax, embeds_jax = model.apply(
        variables, x, jax.numpy.asarray(ei), e
    )
    # L-1 overlapping blocks -> input + (L-1) collected embeddings
    assert len(embeds_jax) == n_layers
    assert model.concat_edge_embeddings_length == E_DIM * n_layers

    t = TorchSkip2Overlap(n_layers).eval()
    for i in range(n_layers):
        layer_p = variables["params"][f"layer_{i}"]
        _copy_mlp(t.layers[i].relational_model, layer_p["relational_model"])
        _copy_mlp(t.layers[i].object_model, layer_p["object_model"])
    with torch.no_grad():
        x_t, e_t, embeds_t = t(
            torch.from_numpy(x).float(),
            torch.from_numpy(ei).long(),
            torch.from_numpy(e).float(),
        )
    np.testing.assert_allclose(
        np.asarray(x_jax, np.float64), x_t.numpy().astype(np.float64),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(e_jax, np.float64), e_t.numpy().astype(np.float64),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(embeds_jax, embeds_t):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), b.numpy().astype(np.float64),
            rtol=1e-4, atol=1e-5,
        )
