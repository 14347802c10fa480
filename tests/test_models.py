"""Model smoke + property tests (analog of reference tests/test_tcn_training.py
model zoo, plus padding-invariance properties unique to the masked design)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.dynamic_edge_conv import DynamicEdgeConv
from gnn_tracking_tpu.models.edge_classifier import (
    ECForGraphTCN,
    PerfectEdgeClassification,
)
from gnn_tracking_tpu.models.edge_filter import EFMLP, EFDeepSet, GeometricEF
from gnn_tracking_tpu.models.graph_construction import (
    GraphConstructionFCNN,
    GraphConstructionHeteroEncResFCNN,
    GraphConstructionHeteroResFCNN,
    GraphConstructionResIN,
    MLGraphConstruction,
    MLPCTransformer,
)
from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
from gnn_tracking_tpu.models.meta import (
    TruthNoiseClassifierModel,
    WithNoiseClassification,
)
from gnn_tracking_tpu.models.mlp import MLP, HeterogeneousResFCNN, ResFCNN
from gnn_tracking_tpu.models.resin import ResIN
from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCN,
    GraphTCNForMLGCPipeline,
    ModularGraphTCN,
    PerfectECGraphTCN,
    PointCloudTCN,
    PreTrainedECGraphTCN,
)

N_NODES, N_EDGES = 60, 200
NODE_DIM, EDGE_DIM = 14, 4


def make_graph(rng_seed=0, n=N_NODES, e=N_EDGES) -> EventGraph:
    rng = np.random.default_rng(rng_seed)
    pid = rng.integers(0, 10, size=n)
    edge_index = rng.integers(0, n, size=(2, e))
    g = EventGraph.from_arrays(
        x=rng.normal(size=(n, NODE_DIM)),
        edge_index=edge_index,
        edge_attr=rng.normal(size=(e, EDGE_DIM)),
        y=(pid[edge_index[0]] == pid[edge_index[1]]) & (pid[edge_index[0]] > 0),
        particle_id=pid,
        pt=2 * rng.random(n),
        eta=8 * (rng.random(n) - 0.5),
        reconstructable=rng.integers(0, 2, size=n).astype(float),
        layer=rng.integers(0, 30, size=n),
    )
    return g


@pytest.fixture(scope="module")
def graph():
    return make_graph()


def test_mlp_shapes():
    m = MLP(output_size=7, hidden_dim=16, L=3)
    x = jnp.ones((5, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (5, 7)
    # reference: L layers means max(L, 2) linear layers
    assert len(jax.tree_util.tree_leaves(params)) == 2 * 3  # kernel+bias each


def test_resfcnn_shapes_and_norm():
    m = ResFCNN(out_dim=8, hidden_dim=32, depth=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 14)))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (10, 8)
    # input normalization: scaling the input must not change the output
    out_scaled = m.apply(params, 100 * x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_scaled), atol=1e-10)


def test_hetero_resfcnn():
    m = HeterogeneousResFCNN(out_dim=8, hidden_dim=32, depth=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(10, 14)))
    layer = jnp.asarray(rng.integers(0, 30, size=10))
    params = m.init(jax.random.PRNGKey(0), x, layer)
    out = m.apply(params, x, layer)
    assert out.shape == (10, 8)


def test_interaction_network_matches_manual_segment_sum(graph):
    m = InteractionNetwork(node_outdim=5, edge_outdim=4)
    params = m.init(
        jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr
    )
    x_out, e_out = m.apply(
        params, graph.x, graph.edge_index, graph.edge_attr, graph.edge_mask
    )
    assert x_out.shape == (N_NODES, 5)
    assert e_out.shape == (N_EDGES, 4)


def test_interaction_network_edge_mask_zeroes_contribution(graph):
    """A masked edge must not influence any node embedding."""
    m = InteractionNetwork(node_outdim=5, edge_outdim=4)
    params = m.init(jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr)
    mask = graph.edge_mask.at[0].set(False)
    x1, _ = m.apply(params, graph.x, graph.edge_index, graph.edge_attr, mask)
    # perturb the masked edge's features wildly: output must be unchanged
    edge_attr2 = graph.edge_attr.at[0].set(1e6)
    x2, _ = m.apply(params, graph.x, graph.edge_index, edge_attr2, mask)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


@pytest.mark.parametrize("residual_type", ["skip1", "skip2", "skip_top"])
def test_resin(graph, residual_type):
    n_layers = 4 if residual_type == "skip2" else 3
    m = ResIN(
        node_dim=NODE_DIM,
        edge_dim=EDGE_DIM,
        n_layers=n_layers,
        residual_type=residual_type,
    )
    params = m.init(jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr)
    x, e, e_list = m.apply(params, graph.x, graph.edge_index, graph.edge_attr, graph.edge_mask)
    assert x.shape == (N_NODES, NODE_DIM)
    assert e.shape == (N_EDGES, EDGE_DIM)
    total = sum(a.shape[1] for a in e_list)
    assert total == m.concat_edge_embeddings_length


def test_ec_for_graph_tcn(graph):
    m = ECForGraphTCN(interaction_node_dim=5, interaction_edge_dim=4, L_ec=3)
    params = m.init(jax.random.PRNGKey(0), graph)
    out = m.apply(params, graph)
    w = out["W"]
    assert w.shape == (N_EDGES,)
    assert (np.asarray(w) > 0).all() and (np.asarray(w) < 1).all()


def test_perfect_ec(graph):
    m = PerfectEdgeClassification()
    out = m.apply({}, graph)
    np.testing.assert_array_equal(np.asarray(out["W"]), np.asarray(graph.y, dtype=np.float32))


def test_perfect_ec_noisy(graph):
    m = PerfectEdgeClassification(tpr=0.8, tnr=0.7)
    out = m.apply({}, graph, rngs={"perfect_ec": jax.random.PRNGKey(0)})
    w = np.asarray(out["W"])
    y = np.asarray(graph.y)
    assert w[y].mean() < 1.0
    assert (1 - w[~y]).mean() < 1.0


@pytest.mark.parametrize(
    "model_factory",
    [
        lambda: GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        lambda: GraphTCN(h_dim=4, e_dim=4, hidden_dim=12, L_ec=2, L_hc=2, mask_orphan_nodes=True),
        lambda: GraphTCN(h_dim=4, e_dim=4, hidden_dim=12, L_ec=2, L_hc=2, use_ec_embeddings_for_hc=True),
        lambda: GraphTCN(h_dim=4, e_dim=4, hidden_dim=12, L_ec=2, L_hc=2, feed_edge_weights=True),
        lambda: PerfectECGraphTCN(h_dim=4, e_dim=4, hidden_dim=12, L_hc=2),
        lambda: GraphTCNForMLGCPipeline(h_dim=4, e_dim=4, hidden_dim=12, L_hc=2),
    ],
)
def test_tcn_variants_forward(graph, model_factory):
    m = model_factory()
    params = m.init(jax.random.PRNGKey(0), graph)
    out = m.apply(params, graph)
    assert out["H"].shape == (N_NODES, 2)
    assert out["B"].shape == (N_NODES,)
    b = np.asarray(out["B"])
    assert (b > 0).all() and (b < 1).all()
    assert out["ec_hit_mask"].shape == (N_NODES,)
    assert out["ec_edge_mask"].shape == (N_EDGES,)


def test_pretrained_ec_graph_tcn(graph):
    ec = ECForGraphTCN(interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12)
    m = PreTrainedECGraphTCN(ec=ec, h_dim=4, e_dim=4, hidden_dim=12, L_hc=2)
    params = m.init(jax.random.PRNGKey(0), graph)
    out = m.apply(params, graph)
    assert out["W"].shape == (N_EDGES,)


def test_modular_tcn_grad_flows(graph):
    m = GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2)
    params = m.init(jax.random.PRNGKey(0), graph)

    def loss(p):
        out = m.apply(p, graph)
        return jnp.sum(out["H"] ** 2) + jnp.sum(out["B"]) + jnp.sum(out["W"])

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradients nonzero
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_edge_filters(graph):
    for m in [EFDeepSet(hidden_dim=16, depth=2), EFMLP(node_indim=NODE_DIM, edge_indim=EDGE_DIM, hidden_dim=16, depth=3)]:
        params = m.init(jax.random.PRNGKey(0), graph)
        w = m.apply(params, graph)["W"]
        assert w.shape == (N_EDGES,)
        assert (np.asarray(w) > 0).all() and (np.asarray(w) < 1).all()
    gef = GeometricEF(phi_slope_max=0.1, z0_max=100.0, dR_max=2.0)
    mask = gef(graph)
    assert mask.shape == (N_EDGES,)
    assert mask.dtype == bool


def test_graph_construction_models(graph):
    for m in [
        GraphConstructionFCNN(in_dim=NODE_DIM, hidden_dim=16, out_dim=8, depth=2),
        GraphConstructionHeteroResFCNN(in_dim=NODE_DIM, hidden_dim=16, out_dim=8, depth=2),
        GraphConstructionHeteroEncResFCNN(
            in_dim=NODE_DIM, hidden_dim_enc=16, hidden_dim=16, out_dim=8, depth_enc=2, depth=2
        ),
    ]:
        params = m.init(jax.random.PRNGKey(0), graph)
        out = m.apply(params, graph)
        assert out["H"].shape == (N_NODES, 8)


def test_graph_construction_resin():
    g = make_graph()
    m = GraphConstructionResIN(node_indim=NODE_DIM, edge_indim=EDGE_DIM, h_outdim=8, hidden_dim=16)
    params = m.init(jax.random.PRNGKey(0), g)
    out = m.apply(params, g)
    assert out["H"].shape == (N_NODES, 8)


def test_ml_graph_construction(graph):
    ml = GraphConstructionFCNN(in_dim=NODE_DIM, hidden_dim=16, out_dim=8, depth=2)
    m = MLGraphConstruction(ml=ml, max_radius=10.0, max_num_neighbors=8)
    params = m.init(jax.random.PRNGKey(0), graph)
    out = m.apply(params, graph)
    assert out.edge_index.shape[0] == 2
    assert out.edge_attr.shape[1] == 2 * NODE_DIM
    # truth labels consistent with particle ids
    ei = np.asarray(out.edge_index)
    mask = np.asarray(out.edge_mask)
    pid = np.asarray(out.particle_id)
    y = np.asarray(out.y)
    expect = (pid[ei[0]] == pid[ei[1]]) & (pid[ei[0]] > 0)
    np.testing.assert_array_equal(y[mask], expect[mask])


def test_mlpc_transformer(graph):
    ml = GraphConstructionFCNN(in_dim=NODE_DIM, hidden_dim=16, out_dim=8, depth=2)
    m = MLPCTransformer(model=ml, original_features=True)
    params = m.init(jax.random.PRNGKey(0), graph)
    out = m.apply(params, graph)
    assert out.x.shape == (N_NODES, 8 + NODE_DIM)


def test_noise_classification(graph):
    wrapped = WithNoiseClassification(
        noise_model=TruthNoiseClassifierModel(),
        model=GraphTCNForMLGCPipeline(h_dim=4, e_dim=4, hidden_dim=12, L_hc=2),
    )
    params = wrapped.init(jax.random.PRNGKey(0), graph)
    out = wrapped.apply(params, graph)
    hm = np.asarray(out["hit_mask"])
    np.testing.assert_array_equal(hm, np.asarray(graph.particle_id) != 0)


def test_point_cloud_tcn():
    g = make_graph(n=40, e=10)
    m = PointCloudTCN(node_indim=NODE_DIM, h_dim=6, e_dim=6, h_outdim=3, hidden_dim=16, N_blocks=2, L=2)
    params = m.init(jax.random.PRNGKey(0), g)
    out = m.apply(params, g)
    assert out["H"].shape == (40, 3)
    assert out["B"].shape == (40,)


def test_dynamic_edge_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(30, 6)))
    m = DynamicEdgeConv(mlp=MLP(output_size=8, hidden_dim=16), k=4)
    params = m.init(jax.random.PRNGKey(0), x)
    h, ei, mask = m.apply(params, x)
    assert h.shape == (30, 8)
    assert ei.shape == (2, 30 * 4)


def test_tcn_padding_invariance():
    """Padded nodes/edges must not change outputs for valid entries."""
    g = make_graph()
    gp = g.pad_to(N_NODES + 20, N_EDGES + 50)
    m = GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2)
    params = m.init(jax.random.PRNGKey(0), g)
    out = m.apply(params, g)
    out_p = m.apply(params, gp)
    np.testing.assert_allclose(
        np.asarray(out["H"]), np.asarray(out_p["H"])[:N_NODES], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out["W"]), np.asarray(out_p["W"])[:N_EDGES], rtol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(out["ec_edge_mask"]), np.asarray(out_p["ec_edge_mask"])[:N_EDGES]
    )


def test_resin_skip2_with_batchnorm(graph):
    m = ResIN(
        node_dim=NODE_DIM,
        edge_dim=EDGE_DIM,
        n_layers=4,
        residual_type="skip2",
        add_bn=True,
    )
    params = m.init(jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr)
    x, e, _ = m.apply(
        params, graph.x, graph.edge_index, graph.edge_attr, graph.edge_mask,
        graph.node_mask,
    )
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(e)).all()


def test_masked_batchnorm_running_stats_match_torch():
    """Train/eval semantics of MaskedBatchNorm must match torch BatchNorm1d:
    batch statistics + running-average updates when ``batch_stats`` is
    mutable, stored running averages otherwise (momentum 0.1, unbiased
    variance in the running update — reference uses nn.BatchNorm1d in
    Skip2ResidualNetwork, resin.py:143-151)."""
    import torch

    from gnn_tracking_tpu.models.resin import MaskedBatchNorm

    rng = np.random.default_rng(0)
    n, f, pad = 50, 6, 13
    m = MaskedBatchNorm()
    x0 = rng.normal(size=(n, f)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    bs = variables["batch_stats"]

    ref = torch.nn.BatchNorm1d(f, momentum=0.1)
    ref.train()
    for seed in (1, 2, 3):
        x = rng.normal(size=(n, f)).astype(np.float32) + seed
        xp = np.concatenate([x, np.full((pad, f), 7.0, np.float32)])
        mask = np.arange(n + pad) < n
        y, new_vars = m.apply(
            {"params": variables["params"], "batch_stats": bs},
            jnp.asarray(xp),
            jnp.asarray(mask),
            mutable=["batch_stats"],
        )
        bs = new_vars["batch_stats"]
        y_ref = ref(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(y)[:n], y_ref, rtol=1e-4, atol=1e-5)
        # padded rows pass through unchanged
        np.testing.assert_array_equal(np.asarray(y)[n:], xp[n:])
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), ref.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bs["var"]), ref.running_var.numpy(), rtol=1e-4, atol=1e-6
    )

    # eval: stored running averages normalize (no mutable collection)
    ref.eval()
    x = rng.normal(size=(n, f)).astype(np.float32)
    y_eval = m.apply(
        {"params": variables["params"], "batch_stats": bs}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(y_eval),
        ref(torch.from_numpy(x)).detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )

    # stateless fallback: no collection provided -> per-call batch statistics
    y_stateless = m.apply({"params": variables["params"]}, jnp.asarray(x))
    ref.train()
    y_ref = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y_stateless), y_ref, rtol=1e-4, atol=1e-5)


def test_sorted_edges_path_matches(graph):
    """sorted_edges promise + sort_edges_by_target must not change outputs."""
    gs = graph.sort_edges_by_target()
    ei = np.asarray(gs.edge_index)
    assert (np.diff(ei[1]) >= 0).all()
    m = ECForGraphTCN(interaction_node_dim=5, interaction_edge_dim=4, L_ec=2)
    ms = ECForGraphTCN(
        interaction_node_dim=5, interaction_edge_dim=4, L_ec=2, sorted_edges=True
    )
    params = m.init(jax.random.PRNGKey(0), graph)
    w_ref = np.asarray(m.apply(params, graph)["W"])
    w_sorted = np.asarray(ms.apply(params, gs)["W"])
    # outputs are per-edge: compare through the permutation
    key = np.where(np.asarray(graph.edge_mask), np.asarray(graph.edge_index)[1], graph.num_nodes)
    order = np.argsort(key, kind="stable")
    np.testing.assert_allclose(w_ref[order], w_sorted, rtol=1e-6)


def test_split_relational_matches_fused(graph):
    """``split_relational=True`` computes the identical function: the three
    split kernels are the row-blocks of the fused first-linear kernel."""
    from gnn_tracking_tpu.models.interaction_network import InteractionNetwork

    f = graph.x.shape[-1]
    fused = InteractionNetwork(
        node_outdim=6, edge_outdim=5, node_hidden_dim=16, edge_hidden_dim=16
    )
    split = InteractionNetwork(
        node_outdim=6, edge_outdim=5, node_hidden_dim=16, edge_hidden_dim=16,
        split_relational=True,
    )
    vf = fused.init(
        jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr
    )["params"]
    rel = vf["relational_model"]
    w0 = rel["TorchLinear_0"]["kernel"]
    params_split = {
        "relational_dst": {
            "kernel": w0[:f],
            "bias": rel["TorchLinear_0"]["bias"],
        },
        "relational_src": {"kernel": w0[f : 2 * f]},
        "relational_edge": {"kernel": w0[2 * f :]},
        "relational_rest": {
            "TorchLinear_0": rel["TorchLinear_1"],
            "TorchLinear_1": rel["TorchLinear_2"],
        },
        "object_model": vf["object_model"],
    }
    xf, ef = fused.apply(
        {"params": vf}, graph.x, graph.edge_index, graph.edge_attr, graph.edge_mask
    )
    xs, es = split.apply(
        {"params": params_split},
        graph.x,
        graph.edge_index,
        graph.edge_attr,
        graph.edge_mask,
    )
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xf), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(es), np.asarray(ef), rtol=1e-5, atol=1e-6)


def test_split_relational_ec_trains(graph):
    """ECForGraphTCN with split_relational initializes and runs forward."""
    m = ECForGraphTCN(
        interaction_node_dim=5, interaction_edge_dim=4, L_ec=2, split_relational=True
    )
    params = m.init(jax.random.PRNGKey(0), graph)
    w = m.apply(params, graph)["W"]
    w = np.asarray(w)
    assert w.shape == (graph.num_edges,)
    assert ((w > 0) & (w < 1)).all()


def test_resin_remat_matches(graph):
    """remat (gradient checkpointing) must not change outputs or gradients."""
    kw = dict(node_dim=NODE_DIM, edge_dim=EDGE_DIM, n_layers=3)
    m0 = ResIN(**kw)
    m1 = ResIN(**kw, remat=True)
    params = m0.init(jax.random.PRNGKey(0), graph.x, graph.edge_index, graph.edge_attr)

    def loss(m, p):
        x, e, _ = m.apply(p, graph.x, graph.edge_index, graph.edge_attr, graph.edge_mask)
        return jnp.sum(x**2) + jnp.sum(e**2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
