"""End-to-end EC parity: segment_impl='fused' vs 'xla' with converted params."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
from gnn_tracking_tpu.ops.pallas.slab_layout import apply_slab_layout, default_spec
from gnn_tracking_tpu.utils.param_convert import fused_to_mlp, mlp_to_fused

W, EB = 64, 32


def _graph(seed=0, n=280, e=1600):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 14)).astype(np.float32)
    dst = rng.integers(0, n, size=e)
    src = np.clip(dst + rng.integers(-40, 40, size=e), 0, n - 1)
    far = rng.random(e) < 0.05
    src = np.where(far, rng.integers(0, n, size=e), src)
    ea = rng.normal(size=(e, 4)).astype(np.float32)
    y = (rng.random(e) < 0.3).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=np.stack([src, dst]).astype(np.int32), edge_attr=ea, y=y
    )
    spec = default_spec(n, e, window=W, block_e=EB)
    return apply_slab_layout(g, spec)


def _model(impl):
    return ECForGraphTCN(
        interaction_node_dim=12,
        interaction_edge_dim=8,
        hidden_dim=24,
        L_ec=3,
        sorted_edges=False,
        segment_impl=impl,
        fused_window=W,
        fused_block=EB,
        fused_dtype="float32",
    )


def test_fused_ec_matches_xla():
    g = _graph()
    m_xla, m_fused = _model("xla"), _model("fused")
    params = m_xla.init(jax.random.PRNGKey(0), g)
    params_f = mlp_to_fused(jax.tree.map(lambda v: v, params))
    out_x = m_xla.apply(params, g)
    out_f = m_fused.apply(params_f, g)
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out_f["W"])[mask], np.asarray(out_x["W"])[mask],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["node_embedding"]), np.asarray(out_x["node_embedding"]),
        rtol=1e-3, atol=1e-3,
    )
    # round-trip converter is the identity
    back = fused_to_mlp(params_f)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_ec_gradients():
    g = _graph(seed=1)
    m_fused = _model("fused")
    m_xla = _model("xla")
    params = m_xla.init(jax.random.PRNGKey(1), g)
    params_f = mlp_to_fused(params)

    def loss_f(p):
        w = m_fused.apply(p, g)["W"]
        return jnp.sum(jnp.where(g.edge_mask, (w - g.y) ** 2, 0))

    def loss_x(p):
        w = m_xla.apply(p, g)["W"]
        return jnp.sum(jnp.where(g.edge_mask, (w - g.y) ** 2, 0))

    gf = jax.grad(loss_f)(params_f)
    gx = mlp_to_fused(jax.grad(loss_x)(params))
    lf = jax.tree_util.tree_leaves_with_path(gf)
    lx = jax.tree_util.tree_leaves_with_path(gx)
    assert len(lf) == len(lx)
    for (pa, a), (pb, b) in zip(lf, lx):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=str(pa),
        )


def test_fused_ec_trains():
    """A few adam steps reduce the focal loss (sanity: kernel grads train)."""
    import optax

    from gnn_tracking_tpu.losses.ec import binary_focal_loss

    g = _graph(seed=2)
    model = _model("fused")
    params = model.init(jax.random.PRNGKey(2), g)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            w = model.apply(p, g)["W"].astype(jnp.float32)
            return binary_focal_loss(
                inpt=w, target=g.y.astype(jnp.float32), mask=g.edge_mask
            )

        l, grads = jax.value_and_grad(lf)(p)
        up, o = tx.update(grads, o, p)
        return optax.apply_updates(p, up), o, l

    losses = []
    for _ in range(30):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.98, losses[:3] + losses[-3:]


def _graph_flat(seed=0, n=280, e=1600):
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout,
        flat_blocks_cap,
    )

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 14)).astype(np.float32)
    dst = rng.integers(0, n, size=e)
    src = np.clip(dst + rng.integers(-40, 40, size=e), 0, n - 1)
    far = rng.random(e) < 0.05
    src = np.where(far, rng.integers(0, n, size=e), src)
    ea = rng.normal(size=(e, 4)).astype(np.float32)
    y = (rng.random(e) < 0.3).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=np.stack([src, dst]).astype(np.int32), edge_attr=ea, y=y
    )
    spec = default_spec(n, e, window=W, block_e=EB)
    return apply_flat_slab_layout(g, spec, blocks_cap=flat_blocks_cap(n, e, spec))


@pytest.mark.parametrize("impl", ["fused_flat", "fused_flat_t", "fused_stack_t"])
def test_fused_flat_ec_matches_xla(impl):
    """segment_impl='fused_flat'/'fused_flat_t' == 'xla' on the flat graph."""
    g = _graph_flat()
    m_xla, m_flat = _model("xla"), _model(impl)
    params = m_xla.init(jax.random.PRNGKey(0), g)
    params_f = mlp_to_fused(params)
    out_x = m_xla.apply(params, g)
    out_f = m_flat.apply(params_f, g)
    mask = np.asarray(g.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out_f["W"])[mask], np.asarray(out_x["W"])[mask],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["node_embedding"]), np.asarray(out_x["node_embedding"]),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("impl", ["fused_flat", "fused_flat_t", "fused_stack_t"])
def test_fused_flat_ec_gradients(impl):
    g = _graph_flat(seed=1)
    m_flat, m_xla = _model(impl), _model("xla")
    params = m_xla.init(jax.random.PRNGKey(1), g)
    params_f = mlp_to_fused(params)

    def loss_f(p):
        w = m_flat.apply(p, g)["W"]
        return jnp.sum(jnp.where(g.edge_mask, (w - g.y) ** 2, 0))

    def loss_x(p):
        w = m_xla.apply(p, g)["W"]
        return jnp.sum(jnp.where(g.edge_mask, (w - g.y) ** 2, 0))

    gf = jax.grad(loss_f)(params_f)
    gx = mlp_to_fused(jax.grad(loss_x)(params))
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3)


def test_padding_config_flat_layout():
    """PaddingConfig(slab_layout='flat') produces bucket-stable shapes that
    the fused_flat model consumes."""
    from gnn_tracking_tpu.utils.loading import PaddingConfig

    cfg = PaddingConfig(
        node_bucket=128, edge_bucket=512, true_edge_bucket=512,
        slab_window=W, slab_block=EB, slab_layout="flat",
    )
    shapes = set()
    for seed, e in [(0, 900), (1, 1000), (2, 700)]:
        rng = np.random.default_rng(seed)
        n = 280
        x = rng.normal(size=(n, 14)).astype(np.float32)
        dst = rng.integers(0, n, size=e)
        src = np.clip(dst + rng.integers(-40, 40, size=e), 0, n - 1)
        g = EventGraph.from_arrays(
            x=x,
            edge_index=np.stack([src, dst]).astype(np.int32),
            edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
            y=(rng.random(e) < 0.3).astype(np.float32),
        )
        gp = cfg.pad(g)
        shapes.add((gp.num_nodes, gp.num_edges, gp.edge_attr.shape[0]))
        assert "slab_block_slab" in gp.extras
        m = _model("fused_flat")
        params = m.init(jax.random.PRNGKey(seed), gp)
        out = m.apply(params, gp)
        assert np.isfinite(np.asarray(out["W"])).all()
    # events in the same (1024-edge) bucket share one shape signature
    assert len(shapes) == 1, shapes
