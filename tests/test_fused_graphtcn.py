"""Full GraphTCN parity: segment_impl='fused' vs 'xla' through the EC cut.

Exercises the dynamic edge-mask folding of the fused kernel (the HC stack
runs under the post-EC-cut mask, ``ModularGraphTCN`` →
``InteractionNetwork._fused``) and the wrapper-level plumbing added for
round 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCN,
    PerfectECGraphTCN,
)
from gnn_tracking_tpu.ops.pallas.slab_layout import apply_slab_layout, default_spec
from gnn_tracking_tpu.utils.param_convert import mlp_to_fused

W, EB = 64, 32


def _graph(seed=0, n=280, e=1600):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 14)).astype(np.float32)
    dst = rng.integers(0, n, size=e)
    src = np.clip(dst + rng.integers(-40, 40, size=e), 0, n - 1)
    ea = rng.normal(size=(e, 4)).astype(np.float32)
    pid = rng.integers(0, 40, size=n)
    y = (pid[src] == pid[dst]).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=np.stack([src, dst]).astype(np.int32), edge_attr=ea,
        y=y, particle_id=pid,
    )
    return apply_slab_layout(g, default_spec(n, e, window=W, block_e=EB))


def _models(cls, **kw):
    common = dict(
        h_dim=12, e_dim=8, h_outdim=4, hidden_dim=24, L_hc=2,
        fused_window=W, fused_block=EB, fused_dtype="float32", **kw
    )
    return cls(segment_impl="xla", **common), cls(segment_impl="fused", **common)


def test_graphtcn_fused_matches_xla_through_ec_cut():
    g = _graph()
    m_xla, m_fused = _models(GraphTCN, L_ec=2, ec_threshold=0.4)
    params = m_xla.init(jax.random.PRNGKey(0), g)
    params_f = mlp_to_fused(params)
    out_x = m_xla.apply(params, g)
    out_f = m_fused.apply(params_f, g)
    # identical EC cut on both sides
    np.testing.assert_array_equal(
        np.asarray(out_f["ec_edge_mask"]), np.asarray(out_x["ec_edge_mask"])
    )
    assert np.asarray(out_x["ec_edge_mask"]).sum() > 0
    assert (~np.asarray(out_x["ec_edge_mask"])).sum() > 0  # cut is active
    for key in ("H", "B"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_x[key]), rtol=2e-3, atol=2e-3
        )


def test_perfect_ec_graphtcn_fused_matches_xla():
    g = _graph(seed=1)
    m_xla, m_fused = _models(PerfectECGraphTCN, ec_tpr=0.9, ec_tnr=0.95)
    params = m_xla.init(jax.random.PRNGKey(1), g)
    params_f = mlp_to_fused(params)
    out_x = m_xla.apply(params, g, rngs={"perfect_ec": jax.random.PRNGKey(7)})
    out_f = m_fused.apply(params_f, g, rngs={"perfect_ec": jax.random.PRNGKey(7)})
    np.testing.assert_array_equal(
        np.asarray(out_f["ec_edge_mask"]), np.asarray(out_x["ec_edge_mask"])
    )
    for key in ("H", "B"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_x[key]), rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("impl", ["fused_flat_t", "fused_stack_t"])
def test_graphtcn_fused_flat_t_matches_xla_through_ec_cut(impl):
    """Same EC-cut mask-folding parity on the transposed flat kernel and
    the cross-layer stack."""
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout,
        flat_blocks_cap,
    )

    rng = np.random.default_rng(3)
    n, e = 280, 1600
    x = rng.normal(size=(n, 14)).astype(np.float32)
    dst = rng.integers(0, n, size=e)
    src = np.clip(dst + rng.integers(-40, 40, size=e), 0, n - 1)
    pid = rng.integers(0, 40, size=n)
    y = (pid[src] == pid[dst]).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=np.stack([src, dst]).astype(np.int32),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=y, particle_id=pid,
    )
    spec = default_spec(n, e, window=W, block_e=EB)
    g = apply_flat_slab_layout(g, spec, blocks_cap=flat_blocks_cap(n, e, spec))
    common = dict(
        h_dim=12, e_dim=8, h_outdim=4, hidden_dim=24, L_hc=2,
        fused_window=W, fused_block=EB, fused_dtype="float32",
        L_ec=2, ec_threshold=0.4,
    )
    m_xla = GraphTCN(segment_impl="xla", **common)
    m_t = GraphTCN(segment_impl=impl, **common)
    params = m_xla.init(jax.random.PRNGKey(3), g)
    params_t = mlp_to_fused(params)
    out_x = m_xla.apply(params, g)
    out_t = m_t.apply(params_t, g)
    np.testing.assert_array_equal(
        np.asarray(out_t["ec_edge_mask"]), np.asarray(out_x["ec_edge_mask"])
    )
    assert np.asarray(out_x["ec_edge_mask"]).sum() > 0
    assert (~np.asarray(out_x["ec_edge_mask"])).sum() > 0
    for key in ("H", "B"):
        np.testing.assert_allclose(
            np.asarray(out_t[key]), np.asarray(out_x[key]), rtol=2e-3, atol=2e-3
        )


def test_graphtcn_fused_gradients_finite():
    g = _graph(seed=2)
    _, m_fused = _models(GraphTCN, L_ec=2)
    params = m_fused.init(jax.random.PRNGKey(2), g)

    def loss(p):
        out = m_fused.apply(p, g)
        return jnp.sum(out["H"] ** 2) + jnp.sum(out["B"])

    grads = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
