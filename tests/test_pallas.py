"""Pallas kernel tests (interpret mode on CPU; numerics checked against the
XLA reference implementation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk
from gnn_tracking_tpu.ops.pallas.pairwise_topk import (
    pairwise_topk,
    pairwise_topk_streaming,
)


@pytest.mark.parametrize("n,k", [(100, 4), (300, 8)])
def test_pairwise_topk_matches_xla(n, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, k, node_mask=None, batch=None, loop=False, block_size=128
    )
    d_pl, i_pl = pairwise_topk(x, k=k, block_q=64, block_c=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_ref, dtype=np.float32), rtol=1e-4, atol=1e-4
    )
    # index sets must match per row (order may differ on ties)
    for a, b in zip(np.asarray(i_pl), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


@pytest.mark.parametrize("n,k", [(100, 4), (300, 8)])
def test_pairwise_topk_streaming_matches_xla(n, k):
    """The HBM-streaming 2-D-grid variant must agree with the XLA path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, k, node_mask=None, batch=None, loop=False, block_size=128
    )
    d_pl, i_pl = pairwise_topk_streaming(
        x, k=k, block_q=64, block_c=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_ref, dtype=np.float32), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(np.asarray(i_pl), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_pairwise_topk_streaming_masked():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(70, 4)).astype(np.float32)
    mask = np.arange(70) < 50
    d_pl, i_pl = pairwise_topk_streaming(
        jnp.asarray(x), k=3, node_mask=jnp.asarray(mask), block_q=32, block_c=32,
        interpret=True,
    )
    d_ref, _ = pairwise_topk_streaming(
        jnp.asarray(x[:50]), k=3, block_q=32, block_c=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d_pl)[:50], np.asarray(d_ref), rtol=1e-5)
    assert not np.isfinite(np.asarray(d_pl)[50:]).any()


def test_pairwise_topk_masked():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(60, 4)).astype(np.float32)
    mask = np.arange(60) < 40
    d_pl, i_pl = pairwise_topk(
        jnp.asarray(x), k=3, node_mask=jnp.asarray(mask), block_q=32, block_c=32,
        interpret=True,
    )
    d_ref, i_ref = pairwise_topk(
        jnp.asarray(x[:40]), k=3, block_q=32, block_c=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d_pl)[:40], np.asarray(d_ref), rtol=1e-5)
    assert not np.isfinite(np.asarray(d_pl)[40:]).any()


def _sorted_setup(n=512, e=2048, f=16, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    msgs = rng.normal(size=(e, f)).astype(np.float32)
    return jnp.asarray(msgs), jnp.asarray(dst), n


def test_sorted_segment_sum_matches_xla():
    from gnn_tracking_tpu.ops.pallas.csr_segment import (
        max_window_spread,
        sorted_segment_sum,
    )
    import jax

    msgs, dst, n = _sorted_setup()
    assert max_window_spread(np.asarray(dst), 256) <= 512
    out = sorted_segment_sum(msgs, dst, n, 256, 512, True)
    ref = jax.ops.segment_sum(msgs, dst, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sorted_segment_sum_grad():
    from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_segment_sum
    import jax

    msgs, dst, n = _sorted_setup(seed=1)

    def f_pl(m):
        return (sorted_segment_sum(m, dst, n, 256, 512, True) ** 2).sum()

    def f_ref(m):
        return (jax.ops.segment_sum(m, dst, num_segments=n) ** 2).sum()

    g_pl = jax.grad(f_pl)(msgs)
    g_ref = jax.grad(f_ref)(msgs)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_sorted_gather_and_grad():
    from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_gather
    import jax

    rng = np.random.default_rng(2)
    n, e, f = 512, 2048, 16
    dst = jnp.asarray(np.sort(rng.integers(0, n, size=e)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    out = sorted_gather(vals, dst, 256, 512, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals[dst]), rtol=1e-6)

    g_pl = jax.grad(lambda v: (sorted_gather(v, dst, 256, 512, True) ** 2).sum())(vals)
    g_ref = jax.grad(lambda v: (v[dst] ** 2).sum())(vals)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_interaction_network_pallas_segment_matches():
    import jax

    from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
    from tests.test_models import make_graph

    g = make_graph(0, n=256, e=1024).sort_edges_by_target()
    m_ref = InteractionNetwork(node_outdim=5, edge_outdim=4, sorted_edges=True)
    m_pl = InteractionNetwork(
        node_outdim=5, edge_outdim=4, sorted_edges=True, segment_impl="pallas_sorted"
    )
    params = m_ref.init(jax.random.PRNGKey(0), g.x, g.edge_index, g.edge_attr)
    x1, e1 = m_ref.apply(params, g.x, g.edge_index, g.edge_attr, g.edge_mask)
    x2, e2 = m_pl.apply(params, g.x, g.edge_index, g.edge_attr, g.edge_mask)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-4, atol=1e-5)


def test_validate_pallas_segment():
    from gnn_tracking_tpu.ops.pallas.csr_segment import validate_pallas_segment
    from tests.test_models import make_graph

    g = make_graph(0, n=256, e=1024).sort_edges_by_target()
    validate_pallas_segment(g, block_e=256, window=512)  # fine
    with pytest.raises(ValueError, match="not sorted"):
        validate_pallas_segment(make_graph(0, n=256, e=1024), block_e=256)
    with pytest.raises(ValueError, match="divisible"):
        validate_pallas_segment(g, block_e=999)


def test_pairwise_topk_large_k():
    """k=64 (the radius-graph condensation configuration that hits an
    internal Mosaic assert on hardware) — algorithmically exact in interpret
    mode, so the TPU failure is compile-level, not logic."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, 64, node_mask=None, batch=None, loop=False, block_size=128
    )
    d_pl, i_pl = pairwise_topk(x, k=64, block_q=64, block_c=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_ref, dtype=np.float32), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(np.asarray(i_pl), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_pairwise_topk_batched():
    """Batched events: neighbors must never cross batch boundaries and must
    equal the XLA batched path."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(120, 6)).astype(np.float32))
    batch = jnp.asarray(np.repeat([0, 1, 2], 40).astype(np.int32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, 5, node_mask=None, batch=batch, loop=False, block_size=64
    )
    d_pl, i_pl = pairwise_topk(
        x, k=5, batch=batch, block_q=32, block_c=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_ref, dtype=np.float32), rtol=1e-4, atol=1e-4
    )
    b = np.asarray(batch)
    for row, (ids, ds) in enumerate(zip(np.asarray(i_pl), np.asarray(d_pl))):
        for j, dv in zip(ids, ds):
            if np.isfinite(dv):
                assert b[j] == b[row]
    for a, bb in zip(np.asarray(i_pl), np.asarray(i_ref)):
        assert set(a.tolist()) == set(bb.tolist())
