"""Equivalence tests for the TPU-native graph kernels against host references
(sklearn / networkx / numpy) — the analog of the reference's
``tests/test_fastrescanner.py`` exact-equality strategy."""

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest
from sklearn.cluster import DBSCAN
from sklearn.neighbors import NearestNeighbors

from gnn_tracking_tpu.ops import (
    connected_components,
    dbscan,
    knn_graph,
    radius_graph,
)
from gnn_tracking_tpu.ops.segment import (
    masked_segment_max,
    masked_segment_mean,
    masked_segment_sum,
)


def _edge_set(edge_index, mask):
    ei = np.asarray(edge_index)[:, np.asarray(mask)]
    return {(int(a), int(b)) for a, b in ei.T}


@pytest.mark.parametrize("n,k", [(50, 3), (200, 7)])
def test_knn_graph_matches_sklearn(n, k):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(n, 3))
    edge_index, mask, dists = knn_graph(jnp.asarray(x), k)
    nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
    _, idx = nn.kneighbors(x)
    expected = {(int(j), int(i)) for i, row in enumerate(idx) for j in row[1:]}
    assert _edge_set(edge_index, mask) == expected
    # distances match
    d = np.asarray(dists).reshape(n, k)
    dref = np.sort(nn.kneighbors(x)[0][:, 1:], axis=1)
    np.testing.assert_allclose(np.sort(d, axis=1), dref, rtol=1e-6)


def test_knn_graph_with_padding_mask():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(30, 3))
    x_pad = np.concatenate([x, np.zeros((10, 3))])
    node_mask = np.arange(40) < 30
    ei_pad, m_pad, _ = knn_graph(jnp.asarray(x_pad), 4, node_mask=jnp.asarray(node_mask))
    ei, m, _ = knn_graph(jnp.asarray(x), 4)
    assert _edge_set(ei_pad, m_pad) == _edge_set(ei, m)


@pytest.mark.parametrize("r", [0.5, 1.0])
def test_radius_graph_matches_sklearn(r):
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(100, 3))
    edge_index, mask, _ = radius_graph(jnp.asarray(x), r, max_num_neighbors=100)
    nn = NearestNeighbors(radius=r).fit(x)
    idx = nn.radius_neighbors(x, return_distance=False)
    expected = {
        (int(j), int(i)) for i, row in enumerate(idx) for j in row if j != i
    }
    assert _edge_set(edge_index, mask) == expected


def test_batched_knn_respects_batch_boundaries():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(60, 2))
    batch = np.repeat([0, 1, 2], 20)
    ei, mask, _ = knn_graph(jnp.asarray(x), 5, batch=jnp.asarray(batch))
    ei_np, mask_np = np.asarray(ei), np.asarray(mask)
    src_b = batch[ei_np[0, mask_np]]
    dst_b = batch[ei_np[1, mask_np]]
    assert (src_b == dst_b).all()


def test_connected_components_matches_networkx():
    rng = np.random.default_rng(11)
    n = 200
    edges = rng.integers(0, n, size=(2, 150))
    labels = np.asarray(connected_components(jnp.asarray(edges, dtype=jnp.int32), n))
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges.T)
    for comp in nx.connected_components(g):
        comp = sorted(comp)
        assert len({labels[c] for c in comp}) == 1
        assert labels[comp[0]] == comp[0]


def test_connected_components_edge_mask():
    edges = jnp.asarray([[0, 2], [1, 3]], dtype=jnp.int32)
    mask = jnp.asarray([True, False])
    labels = np.asarray(connected_components(edges, 4, edge_mask=mask))
    assert labels[0] == labels[1]
    assert labels[2] != labels[3]


@pytest.mark.parametrize("eps,min_samples", [(0.1, 1), (0.2, 3), (0.15, 5)])
def test_dbscan_matches_sklearn_exactly(eps, min_samples):
    rng = np.random.default_rng(23)
    x = rng.uniform(size=(300, 2))
    ours = np.asarray(dbscan(jnp.asarray(x), eps=eps, min_samples=min_samples, max_num_neighbors=300))
    ref = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(x)
    np.testing.assert_array_equal(ours, ref)


def test_dbscan_with_padding():
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(100, 2))
    x_pad = np.concatenate([x, np.zeros((28, 2))])
    node_mask = np.arange(128) < 100
    ours = np.asarray(
        dbscan(
            jnp.asarray(x_pad),
            eps=0.15,
            min_samples=3,
            max_num_neighbors=128,
            node_mask=jnp.asarray(node_mask),
        )
    )
    ref = DBSCAN(eps=0.15, min_samples=3).fit_predict(x)
    np.testing.assert_array_equal(ours[:100], ref)
    assert (ours[100:] == -1).all()


def test_masked_segment_ops():
    vals = jnp.asarray([[1.0], [2.0], [3.0], [100.0]])
    seg = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, True, True, False])
    np.testing.assert_allclose(
        np.asarray(masked_segment_sum(vals, seg, 3, mask)), [[3.0], [3.0], [0.0]]
    )
    np.testing.assert_allclose(
        np.asarray(masked_segment_max(vals, seg, 3, mask)), [[2.0], [3.0], [0.0]]
    )
    np.testing.assert_allclose(
        np.asarray(masked_segment_mean(vals, seg, 3, mask)), [[1.5], [3.0], [0.0]]
    )


def test_dbscan_fast_path_matches_generic():
    """The scatter-free fixed-degree DBSCAN path must agree with the generic
    segment-op path (and sklearn) for capped neighbor graphs."""
    import jax.numpy as jnp
    from sklearn.cluster import DBSCAN

    from gnn_tracking_tpu.ops.dbscan import dbscan_from_graph
    from gnn_tracking_tpu.ops.knn import radius_graph

    rng = np.random.default_rng(7)
    # clustered data so a cap of 32 exceeds the densest eps-neighborhood
    centers = rng.normal(scale=6.0, size=(12, 3))
    x = (centers[rng.integers(0, 12, 300)] + 0.3 * rng.normal(size=(300, 3))).astype(
        np.float32
    )
    cap = 32
    ei, em, d = radius_graph(jnp.asarray(x), 1.0, max_num_neighbors=cap)
    for eps, ms in ((0.5, 1), (0.8, 4), (1.0, 8)):
        fast = np.asarray(
            dbscan_from_graph(
                ei, d, 300, eps=eps, min_samples=ms, edge_mask=em, neighbor_cap=cap
            )
        )
        generic = np.asarray(
            dbscan_from_graph(ei, d, 300, eps=eps, min_samples=ms, edge_mask=em)
        )
        np.testing.assert_array_equal(fast, generic)
        ref = DBSCAN(eps=eps, min_samples=ms).fit_predict(x)
        np.testing.assert_array_equal(fast, ref)


def test_sorted_take_matches_plain_gather_and_grad():
    """sorted_take: same values and cotangents as x[idx] (sorted indices)."""
    import jax
    import numpy as np

    from gnn_tracking_tpu.ops.segment import sorted_take

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(50, 7)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, 50, size=300)).astype(np.int32))

    np.testing.assert_array_equal(
        np.asarray(sorted_take(x, idx)), np.asarray(x[idx])
    )

    def f_sorted(x):
        return jnp.sum(jnp.sin(sorted_take(x, idx)) * 2.0)

    def f_plain(x):
        return jnp.sum(jnp.sin(x[idx]) * 2.0)

    g_s = jax.grad(f_sorted)(x)
    g_p = jax.grad(f_plain)(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_p), rtol=1e-6)


def test_take_sorted_by_matches_plain_gather_and_grad():
    """take_sorted_by: same values/grads as x[idx] via a precomputed sort."""
    import jax
    import numpy as np

    from gnn_tracking_tpu.ops.segment import take_sorted_by

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(40, 5)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=200).astype(np.int32))
    perm = jnp.argsort(idx, stable=True).astype(jnp.int32)
    idx_sorted = idx[perm]

    np.testing.assert_array_equal(
        np.asarray(take_sorted_by(x, idx, perm, idx_sorted)), np.asarray(x[idx])
    )
    g_s = jax.grad(lambda x: jnp.sum(jnp.cos(take_sorted_by(x, idx, perm, idx_sorted))))(x)
    g_p = jax.grad(lambda x: jnp.sum(jnp.cos(x[idx])))(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_p), rtol=1e-6)


@pytest.mark.parametrize(
    "n,k,chunk", [(100, 4, 64), (300, 8, 128), (500, 40, 128), (130, 3, 256)]
)
def test_hier_topk_matches_blocked(n, k, chunk):
    """_hier_block_topk (per-chunk TopK + merge TopK) must agree with the
    reference blocked path, including when k exceeds the chunk count and
    when n is not a chunk multiple."""
    from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk, _hier_block_topk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, k, node_mask=None, batch=None, loop=False, block_size=64
    )
    d_h, i_h = _hier_block_topk(
        x, k, node_mask=None, batch=None, loop=False, block_q=64, chunk=chunk
    )
    np.testing.assert_allclose(
        np.asarray(d_h), np.asarray(d_ref), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(np.asarray(i_h), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_hier_topk_masked_batched_loop():
    from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk, _hier_block_topk

    rng = np.random.default_rng(1)
    n = 170
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < 140)
    batch = jnp.asarray((np.arange(n) % 3).astype(np.int32))
    for loop in (False, True):
        d_ref, i_ref = _blocked_neighbor_topk(
            x, 5, node_mask=mask, batch=batch, loop=loop, block_size=64
        )
        d_h, i_h = _hier_block_topk(
            x, 5, node_mask=mask, batch=batch, loop=loop, block_q=64, chunk=64
        )
        np.testing.assert_allclose(
            np.asarray(d_h), np.asarray(d_ref), rtol=1e-4, atol=1e-4
        )
        fin = np.isfinite(np.asarray(d_ref))
        ih, ir = np.asarray(i_h), np.asarray(i_ref)
        for r in range(n):
            assert set(ih[r][fin[r]].tolist()) == set(ir[r][fin[r]].tolist())


def test_hier_topk_few_valid_neighbors():
    """Rows with fewer than k valid neighbors must pad with +inf."""
    from gnn_tracking_tpu.ops.knn import _hier_block_topk

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    mask = jnp.asarray(np.arange(40) < 4)
    d_h, _ = _hier_block_topk(
        x, 8, node_mask=mask, batch=None, loop=False, block_q=32, chunk=32
    )
    d0 = np.asarray(d_h)[0]
    assert np.isfinite(d0).sum() == 3  # 4 valid minus self
    assert np.all(np.isinf(d0[3:]))


@pytest.mark.parametrize("n,k", [(300, 8), (513, 16)])
def test_filter_topk_matches_blocked(n, k):
    """pairwise_topk_filter (survivor-filtered kernel, interpret mode) must
    agree with the reference blocked path; its distances come back sorted
    ascending."""
    from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, k, node_mask=None, batch=None, loop=False, block_size=64
    )
    d_f, i_f = pairwise_topk_filter(
        x, k=k, block_q=64, block_c=128, interpret=True
    )
    df = np.asarray(d_f)
    assert np.all(np.diff(df, axis=1) >= 0)  # sorted ascending
    np.testing.assert_allclose(
        df, np.sort(np.asarray(d_ref), axis=1), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(np.asarray(i_f), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_filter_topk_masked_batched_loop():
    from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    rng = np.random.default_rng(4)
    n = 170
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < 140)
    batch = jnp.asarray((np.arange(n) % 3).astype(np.int32))
    for loop in (False, True):
        d_ref, i_ref = _blocked_neighbor_topk(
            x, 5, node_mask=mask, batch=batch, loop=loop, block_size=64
        )
        d_f, i_f = pairwise_topk_filter(
            x, k=5, node_mask=mask, batch=batch, loop=loop,
            block_q=64, block_c=64, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(d_f), np.sort(np.asarray(d_ref), axis=1),
            rtol=1e-4, atol=1e-4,
        )
        fin = np.isfinite(np.asarray(d_f))
        i_f_, i_r_ = np.asarray(i_f), np.asarray(i_ref)
        for r in range(n):
            assert set(i_f_[r][fin[r]].tolist()) == set(
                i_r_[r][np.isfinite(np.asarray(d_ref)[r])].tolist()
            )


def test_filter_topk_few_valid_neighbors():
    """Rows with fewer than k valid neighbors must pad with +inf (and the
    tile-0 peel must not loop forever on all-inf rows)."""
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    mask = jnp.asarray(np.arange(40) < 4)
    d_f, _ = pairwise_topk_filter(
        x, k=8, node_mask=mask, block_q=32, block_c=32, interpret=True
    )
    d0 = np.asarray(d_f)[0]
    assert np.isfinite(d0).sum() == 3  # 4 valid minus self
    assert np.all(np.isinf(d0[3:]))


def test_radius_filter_matches_topk_mask():
    """radius2 mode of the filter kernel == top-k then mask d² <= r²
    (the radius_graph contract: nearest `cap` within radius, ascending,
    +inf padded)."""
    from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    rng = np.random.default_rng(6)
    n, k = 300, 8
    # clustered cloud: some rows have >k in-radius neighbors (cap binds),
    # some have none
    centers = rng.normal(size=(12, 4)).astype(np.float32) * 6
    x = jnp.asarray(
        centers[rng.integers(0, 12, size=n)]
        + 0.3 * rng.normal(size=(n, 4)).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n) < 260)
    batch = jnp.asarray((np.arange(n) % 2).astype(np.int32))
    for r in (0.5, 1.2):
        for loop in (False, True):
            d_ref, i_ref = _blocked_neighbor_topk(
                x, k, node_mask=mask, batch=batch, loop=loop, block_size=64
            )
            dr = np.sort(np.asarray(d_ref), axis=1)
            ir = np.take_along_axis(
                np.asarray(i_ref), np.argsort(np.asarray(d_ref), axis=1), 1
            )
            keep = dr <= r * r
            dr = np.where(keep, dr, np.inf)
            d_f, i_f = pairwise_topk_filter(
                x, k=k, node_mask=mask, batch=batch, loop=loop,
                block_q=64, block_c=64, interpret=True, radius2=r * r,
            )
            df = np.asarray(d_f)
            assert np.all(np.diff(np.where(np.isinf(df), 1e30, df), axis=1) >= 0)
            # f32 norm-expansion accumulation differs between kernel and
            # oracle by ~1e-4 relative; entries within that band of r² may
            # legitimately flip inclusion (boundary ties)
            fin_f, fin_r = np.isfinite(df), np.isfinite(dr)
            tie = np.abs(np.where(fin_f, df, np.where(fin_r, dr, r * r)) - r * r) <= 1e-3 * r * r
            both = fin_f & fin_r
            np.testing.assert_allclose(df[both], dr[both], rtol=1e-3, atol=1e-4)
            assert np.all((fin_f == fin_r) | tie)
            for row in range(n):
                got = set(np.asarray(i_f)[row][fin_f[row]].tolist())
                want = set(ir[row][keep[row]].tolist())
                if got != want:
                    # only boundary ties may differ
                    assert tie[row].any(), (row, got, want)


def test_radius_filter_inclusive_boundary():
    """d² == r² exactly must be INCLUDED (radius_graph masks dists <= r)."""
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    # integer grid: node 0 at origin, neighbors at exact distances 1, 2
    x = np.zeros((32, 2), np.float32)
    x[1] = [1.0, 0.0]
    x[2] = [0.0, 2.0]
    x[3:] = 100.0 + np.arange(29)[:, None]
    d_f, i_f = pairwise_topk_filter(
        jnp.asarray(x), k=4, block_q=32, block_c=32, interpret=True,
        radius2=1.0,
    )
    d0, i0 = np.asarray(d_f)[0], np.asarray(i_f)[0]
    assert d0[0] == 1.0 and i0[0] == 1  # exactly on the boundary: kept
    assert np.all(np.isinf(d0[1:]))


def test_radius_graph_filter_dispatch_cpu_oracle():
    """radius_graph keeps oracle semantics on the XLA path (the filter
    dispatch is TPU-only; this pins the contract the kernel must match)."""
    from gnn_tracking_tpu.ops.knn import radius_graph

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))
    ei, m, d = radius_graph(x, 0.8, max_num_neighbors=6)
    dn = np.asarray(d)[np.asarray(m)]
    assert np.all(dn <= 0.8) and dn.size > 0


def test_radius_graph_filter_dispatch_taken(monkeypatch):
    """The survivor-filter branch must actually be reachable: a concrete
    Python-float radius dispatches to ``_radius_graph_filter`` (round-3
    regression: the wrapper was itself jitted, so ``float(r)`` always raised
    and the filter path was dead code — ADVICE r3 #1)."""
    from gnn_tracking_tpu.ops import knn as knn_mod

    calls = []

    def fake_filter(x, *, k, radius2, node_mask, batch, loop):
        calls.append(radius2)
        ei, m, d = knn_mod.knn_graph(
            x, k, node_mask=node_mask, batch=batch, loop=loop
        )
        return ei, m, d

    monkeypatch.setattr(
        knn_mod, "_radius_uses_filter", lambda n, d, rc: rc is not None
    )
    monkeypatch.setattr(knn_mod, "_radius_graph_filter", fake_filter)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    # eager call with Python float -> filter path taken
    before = knn_mod._RADIUS_FILTER_DISPATCHES
    ei, m, d = knn_mod.radius_graph(x, 0.9, max_num_neighbors=8)
    assert len(calls) == 1 and abs(calls[0] - 0.81) < 1e-12
    assert knn_mod._RADIUS_FILTER_DISPATCHES == before + 1
    dn = np.asarray(d)[np.asarray(m)]
    assert np.all(dn <= 0.9)

    # traced radius (no static marking) -> must fall back, not crash
    import jax

    @jax.jit
    def traced_r(x, r):
        return knn_mod.radius_graph(x, r, max_num_neighbors=8)

    traced_r(x, jnp.float32(0.9))
    assert len(calls) == 1  # unchanged: fallback path used


def test_rg_condensation_loss_reaches_filter_path(monkeypatch):
    """radius_threshold is static in radius_graph_condensation_loss, so the
    filter kernel is reachable from inside that jit."""
    from gnn_tracking_tpu.losses.oc import radius_graph_condensation_loss
    from gnn_tracking_tpu.ops import knn as knn_mod

    calls = []

    def fake_filter(x, *, k, radius2, node_mask, batch, loop):
        calls.append(radius2)
        return knn_mod.knn_graph(
            x, k, node_mask=node_mask, batch=batch, loop=loop
        )

    monkeypatch.setattr(
        knn_mod, "_radius_uses_filter", lambda n, d, rc: rc is not None
    )
    monkeypatch.setattr(knn_mod, "_radius_graph_filter", fake_filter)

    rng = np.random.default_rng(5)
    n = 40
    beta = jnp.asarray(rng.uniform(0.01, 0.9, size=n).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    pid = jnp.asarray(rng.integers(0, 5, size=n).astype(np.int32))
    losses, _ = radius_graph_condensation_loss(
        beta=beta,
        x=x,
        object_id=pid,
        object_mask=pid > 0,
        q_min=0.01,
        radius_threshold=1.0,
        max_num_neighbors=16,
        max_n_objects=8,
    )
    assert len(calls) == 1
    assert all(np.isfinite(float(v)) for v in losses.values())
