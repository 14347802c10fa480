"""Windowed (banded) exact kNN vs sklearn brute force."""

from __future__ import annotations

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

from gnn_tracking_tpu.ops.pallas.windowed_topk import windowed_knn


def _clusters(rng, n, d, n_clusters=40, spread=0.05):
    """Clustered point cloud (hit embeddings concentrate around tracks)."""
    centers = rng.normal(size=(n_clusters, d))
    who = rng.integers(0, n_clusters, size=n)
    return (centers[who] + spread * rng.normal(size=(n, d))).astype(np.float32)


def _ref_knn(x, k, valid=None):
    if valid is None:
        valid = np.ones(len(x), bool)
    xv = x[valid]
    ids = np.nonzero(valid)[0]
    nn = NearestNeighbors(n_neighbors=k + 1).fit(xv)
    dd, ii = nn.kneighbors(xv)
    d_ref = np.full((len(x), k), np.inf, np.float32)
    d_ref[valid] = (dd[:, 1:] ** 2).astype(np.float32)
    i_ref = np.zeros((len(x), k), np.int64)
    i_ref[valid] = ids[ii[:, 1:]]
    return d_ref, i_ref


@pytest.mark.parametrize("k", [4, 8])
def test_windowed_knn_exact_clusters(k):
    rng = np.random.default_rng(0)
    x = _clusters(rng, 3000, 8)
    d, i, uncert = windowed_knn(
        x, k=k, radius=2, block_q=128, block_c=256, fallback_cap=512,
        interpret=True,
    )
    assert int(uncert) == 0
    d_ref, _ = _ref_knn(x, k)
    np.testing.assert_allclose(
        np.sort(np.asarray(d), axis=1), np.sort(d_ref, axis=1),
        rtol=1e-3, atol=1e-4,
    )
    # index sets must match where distances are distinct
    i_np = np.asarray(i)
    dn = np.asarray(d)
    for q in range(0, 3000, 197):
        got = set(i_np[q])
        ref = set(_ref_knn(x, k)[1][q])
        if len(got | ref) > len(got):  # allow ties
            tied = np.isclose(np.sort(dn[q])[-1], np.sort(d_ref[q])[-1], rtol=1e-3)
            assert tied


def test_windowed_knn_uniform_fallback_engages():
    """Uniform data has no 1-D locality: band alone is NOT exact, the
    certification + fallback must still deliver exact results."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1500, 8)).astype(np.float32)
    d, i, uncert = windowed_knn(
        x, k=6, radius=1, block_q=128, block_c=128, fallback_cap=1536,
        interpret=True,
    )
    assert int(uncert) == 0
    d_ref, _ = _ref_knn(x, 6)
    np.testing.assert_allclose(
        np.sort(np.asarray(d), axis=1), np.sort(d_ref, axis=1),
        rtol=1e-3, atol=1e-4,
    )


def test_windowed_knn_node_mask():
    rng = np.random.default_rng(2)
    x = _clusters(rng, 2000, 6)
    valid = rng.random(2000) < 0.8
    d, i, uncert = windowed_knn(
        x, k=5, radius=2, block_q=128, block_c=256, fallback_cap=512,
        node_mask=valid, interpret=True,
    )
    assert int(uncert) == 0
    d_ref, _ = _ref_knn(x, 5, valid)
    np.testing.assert_allclose(
        np.sort(np.asarray(d)[valid], axis=1),
        np.sort(d_ref[valid], axis=1),
        rtol=1e-3, atol=1e-4,
    )
    # neighbors of valid queries are themselves valid
    assert valid[np.asarray(i)[valid]].all()


def test_windowed_knn_uncertified_reported():
    """With a tiny fallback cap on adversarial data, leftover uncertified
    queries are reported, not silently wrong."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1024, 8)).astype(np.float32)
    _, _, uncert = windowed_knn(
        x, k=6, radius=0, block_q=128, block_c=128, fallback_cap=128,
        interpret=True,
    )
    assert int(uncert) > 0
