"""Tests for DBSCAN scanners (analog of reference tests/test_fastrescanner.py
and tests/test_clusterscanners.py)."""

import numpy as np
import pytest
from sklearn.cluster import DBSCAN

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.postprocessing.cluster_scanner import CombinedClusterScanner
from gnn_tracking_tpu.postprocessing.dbscanscanner import (
    DBSCANHyperParamScanner,
    DBSCANHyperParamScannerFixed,
    DBSCANPerformanceDetails,
)
from gnn_tracking_tpu.postprocessing.fastrescanner import DBSCANFastRescan


def test_fast_rescan_matches_sklearn():
    """Reference pins exact equality (tests/test_fastrescanner.py:8-14)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(200, 2))
    scanner = DBSCANFastRescan(x, max_eps=0.3, max_num_neighbors=200)
    for eps in (0.05, 0.1, 0.2, 0.3):
        for min_pts in (1, 3, 5):
            ours = scanner.cluster(eps=eps, min_pts=min_pts)
            ref = DBSCAN(eps=eps, min_samples=min_pts).fit_predict(x)
            np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("impl", ["lanes", "vmap"])
def test_cluster_many_matches_per_trial(impl):
    """Both batched multi-trial rescan formulations (trials-on-lanes and
    vmapped) must agree exactly with the per-trial path (and hence with
    sklearn)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(150, 2))
    scanner = DBSCANFastRescan(x, max_eps=0.3, max_num_neighbors=150)
    trials = [
        {"eps": e, "min_samples": m}
        for e in (0.05, 0.15, 0.3)
        for m in (1, 4)
    ]
    many = scanner.cluster_many(trials, impl=impl)
    assert many.shape == (len(trials), 150)
    for trial, labels in zip(trials, many):
        one = scanner.cluster(eps=trial["eps"], min_pts=trial["min_samples"])
        np.testing.assert_array_equal(labels, one)
        ref = DBSCAN(
            eps=trial["eps"], min_samples=trial["min_samples"]
        ).fit_predict(x)
        np.testing.assert_array_equal(labels, ref)
    assert scanner.cluster_many([]).shape == (0, 150)


def _mock_data_and_out(n=120, seed=0):
    rng = np.random.default_rng(seed)
    pid = rng.integers(0, 12, size=n)
    centers = rng.normal(scale=3.0, size=(12, 2))
    h = centers[pid] + 0.1 * rng.normal(size=(n, 2))
    data = EventGraph.from_arrays(
        x=rng.normal(size=(n, 3)),
        particle_id=pid,
        pt=2 * rng.random(12)[pid],
        eta=np.zeros(n),
        reconstructable=np.ones(n),
    )
    out = {"H": h, "B": rng.random(n)}
    return data, out


def test_dbscan_hyperparam_scanner():
    data, out = _mock_data_and_out()
    scanner = DBSCANHyperParamScanner(
        eps_range=(0.1, 0.5), n_trials=5, keep_best=2, seed=0
    )
    scanner(data, out, 0)
    scanner(data, out, 1)
    foms = scanner.get_foms()
    assert "trk.double_majority_pt0.9" in foms
    assert "best_dbscan_eps" in foms
    assert 0 <= foms["trk.double_majority_pt0.9"] <= 1
    # with clean clusters and sane eps, efficiency should be high
    assert foms["trk.double_majority_pt0.9"] > 0.5


def test_dbscan_scanner_keep_best_reset():
    data, out = _mock_data_and_out()
    scanner = DBSCANHyperParamScanner(eps_range=(0.1, 0.5), n_trials=4, keep_best=2, seed=1)
    scanner(data, out, 0)
    # new epoch: i_batch == 0 resets but keeps best trials
    scanner(data, out, 0)
    assert len(scanner._trials) == 4


def test_fixed_scanner_and_combined():
    data, out = _mock_data_and_out()
    fixed = DBSCANHyperParamScannerFixed(
        trials=[{"eps": 0.2, "min_samples": 1}, {"eps": 0.4, "min_samples": 2}]
    )
    details = DBSCANPerformanceDetails(eps=0.2, min_samples=1)
    combined = CombinedClusterScanner([fixed, details])
    combined(data, out, 0)
    foms = combined.get_foms()
    assert "trk.double_majority_pt0.9" in foms
    h_dfs, c_dfs = details.get_results()
    assert len(h_dfs) == 1
    assert {"maj_frac", "maj_pid_frac"} <= set(c_dfs[0].columns)


def test_scanner_with_padding():
    data, out = _mock_data_and_out()
    n = data.num_nodes
    data_p = data.pad_to(n + 30, data.num_edges)
    out_p = {"H": np.concatenate([out["H"], np.zeros((30, 2))]), "B": None}
    s1 = DBSCANHyperParamScannerFixed(trials=[{"eps": 0.2, "min_samples": 1}])
    s2 = DBSCANHyperParamScannerFixed(trials=[{"eps": 0.2, "min_samples": 1}])
    s1(data, out, 0)
    s2(data_p, out_p, 0)
    f1, f2 = s1.get_foms(), s2.get_foms()
    assert f1 == pytest.approx(f2, nan_ok=True)
