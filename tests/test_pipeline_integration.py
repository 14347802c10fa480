"""End-to-end pipeline integration on the bundled (truncated) TrackML event
from the reference test data (read-only), mirroring the reference's
``tests/test_point_cloud_builder.py`` / ``test_graph_construction.py``."""

from pathlib import Path

import numpy as np
import pytest

from gnn_tracking_tpu.graph_construction.graph_builder import GraphBuilder
from gnn_tracking_tpu.preprocessing.point_cloud_builder import (
    PointCloudBuilder,
    get_truth_edge_index,
    simple_data_loader,
)

# vendored public TrackML challenge data (tests/test_data/trackml): the
# suite no longer depends on the read-only reference checkout
TRACKML_DIR = Path(__file__).parent / "test_data" / "trackml"

ACCEPTABLE_RANGES = {
    "r": (0, 1026),
    "phi": (-np.pi, np.pi),
    "z": (-3000, 3000),
    "u": (-1, 1),
    "v": (-1, 1),
    "charge_frac": (0, 1),
    "leta": (-5, 5),
    "lphi": (-np.pi, np.pi),
    "lx": (-3000, 3000),
    "ly": (-3000, 3000),
    "lz": (-3000, 3000),
    "geta": (-5, 5),
    "gphi": (-np.pi, np.pi),
}


@pytest.fixture(scope="module")
def test_data_files():
    return simple_data_loader(TRACKML_DIR / "event000000001")


@pytest.fixture(scope="module")
def point_clouds_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("point_clouds")
    builder = PointCloudBuilder(
        outdir=out,
        indir=TRACKML_DIR,
        detector_config=TRACKML_DIR / "detectors.csv.gz",
        n_sectors=1,
        redo=False,
        pixel_only=True,
        measurement_mode=False,
        thld=0.5,
        add_true_edges=True,
    )
    builder.process(0, 1)
    return out


@pytest.fixture(scope="module")
def built_graphs_path(point_clouds_path, tmp_path_factory):
    out = tmp_path_factory.mktemp("graphs")
    builder = GraphBuilder(
        point_clouds_path,
        out,
        redo=False,
        measurement_mode=True,
    )
    builder.process(stop=None)
    return out, builder


def test_get_truth_edge_index():
    assert (
        get_truth_edge_index(np.array([0, 1, 2, 3, 2, 1, 0]))
        == np.array([[1, 2], [5, 4]])
    ).all()


def test_append_features(test_data_files):
    hits, particles, truth, cells = test_data_files
    builder = PointCloudBuilder(
        outdir="/tmp/pcb_test",
        indir=TRACKML_DIR,
        detector_config=TRACKML_DIR / "detectors.csv.gz",
        n_sectors=1,
        pixel_only=False,
        write_output=False,
    )
    updated = builder.append_features(hits, particles, truth, cells)
    assert {"r", "phi", "pt", "eta_pt"} <= set(updated.columns)
    assert len(updated) == len(hits)
    for feature, (lo, hi) in ACCEPTABLE_RANGES.items():
        assert updated[feature].between(lo, hi).all(), f"{feature} out of range"


def test_restrict_to_subdetectors(test_data_files):
    hits, particles, truth, cells = test_data_files
    builder = PointCloudBuilder(
        outdir="/tmp/pcb_test",
        indir=TRACKML_DIR,
        detector_config=TRACKML_DIR / "detectors.csv.gz",
        n_sectors=1,
        pixel_only=True,
        write_output=False,
    )
    new_hits, _ = builder.restrict_to_subdetectors(hits, cells)
    in_pixels = hits[hits["volume_id"].isin([7, 8, 9])]
    assert len(in_pixels) == len(new_hits)
    # unique relabeling
    combos = set(zip(new_hits["volume_id"], new_hits["layer_id"], new_hits["layer"]))
    assert len(combos) == new_hits["layer"].nunique()


def test_point_cloud_output(point_clouds_path):
    from gnn_tracking_tpu.utils.loading import load_graph

    files = sorted(point_clouds_path.glob("*.npz"))
    assert files
    g = load_graph(files[0])
    assert g.x.shape[1] == 14
    assert g.num_nodes > 0
    assert g.true_edge_index.shape[1] > 0
    pid = np.asarray(g.particle_id)
    te = np.asarray(g.true_edge_index)
    assert (pid[te[0]] == pid[te[1]]).all()
    assert (pid[te[0]] != 0).all()
    # reconstructable implies pid > 0
    reco = np.asarray(g.reconstructable)
    assert (pid[reco > 0] > 0).all()


def test_graph_builder_output(built_graphs_path):
    _, builder = built_graphs_path
    assert builder.data_list
    g = builder.data_list[0]
    ei = np.asarray(g.edge_index)
    y = np.asarray(g.y)
    pid = np.asarray(g.particle_id)
    assert ei.shape[1] > 0
    # undirected doubling: first half mirrored in second half
    e = ei.shape[1] // 2
    np.testing.assert_array_equal(ei[:, :e], ei[::-1, e:])
    # true edges only connect same (nonzero) particle (modulo precedence
    # correction which only falsifies)
    true_mask = y.astype(bool)
    assert (pid[ei[0, true_mask]] == pid[ei[1, true_mask]]).all()
    assert (pid[ei[0, true_mask]] > 0).all()
    # measurements: purity/efficiency computed
    m = builder.get_measurements()
    assert 0 < m["edge_purity"] <= 1
    assert 0 < m["edge_efficiency_0.9"] <= 1
    # the geometric cuts should keep most high-pt true edges
    assert m["edge_efficiency_0.9"] > 0.5


def test_graph_builder_edge_attrs(built_graphs_path):
    _, builder = built_graphs_path
    g = builder.data_list[0]
    ea = np.asarray(g.edge_attr)
    assert ea.shape[1] == 4
    e = ea.shape[0] // 2
    # dr, dphi, dz flip sign under edge reversal; dR does not
    np.testing.assert_allclose(ea[:e, :3], -ea[e:, :3], rtol=1e-6)
    np.testing.assert_allclose(ea[:e, 3], ea[e:, 3], rtol=1e-6)


def test_pid_relabeling(point_clouds_path):
    from gnn_tracking_tpu.utils.loading import load_graph

    g = load_graph(sorted(point_clouds_path.glob("*.npz"))[0])
    pid = np.asarray(g.particle_id)
    orig = np.asarray(g.extras["particle_id_original"])
    # dense int32 labels; noise stays 0; mapping is a bijection
    assert pid.max() < 2**31
    assert ((pid == 0) == (orig == 0)).all()
    pairs = set(zip(pid.tolist(), orig.tolist()))
    assert len({p for p, _ in pairs}) == len({o for _, o in pairs})
