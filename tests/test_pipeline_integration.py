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


# ---------------------------------------------------------------------------
# z-reflection augmentation: end-to-end exactness against a physically
# mirrored raw event (z -> -z, hits remapped to their z-mirror modules)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mirrored_event_dir(tmp_path_factory):
    """Write a z-mirrored copy of the bundled raw event: hit z flips and
    every hit moves to its mirror module (cluster cells are extent-only
    and reflection-invariant); particle/truth z-odd quantities flip."""
    import pandas as pd
    from scipy.spatial import cKDTree

    out = tmp_path_factory.mktemp("mirrored_event")
    det = pd.read_csv(TRACKML_DIR / "detectors.csv.gz")
    centers = det[["cx", "cy", "cz"]].to_numpy(float)
    _, j = cKDTree(centers).query(centers * np.array([1.0, 1.0, -1.0]))
    ids = det[["volume_id", "layer_id", "module_id"]].to_numpy()
    mirror_of = {tuple(ids[i]): tuple(ids[j[i]]) for i in range(len(det))}

    hits, particles, truth, cells = simple_data_loader(
        TRACKML_DIR / "event000000001"
    )
    hits = hits.copy()
    hits["z"] = -hits["z"]
    mids = np.array(
        [
            mirror_of[(v, l, m)]
            for v, l, m in hits[
                ["volume_id", "layer_id", "module_id"]
            ].to_numpy()
        ]
    )
    hits[["volume_id", "layer_id", "module_id"]] = mids
    particles = particles.copy()
    particles["pz"] = -particles["pz"]
    particles["vz"] = -particles["vz"]
    truth = truth.copy()
    truth["tz"] = -truth["tz"]
    truth["tpz"] = -truth["tpz"]

    prefix = "event000000001"
    hits.to_csv(out / f"{prefix}-hits.csv.gz", index=False)
    cells.to_csv(out / f"{prefix}-cells.csv.gz", index=False)
    particles.to_csv(out / f"{prefix}-particles.csv.gz", index=False)
    truth.to_csv(out / f"{prefix}-truth.csv.gz", index=False)
    return out


def _canonical_order(x):
    """Reflection-invariant stable row order (r, phi, u, lx, ly)."""
    key = np.round(np.asarray(x)[:, [0, 1, 4, 9, 10]].astype(np.float64), 4)
    return np.lexsort(key.T[::-1])


def test_z_reflection_matches_mirrored_event(mirrored_event_dir):
    """reflect_z of the built point cloud reproduces, feature-exactly, the
    point cloud built from the physically mirrored raw event — including
    the geta/gphi columns that the naive sign-flip mapping gets wrong (the
    mirror module's local frame differs by an in-plane axis flip)."""
    from gnn_tracking_tpu.utils.augmentation import reflect_z

    def build(indir):
        b = PointCloudBuilder(
            outdir=indir / "pc",
            indir=indir,
            detector_config=TRACKML_DIR / "detectors.csv.gz",
            n_sectors=1,
            pixel_only=True,
            add_true_edges=False,
            write_output=False,
        )
        return b.process()[0]

    g_orig = build(TRACKML_DIR)
    g_mirr = build(mirrored_event_dir)
    g_refl = reflect_z(g_orig.pad_to(g_orig.num_nodes, 0))

    xr = np.asarray(g_refl.x)[_canonical_order(g_refl.x)]
    xm = np.asarray(g_mirr.x)[_canonical_order(g_mirr.x)]
    assert xr.shape == xm.shape
    from gnn_tracking_tpu.preprocessing.point_cloud_builder import (
        DEFAULT_FEATURES,
    )

    for col, name in enumerate(DEFAULT_FEATURES):
        np.testing.assert_allclose(
            xr[:, col], xm[:, col], rtol=1e-4, atol=1e-4,
            err_msg=f"feature {name} mismatch under z-reflection",
        )
    # truth eta flips too
    er = np.asarray(g_refl.eta)[_canonical_order(g_refl.x)]
    em = np.asarray(g_mirr.eta)[_canonical_order(g_mirr.x)]
    np.testing.assert_allclose(er, em, rtol=1e-4, atol=1e-4)


def test_z_reflection_involution_and_transform(built_graphs_path):
    """ZReflection on a graph-stage EventGraph: exact involution, dz
    edge-attr flip, coin determinism, cell_refl passthrough from the
    point cloud."""
    from gnn_tracking_tpu.utils.augmentation import ZReflection, reflect_z

    _, builder = built_graphs_path
    g = builder.data_list[0]
    assert "cell_refl" in g.extras  # GraphBuilder passes it through

    g1 = reflect_z(g)
    x0, x1 = np.asarray(g.x), np.asarray(g1.x)
    np.testing.assert_allclose(x1[:, 2], -x0[:, 2], rtol=1e-6)  # z
    np.testing.assert_allclose(x1[:, 3], -x0[:, 3], rtol=1e-6)  # eta_rz
    # geta/gphi come from the precomputed mirror values, NOT a sign flip
    cr = np.asarray(g.extras["cell_refl"])
    np.testing.assert_allclose(x1[:, 12], cr[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(x1[:, 13], cr[:, 1], rtol=1e-5, atol=1e-6)
    # invariant columns untouched
    for col in (0, 1, 4, 5, 6, 7, 8, 9, 10, 11):
        np.testing.assert_array_equal(x1[:, col], x0[:, col])
    # edge dz flips, dr/dphi/dR don't
    ea0, ea1 = np.asarray(g.edge_attr), np.asarray(g1.edge_attr)
    np.testing.assert_allclose(ea1[:, 2], -ea0[:, 2], rtol=1e-6)
    np.testing.assert_array_equal(ea1[:, [0, 1, 3]], ea0[:, [0, 1, 3]])
    np.testing.assert_allclose(
        np.asarray(g1.eta), -np.asarray(g.eta), rtol=1e-6
    )

    # exact involution (cell_refl swap restores geta/gphi bit-exactly)
    g2 = reflect_z(g1)
    np.testing.assert_array_equal(np.asarray(g2.x), x0)
    np.testing.assert_array_equal(
        np.asarray(g2.extras["cell_refl"]), cr
    )

    # transform: deterministic coin in (seed, step); p=1 always reflects
    tr = ZReflection(p=1.0, seed=3)
    np.testing.assert_array_equal(
        np.asarray(tr(g, step=0).x), x1
    )
    coins = [
        (np.asarray(ZReflection(p=0.5, seed=3)(g, step=s).x)[:, 2]
         == x0[:, 2]).all()
        for s in range(16)
    ]
    assert any(coins) and not all(coins)  # both outcomes occur


def test_reflection_rotation_compose_order_independent(built_graphs_path):
    """PhiRotation co-rotates the stored mirror-frame cell_refl gphi, so
    ZReflection-after-rotation equals rotation-after-ZReflection exactly
    (ADVICE r4: the old ordering constraint is gone)."""
    from gnn_tracking_tpu.utils.augmentation import (
        Compose,
        PhiRotation,
        ZReflection,
    )

    _, builder = built_graphs_path
    g = builder.data_list[0]
    assert "cell_refl" in g.extras
    refl_first = Compose([ZReflection(p=1.0, seed=7), PhiRotation(seed=9)])
    rot_first = Compose([PhiRotation(seed=9), ZReflection(p=1.0, seed=7)])
    for step in (0, 3):
        ga = refl_first(g, step=step)
        gb = rot_first(g, step=step)
        np.testing.assert_allclose(
            np.asarray(ga.x), np.asarray(gb.x), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ga.extras["cell_refl"]),
            np.asarray(gb.extras["cell_refl"]),
            rtol=1e-5,
            atol=1e-6,
        )
