"""Native C++ edge-join parity tests vs the numpy implementation."""

import numpy as np
import pytest

from gnn_tracking_tpu import native
from gnn_tracking_tpu.graph_construction.graph_builder import GraphBuilder

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library could not be built"
)


def _builder(tmp_path, **kwargs):
    (tmp_path / "in").mkdir(exist_ok=True)
    return GraphBuilder(tmp_path / "in", tmp_path / "out", **kwargs)


@pytest.mark.parametrize(
    "layer1,layer2", [(7, 8), (7, 6), (8, 11), (0, 1)]
)
def test_native_matches_numpy(tmp_path, layer1, layer2):
    rng = np.random.default_rng(0)
    n = 500
    r = rng.uniform(30, 200, size=n)
    phi = rng.uniform(-np.pi, np.pi, size=n)
    z = rng.uniform(-500, 500, size=n)
    idx1 = np.arange(0, 250, dtype=np.int64)
    idx2 = np.arange(250, 500, dtype=np.int64)
    builder = _builder(tmp_path, phi_slope_max=0.05, z0_max=300, dR_max=2.0)
    ref = builder.select_edges(idx1, idx2, r, phi, z, layer1, layer2, use_native=False)
    nat = builder.select_edges(idx1, idx2, r, phi, z, layer1, layer2, use_native=True)
    ref_set = set(zip(ref["index_1"].tolist(), ref["index_2"].tolist()))
    nat_set = set(zip(nat["index_1"].tolist(), nat["index_2"].tolist()))
    assert ref_set == nat_set
    # attributes match after aligning order
    ref_sorted = np.lexsort((ref["index_2"], ref["index_1"]))
    nat_sorted = np.lexsort((nat["index_2"], nat["index_1"]))
    for key in ("dr", "dphi", "dz", "dR"):
        np.testing.assert_allclose(
            ref[key][ref_sorted], nat[key][nat_sorted], rtol=1e-12
        )


def test_native_in_full_builder(tmp_path, monkeypatch):
    """Full build_edges must give identical graphs with and without the
    native path."""
    from tests.test_models import make_graph

    g = make_graph(0)
    import jax.numpy as jnp

    # put hits on plausible layers and coordinates
    rng = np.random.default_rng(1)
    n = g.num_nodes
    x = np.asarray(g.x).copy()
    x[:, 0] = rng.uniform(30, 200, size=n)  # r
    x[:, 1] = rng.uniform(-np.pi, np.pi, size=n)  # phi
    x[:, 2] = rng.uniform(-500, 500, size=n)  # z
    g = g.replace(x=jnp.asarray(x), layer=jnp.asarray(rng.integers(0, 18, size=n)))

    b1 = _builder(tmp_path, phi_slope_max=0.5, z0_max=500, dR_max=3.0)
    ei_n, ea_n, y_n, _ = b1.build_edges(g)
    monkeypatch.setattr(native, "available", lambda: False)
    ei_p, ea_p, y_p, _ = b1.build_edges(g)
    set_n = set(map(tuple, ei_n.T.tolist()))
    set_p = set(map(tuple, ei_p.T.tolist()))
    assert set_n == set_p
    assert y_n.sum() == y_p.sum()
