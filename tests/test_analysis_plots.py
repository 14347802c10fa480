"""Smoke tests for EC analysis + plotting (analog of reference
tests/test_plotutils.py, test_plotting.py, test_latent_analysis.py,
test_efficiency_plots.py)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from gnn_tracking_tpu.analysis.edge_classification import (
    ThresholdTrackInfoPlot,
    collect_all_ec_stats,
    get_all_ec_stats,
)
from gnn_tracking_tpu.analysis.efficiencies import (
    PerformanceComparisonPlot,
    PerformancePlot,
    TracksVsDBSCANPlot,
)
from gnn_tracking_tpu.analysis.latent import SelectedPidsPlot
from gnn_tracking_tpu.analysis.plotutils import Plot, add_watermark
from gnn_tracking_tpu.utils.plotting import GraphPlotter, plot_rz

from .test_models import make_graph


@pytest.fixture(scope="module")
def graph():
    return make_graph(0)


def test_get_all_ec_stats(graph):
    rng = np.random.default_rng(0)
    w = rng.random(graph.num_edges)
    stats = get_all_ec_stats(0.5, w, graph)
    assert stats["threshold"] == 0.5
    assert "TPR" in stats
    assert "TPR_thld" in stats
    assert "frac_segment50" in stats
    assert "n_orphan_total" in stats


def test_collect_all_ec_stats(graph):
    rng = np.random.default_rng(0)

    def model_fn(data):
        return {"W": rng.random(data.num_edges)}

    df = collect_all_ec_stats(model_fn, [graph, graph], thresholds=[0.3, 0.7])
    assert len(df) == 2
    assert "TPR_err" in df.columns
    plot = ThresholdTrackInfoPlot(df)
    plot.plot()


def test_plot_base():
    p = Plot(watermark="test")
    add_watermark(p.ax)
    p.ax.plot([0, 1], [0, 1])


def test_efficiency_plots():
    df = pd.DataFrame(
        {
            "pt_min": [0.5, 1.0],
            "pt_max": [1.0, 1.5],
            "double_majority": [0.8, 0.9],
            "double_majority_err": [0.02, 0.02],
        }
    )
    p = PerformancePlot(var="pt")
    p.plot_metric(df, "double_majority")
    c = PerformanceComparisonPlot("double_majority", var="pt")
    c.add_run(df, label="run1")

    df_eps = pd.DataFrame(
        {"eps": [0.1, 0.2], "double_majority_pt0.9": [0.7, 0.8]}
    )
    t = TracksVsDBSCANPlot(df_eps)
    t.plot_var("double_majority_pt0.9")


def test_latent_plot(graph):
    rng = np.random.default_rng(0)
    latent = rng.normal(size=(graph.num_nodes, 2))
    p = SelectedPidsPlot(graph, latent, n_pids=3)
    p.plot_latent()
    p.plot_phi_eta()


def test_graph_plotter(graph):
    plot_rz(graph, max_edges=50)
    GraphPlotter(graph).plot_3d(max_edges=20)


def test_selected_pids_collateral_views(graph):
    """Collateral-hit panels (reference latent.py:88-179): hits sharing a
    cluster with a selected particle but from another particle are marked."""
    import matplotlib
    matplotlib.use("Agg")
    rng = np.random.default_rng(0)
    latent = rng.normal(size=(graph.num_nodes, 2))
    # labels: cluster = particle id, but move one foreign hit into pid 1's cluster
    labels = np.asarray(graph.particle_id).copy()
    pid = np.asarray(graph.particle_id)
    foreign = np.where(pid != 1)[0][0]
    labels[foreign] = 1
    p = SelectedPidsPlot(graph, latent, labels=labels, selected_pids=[1, 2])
    mask = p.get_collateral_mask(1)
    assert mask[foreign]
    assert not mask[pid == 1].any()
    plot = p.plot_latent(circles=True, eps=0.3)
    assert plot.ax is not None
    plot2 = p.plot_phi_eta()
    assert plot2.ax is not None


def test_selected_pids_granular_views(graph):
    """Per-view methods matching the reference surface (latent.py:110-179):
    selected/other/collateral hits, each in latent space and phi/eta."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(0)
    latent = rng.normal(size=(graph.num_nodes, 2))
    labels = np.asarray(graph.particle_id).copy()
    p = SelectedPidsPlot(graph, latent, labels=labels, selected_pids=[1, 2])
    assert len(p.get_colors([1, 2])) == 2
    _, ax = plt.subplots()
    p.plot_other_hit_latent(ax)
    p.plot_selected_pid_latent(ax, plot_circles=True, eps=0.2)
    p.plot_collateral_latent(ax)
    _, ax2 = plt.subplots()
    p.plot_other_hit_ep(ax2)
    p.plot_selected_pid_ep(ax2)
    p.plot_collateral_ep(ax2)
    plt.close("all")


def test_graph_plotter_panels(graph):
    import matplotlib
    matplotlib.use("Agg")
    axs = GraphPlotter(graph).plot_ep_rz_uv(max_edges=50)
    assert len(axs) == 3
    ax = GraphPlotter(graph).plot_2d(max_edges=50)
    assert ax is not None


def test_graph_plotter_highlight_and_sector_frame(graph):
    """Reference plotting.py:197-273: random-particle track overlays in
    every projection + the (u, v) panel rotated into a sector's frame."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(0)
    axs = GraphPlotter(graph).plot_ep_rz_uv(
        max_edges=50, sector=3, n_sectors=8, highlight_particles=3, rng=rng
    )
    assert len(axs) == 3
    # highlighted particles add zorder-100 scatter artists on every panel
    assert all(
        any(c.get_zorder() == 100 for c in ax.collections) for ax in axs
    )
    plt.close("all")


def test_point_cloud_plotter_panels(graph):
    import matplotlib
    matplotlib.use("Agg")
    from gnn_tracking_tpu.utils.plotting import PointCloudPlotter

    pcp = PointCloudPlotter([graph, graph], n_sectors=8)
    axs = pcp.plot_ep_rv_uv(pixel_only=True)
    assert len(axs) == 3
    fig, axs = pcp.plot_ep_rv_uv_with_boundary(1, di=0.0005, ds=1.3)
    assert len(axs) == 3
    fig, axs = pcp.plot_ep_rv_uv_all_sectors("evt", pixel_only=True)
    assert len(axs) == 3
