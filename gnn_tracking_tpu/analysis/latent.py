"""Latent-space visualizations (capability parity: reference
``analysis/latent.py``)."""

from __future__ import annotations

import numpy as np

from gnn_tracking_tpu.analysis.plotutils import Plot
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask


def get_color_mapper(values, cmap: str = "tab10"):
    """Map discrete values to colors (reference ``latent.py:14-36``)."""
    import matplotlib

    unique = sorted(set(np.asarray(values).tolist()))
    colormap = matplotlib.colormaps[cmap]
    mapping = {v: colormap(i % colormap.N) for i, v in enumerate(unique)}
    return lambda v: mapping[v]


class SelectedPidsPlot:
    """Scatter selected particles (and their collateral hits) in the
    condensation space and in phi/eta (reference ``latent.py:39-179``)."""

    def __init__(
        self,
        data: EventGraph,
        latent: np.ndarray,
        *,
        selected_pids: list[int] | None = None,
        n_pids: int = 6,
        seed: int = 0,
    ):
        self.data = data
        self.latent = np.asarray(latent)
        pid = np.asarray(data.particle_id)
        good = np.asarray(get_good_node_mask(data))
        if selected_pids is None:
            rng = np.random.default_rng(seed)
            candidates = np.unique(pid[good])
            selected_pids = rng.permutation(candidates)[:n_pids].tolist()
        self.selected_pids = selected_pids
        self._color = get_color_mapper(selected_pids)

    def plot_latent(self, ax=None) -> Plot:
        plot = Plot(ax=ax)
        pid = np.asarray(self.data.particle_id)
        nm = np.asarray(self.data.node_mask)
        other = nm & ~np.isin(pid, self.selected_pids)
        plot.ax.scatter(
            self.latent[other, 0], self.latent[other, 1], s=2, c="lightgray"
        )
        for p in self.selected_pids:
            sel = nm & (pid == p)
            plot.ax.scatter(
                self.latent[sel, 0], self.latent[sel, 1], s=12, color=self._color(p)
            )
        plot.ax.set_xlabel("latent 0")
        plot.ax.set_ylabel("latent 1")
        return plot

    def plot_phi_eta(self, ax=None) -> Plot:
        plot = Plot(ax=ax)
        pid = np.asarray(self.data.particle_id)
        nm = np.asarray(self.data.node_mask)
        x = np.asarray(self.data.x)
        eta = np.asarray(self.data.eta)
        phi = x[:, 1] if x.shape[1] > 1 else np.zeros(len(pid))
        other = nm & ~np.isin(pid, self.selected_pids)
        plot.ax.scatter(phi[other], eta[other], s=2, c="lightgray")
        for p in self.selected_pids:
            sel = nm & (pid == p)
            plot.ax.scatter(phi[sel], eta[sel], s=12, color=self._color(p))
        plot.ax.set_xlabel(r"$\phi$")
        plot.ax.set_ylabel(r"$\eta$")
        return plot
