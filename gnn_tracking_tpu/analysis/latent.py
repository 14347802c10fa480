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
        labels: np.ndarray | None = None,
        selected_pids: list[int] | None = None,
        ec_hit_mask: np.ndarray | None = None,
        n_pids: int = 6,
        seed: int = 0,
    ):
        """``labels``: cluster assignment (e.g. DBSCAN output) — enables the
        collateral-hit views; ``ec_hit_mask``: restrict to hits that survive
        orphan-node prediction (reference ``latent.py:63-66``)."""
        self.data = data
        self.latent = np.asarray(latent)
        self.labels = None if labels is None else np.asarray(labels)
        pid = np.asarray(data.particle_id)
        self._nm = np.asarray(data.node_mask)
        if ec_hit_mask is not None:
            self._nm = self._nm & np.asarray(ec_hit_mask)
        good = np.asarray(get_good_node_mask(data)) & self._nm
        if selected_pids is None:
            rng = np.random.default_rng(seed)
            candidates = np.unique(pid[good])
            selected_pids = rng.permutation(candidates)[:n_pids].tolist()
        self.selected_pids = selected_pids
        self._color = get_color_mapper(selected_pids)

    def get_collateral_mask(self, pid_value: int) -> np.ndarray:
        """Hits sharing a cluster with ``pid_value``'s hits but belonging to
        a different particle (reference ``latent.py:88-97``)."""
        assert self.labels is not None, "collateral views need cluster labels"
        pid = np.asarray(self.data.particle_id)
        pid_mask = self._nm & (pid == pid_value)
        assoc = np.unique(self.labels[pid_mask])
        return self._nm & np.isin(self.labels, assoc) & ~pid_mask

    @staticmethod
    def plot_circles(ax, xs, ys, colors, eps: float = 1.0) -> None:
        """Condensation attraction radii around hits (reference
        ``latent.py:99-105``)."""
        import matplotlib.pyplot as plt
        from matplotlib.colors import to_rgb

        for x, y, c in zip(xs, ys, colors):
            light = tuple(0.8 + 0.2 * v for v in to_rgb(c))
            ax.add_patch(
                plt.Circle((x, y), eps, facecolor=light, linestyle="none")
            )

    def plot_latent(self, ax=None, *, circles: bool = False, eps: float = 1.0) -> Plot:
        plot = Plot(ax=ax)
        pid = np.asarray(self.data.particle_id)
        nm = self._nm
        other = nm & ~np.isin(pid, self.selected_pids)
        plot.ax.scatter(
            self.latent[other, 0], self.latent[other, 1], s=2, c="lightgray",
            label="Other hits",
        )
        for p in self.selected_pids:
            sel = nm & (pid == p)
            if circles:
                self.plot_circles(
                    plot.ax, self.latent[sel, 0], self.latent[sel, 1],
                    [self._color(p)] * int(sel.sum()), eps=eps,
                )
            plot.ax.scatter(
                self.latent[sel, 0], self.latent[sel, 1], s=12, color=self._color(p)
            )
        if self.labels is not None:
            self.plot_collateral_latent(plot.ax)
        plot.ax.set_xlabel("latent 0")
        plot.ax.set_ylabel("latent 1")
        return plot

    def plot_collateral_latent(self, ax) -> None:
        """Mark hits wrongly clustered with the selected particles
        (reference ``latent.py:124-135``)."""
        for p in self.selected_pids:
            mask = self.get_collateral_mask(p)
            ax.scatter(
                self.latent[mask, 0], self.latent[mask, 1],
                color=self._color(p), s=12, marker="x", label="Collateral",
            )

    def plot_collateral_phi_eta(self, ax) -> None:
        """Collateral hits in detector phi/eta (reference ``latent.py:168-179``)."""
        phi, eta = self._phi_eta()
        for p in self.selected_pids:
            mask = self.get_collateral_mask(p)
            ax.scatter(
                phi[mask], eta[mask], color=self._color(p), s=12, marker="x"
            )

    # Granular per-view methods matching the reference surface
    # (``latent.py:110-179``) — compose them onto one Axes freely.
    def get_colors(self, pids) -> list:
        """Colors for a sequence of selected pids (reference ``latent.py:107-108``)."""
        return [self._color(int(p)) for p in np.asarray(pids).ravel()]

    def _selected_mask(self) -> np.ndarray:
        pid = np.asarray(self.data.particle_id)
        return self._nm & np.isin(pid, self.selected_pids)

    def plot_selected_pid_latent(self, ax, plot_circles: bool = False, eps: float = 1.0) -> None:
        """Hits of the selected particles in the condensation space
        (reference ``latent.py:110-122``)."""
        pid = np.asarray(self.data.particle_id)
        for p in self.selected_pids:
            sel = self._nm & (pid == p)
            if plot_circles:
                self.plot_circles(
                    ax, self.latent[sel, 0], self.latent[sel, 1],
                    [self._color(p)] * int(sel.sum()), eps=eps,
                )
            ax.scatter(
                self.latent[sel, 0], self.latent[sel, 1], s=12,
                color=self._color(p), label="Hits of selected PIDs",
            )

    def plot_other_hit_latent(self, ax) -> None:
        """Background hits in the condensation space (reference ``latent.py:137-146``)."""
        other = self._nm & ~self._selected_mask()
        ax.scatter(
            self.latent[other, 0], self.latent[other, 1], s=2, c="silver",
            label="Other hits",
        )

    def plot_selected_pid_ep(self, ax) -> None:
        """Selected-particle hits in phi/eta (reference ``latent.py:148-156``)."""
        pid = np.asarray(self.data.particle_id)
        phi, eta = self._phi_eta()
        for p in self.selected_pids:
            sel = self._nm & (pid == p)
            ax.scatter(phi[sel], eta[sel], s=12, color=self._color(p),
                       label="Selected PIDs")

    def plot_other_hit_ep(self, ax) -> None:
        """Background hits in phi/eta (reference ``latent.py:158-166``)."""
        other = self._nm & ~self._selected_mask()
        phi, eta = self._phi_eta()
        ax.scatter(phi[other], eta[other], s=2, c="silver", label="Other hits")

    def plot_collateral_ep(self, ax) -> None:
        """Alias matching the reference name (reference ``latent.py:168-178``)."""
        self.plot_collateral_phi_eta(ax)

    def _phi_eta(self):
        x = np.asarray(self.data.x)
        eta = np.asarray(self.data.eta)
        phi = x[:, 1] if x.shape[1] > 1 else np.zeros(len(eta))
        return phi, eta

    def plot_phi_eta(self, ax=None) -> Plot:
        plot = Plot(ax=ax)
        pid = np.asarray(self.data.particle_id)
        nm = self._nm
        phi, eta = self._phi_eta()
        other = nm & ~np.isin(pid, self.selected_pids)
        plot.ax.scatter(phi[other], eta[other], s=2, c="lightgray")
        for p in self.selected_pids:
            sel = nm & (pid == p)
            plot.ax.scatter(phi[sel], eta[sel], s=12, color=self._color(p))
        if self.labels is not None:
            self.plot_collateral_phi_eta(plot.ax)
        plot.ax.set_xlabel(r"$\phi$")
        plot.ax.set_ylabel(r"$\eta$")
        return plot
