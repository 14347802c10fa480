"""Event/point-cloud/graph plotting (capability parity: reference
``utils/plotting.py``): raw-event views in (eta, phi), (r, z), (u, v);
sectored point clouds; graphs with true/false edge coloring; 3D views."""

from __future__ import annotations

import numpy as np

from gnn_tracking_tpu.graphs import EventGraph


def use_experiment_style() -> bool:
    """Apply the CMS plotting style when ``mplhep`` is installed
    (reference ``plotting.py:15``); returns whether it was applied."""
    try:
        import matplotlib.pyplot as plt
        import mplhep

        plt.style.use(mplhep.style.CMS)
        return True
    except ImportError:
        return False


class EventPlotter:
    """Raw-event scatter views (reference ``plotting.py:18-76``)."""

    def __init__(self, indir):
        from gnn_tracking_tpu.preprocessing.point_cloud_builder import (
            simple_data_loader,
        )

        self.indir = indir
        self._loader = simple_data_loader

    def get_hits(self, evtid: int):
        prefix = f"{self.indir}/event{evtid:09}"
        hits, particles, truth, cells = self._loader(prefix)
        hits["r"] = np.sqrt(hits.x**2 + hits.y**2)
        hits["phi"] = np.arctan2(hits.y, hits.x)
        theta = np.arctan2(hits["r"], hits["z"])
        hits["eta"] = -np.log(np.tan(theta / 2))
        rho2 = hits.x**2 + hits.y**2
        hits["u"], hits["v"] = hits.x / rho2, hits.y / rho2
        return hits

    def plot_ep_rv_uv(self, evtid: int = 0):
        from matplotlib import pyplot as plt

        hits = self.get_hits(evtid)
        fig, axs = plt.subplots(1, 3, figsize=(15, 4))
        for ax, (a, b) in zip(axs, [("eta", "phi"), ("z", "r"), ("u", "v")]):
            ax.scatter(hits[a], hits[b], s=1)
            ax.set_xlabel(a)
            ax.set_ylabel(b)
        return fig, axs


class PointCloudPlotter:
    """Sectored point-cloud views (reference ``plotting.py:79-175``)."""

    def __init__(self, graphs: list[EventGraph]):
        self.graphs = graphs

    def plot_sectors(self, coords=(1, 3)):
        from matplotlib import pyplot as plt

        fig, ax = plt.subplots()
        for g in self.graphs:
            x = np.asarray(g.x)[np.asarray(g.node_mask)]
            sector = np.asarray(g.sector)[np.asarray(g.node_mask)]
            ax.scatter(x[:, coords[0]], x[:, coords[1]], s=1, c=sector, cmap="tab20")
        return fig, ax


class GraphPlotter:
    """Graph views with true/false edge coloring
    (reference ``plotting.py:178-388``)."""

    def __init__(self, data: EventGraph):
        self.data = data

    def plot_rz(self, ax=None, max_edges: int = 5000):
        from matplotlib import pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        x = np.asarray(self.data.x)
        nm = np.asarray(self.data.node_mask)
        r, z = x[:, 0], x[:, 2]
        ax.scatter(z[nm], r[nm], s=1, c="k")
        ei = np.asarray(self.data.edge_index)
        em = np.asarray(self.data.edge_mask)
        y = np.asarray(self.data.y)
        idx = np.where(em)[0][:max_edges]
        for i in idx:
            a, b = ei[0, i], ei[1, i]
            ax.plot(
                [z[a], z[b]], [r[a], r[b]],
                color="g" if y[i] else "r",
                alpha=0.6 if y[i] else 0.1,
                lw=0.5,
            )
        ax.set_xlabel("z")
        ax.set_ylabel("r")
        return ax

    def plot_3d(self, max_edges: int = 2000):
        from matplotlib import pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        x = np.asarray(self.data.x)
        nm = np.asarray(self.data.node_mask)
        r, phi, z = x[:, 0], x[:, 1], x[:, 2]
        px, py = r * np.cos(phi), r * np.sin(phi)
        ax.scatter(px[nm], py[nm], z[nm], s=1)
        ei = np.asarray(self.data.edge_index)
        em = np.asarray(self.data.edge_mask)
        y = np.asarray(self.data.y)
        idx = np.where(em)[0][:max_edges]
        for i in idx:
            a, b = ei[0, i], ei[1, i]
            ax.plot(
                [px[a], px[b]], [py[a], py[b]], [z[a], z[b]],
                color="g" if y[i] else "r",
                alpha=0.5 if y[i] else 0.05,
                lw=0.5,
            )
        return fig, ax


def plot_rz(data: EventGraph, ax=None, **kwargs):
    """Convenience wrapper (reference ``plotting.py:390``)."""
    return GraphPlotter(data).plot_rz(ax=ax, **kwargs)


def plot_3d(data: EventGraph, **kwargs):
    """Convenience wrapper (reference ``plotting.py:435``)."""
    return GraphPlotter(data).plot_3d(**kwargs)
