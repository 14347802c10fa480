"""Tracking-efficiency plots (capability parity: reference
``analysis/efficiencies.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gnn_tracking_tpu.analysis.plotutils import Plot
from gnn_tracking_tpu.utils.nomenclature import variable_manager


class TracksVsDBSCANPlot(Plot):
    """Tracking metrics vs DBSCAN eps (reference ``efficiencies.py:8-55``)."""

    def __init__(self, df: pd.DataFrame, **kwargs):
        super().__init__(**kwargs)
        self.df = df
        self.ax.set_xlabel("DBSCAN eps")

    def plot_var(self, var: str, label: str | None = None, **kwargs) -> None:
        self.ax.plot(self.df["eps"], self.df[var], label=label or var, **kwargs)
        if f"{var}_std" in self.df:
            self.ax.fill_between(
                self.df["eps"],
                self.df[var] - self.df[f"{var}_std"],
                self.df[var] + self.df[f"{var}_std"],
                alpha=0.3,
            )
        self.ax.legend()


class PerformancePlot(Plot):
    """Stairs + errorbars of tracking metrics vs pt or eta
    (reference ``efficiencies.py:58-132``)."""

    def __init__(self, var: str = "pt", **kwargs):
        super().__init__(**kwargs)
        self.var = var
        self.ax.set_xlabel(variable_manager[var].latex_with_unit)
        self.ax.set_ylabel("Efficiency")
        self.ax.set_ylim(0, 1.05)

    def plot_metric(
        self, df: pd.DataFrame, metric: str, *, label: str | None = None, color=None
    ) -> None:
        lo = df[f"{self.var}_min"].to_numpy()
        hi = df[f"{self.var}_max"].to_numpy()
        edges = np.concatenate([lo, hi[-1:]])
        vals = df[metric].to_numpy()
        self.ax.stairs(vals, edges, label=label or metric, color=color)
        err_col = f"{metric}_err"
        if err_col in df:
            centers = (lo + hi) / 2
            self.ax.errorbar(
                centers, vals, yerr=df[err_col], fmt="none", color=color, capsize=2
            )
        self.ax.legend()


class PerformanceComparisonPlot(PerformancePlot):
    """Compare one metric across several runs (reference
    ``efficiencies.py:135-185``)."""

    def __init__(self, metric: str, var: str = "pt", **kwargs):
        super().__init__(var=var, **kwargs)
        self.metric = metric

    def add_run(self, df: pd.DataFrame, label: str, color=None) -> None:
        self.plot_metric(df, self.metric, label=label, color=color)
