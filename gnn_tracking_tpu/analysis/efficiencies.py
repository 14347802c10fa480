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

    def plot_var(
        self,
        var: str,
        label: str | None = None,
        *,
        secondary_k: int = 0,
        **kwargs,
    ) -> None:
        """Plot one metric vs eps; ``secondary_k`` adds a dotted companion
        line for that ``min_samples`` value (reference
        ``efficiencies.py:27-55`` draws min_samples==1 solid + ==k dotted
        when the scan dataframe carries a ``min_samples`` column)."""
        df = self.df
        if "min_samples" in df and secondary_k:
            primary = df[df["min_samples"] == 1]
        else:
            primary = df
        (line,) = self.ax.plot(
            primary["eps"], primary[var], label=label or var, marker="o",
            **kwargs,
        )
        if f"{var}_std" in primary:
            self.ax.fill_between(
                primary["eps"],
                primary[var] - primary[f"{var}_std"],
                primary[var] + primary[f"{var}_std"],
                alpha=0.3,
                color=line.get_color(),
            )
        if "min_samples" in df and secondary_k:
            sec = df[df["min_samples"] == secondary_k]
            self.ax.plot(
                sec["eps"], sec[var], ls=":", color=line.get_color(),
                label="_hide", **kwargs,
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

    def add_blocked(
        self, a: float, b: float, label: str = "Not trained for"
    ) -> None:
        """Gray out an untrained variable range (reference
        ``efficiencies.py:122-127``)."""
        self.ax.axvspan(a, b, alpha=0.3, color="gray", label=label)

    def add_legend(self, **kwargs) -> None:
        self.ax.legend(**kwargs)


class PerformanceComparisonPlot(PerformancePlot):
    """Compare one metric across several runs (reference
    ``efficiencies.py:135-185``)."""

    def __init__(self, metric: str, var: str = "pt", **kwargs):
        super().__init__(var=var, **kwargs)
        self.metric = metric

    def add_run(self, df: pd.DataFrame, label: str, color=None) -> None:
        self.plot_metric(df, self.metric, label=label, color=color)
