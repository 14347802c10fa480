"""Edge-classification analysis across thresholds
(capability parity: reference ``analysis/edge_classification.py``)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from gnn_tracking_tpu.analysis.graphs import (
    get_orphan_counts,
    get_track_graph_info_from_data,
    summarize_track_graph_info,
)
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.metrics.binary_classification import BinaryClassificationStats
from gnn_tracking_tpu.utils.dictionaries import add_key_suffix
from gnn_tracking_tpu.utils.graph_masks import (
    get_edge_mask_from_node_mask,
    get_good_node_mask,
)


def get_all_ec_stats(
    threshold: float,
    w: np.ndarray,
    data: EventGraph,
    *,
    pt_thld: float = 0.9,
    max_eta: float = 4.0,
) -> dict[str, float]:
    """EC + graph-construction performance at one threshold
    (reference ``edge_classification.py:24-64``). ``*_thld`` metrics are
    restricted to edges between good (pt/eta/reco) hits."""
    import jax.numpy as jnp

    w = jnp.asarray(w)
    good_edges = (
        get_edge_mask_from_node_mask(
            get_good_node_mask(data, pt_thld=pt_thld, max_eta=max_eta),
            data.edge_index,
        )
        & data.edge_mask
    )
    bcs = BinaryClassificationStats(w, data.y, threshold, mask=data.edge_mask)
    bcs_thld = BinaryClassificationStats(w, data.y, threshold, mask=good_edges)
    return (
        {"threshold": threshold}
        | bcs.get_all()
        | add_key_suffix(bcs_thld.get_all(), "_thld")
        | get_orphan_counts(data, pt_thld=pt_thld)._asdict()
        | summarize_track_graph_info(
            get_track_graph_info_from_data(
                data, w=np.asarray(w), threshold=threshold, pt_thld=pt_thld
            )
        )
    )


def collect_all_ec_stats(
    model_fn,
    data_loader,
    thresholds: Sequence[float],
    n_batches: int | None = None,
    pt_thld: float = 0.9,
) -> pd.DataFrame:
    """Map `get_all_ec_stats` over a data loader and average per threshold
    with standard errors (reference ``edge_classification.py:67-112``).

    ``model_fn(data) -> {"W": ...}`` is any callable (e.g. a bound
    ``module.forward``).
    """
    records: list[dict[str, float]] = []
    for idx, data in enumerate(data_loader):
        w = np.asarray(model_fn(data)["W"])
        for threshold in thresholds:
            records.append(get_all_ec_stats(threshold, w, data, pt_thld=pt_thld))
        if n_batches is not None and idx >= n_batches - 1:
            break

    n_b = len(records) // len(thresholds)
    averaged = []
    for i, _t in enumerate(thresholds):
        batch_records = records[i :: len(thresholds)]
        keys = batch_records[0].keys()
        stacked = {k: np.array([r[k] for r in batch_records]) for k in keys}
        averaged.append(
            {k: float(np.mean(v)) for k, v in stacked.items()}
            | {f"{k}_err": float(np.std(v) / np.sqrt(n_b)) for k, v in stacked.items()}
        )
    return pd.DataFrame.from_records(averaged)


class ThresholdTrackInfoPlot:
    """Plot track-connectivity info vs EC threshold
    (reference ``edge_classification.py:115-224``)."""

    def __init__(self, df: pd.DataFrame):
        self.df = df
        self.ax = None

    def plot(self):
        from matplotlib import pyplot as plt

        _, self.ax = plt.subplots()
        self.plot_frac_segments()
        self.plot_tpr_fpr()
        self.add_legend()
        return self.ax

    def plot_frac_segments(self) -> None:
        for col, color in [("frac_segment50", "C0"), ("frac_segment75", "C1"), ("frac_segment100", "C2")]:
            if col in self.df:
                self.ax.plot(self.df["threshold"], self.df[col], label=col, color=color)

    def plot_tpr_fpr(self) -> None:
        for col, color in [("TPR_thld", "C3"), ("FPR_thld", "C4"), ("MCC_thld", "C5")]:
            if col in self.df:
                self.ax.plot(
                    self.df["threshold"], self.df[col], label=col, color=color, ls="--"
                )

    def add_legend(self) -> None:
        self.ax.set_xlabel("EC threshold")
        self.ax.legend()
