"""k-scanner: find the kNN k that hits target segment fractions.

Capability parity: reference ``graph_construction/k_scanner.py``. Scans k for
embedding-space kNN graph building; cubic-spline interpolation of figures of
merit vs k; reports edge counts at target 50%-segment fractions and
perfect-EC tracking-metric upper bounds. The per-k graph build + segment
fractions + CC labels all run on device.
"""

from __future__ import annotations

import math
from functools import cached_property

import numpy as np
import pandas as pd
from scipy.interpolate import CubicSpline
from scipy.optimize import minimize

from gnn_tracking_tpu.analysis.graphs import get_cc_labels, get_largest_segment_fracs
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.metrics.cluster_metrics import (
    flatten_track_metrics,
    tracking_metrics_data,
)
from gnn_tracking_tpu.metrics.graph_construction import get_efficiency_purity_edges
from gnn_tracking_tpu.ops.knn import knn_with_max_radius
from gnn_tracking_tpu.utils.dictionaries import add_key_prefix
from gnn_tracking_tpu.utils.log import logger


class KScanResults:
    """Interpolated scan results (reference ``k_scanner.py:31-141``)."""

    _extra_metrics = ("k", "frac75", "frac100", "efficiency", "purity")

    def __init__(self, results: pd.DataFrame, targets):
        self.df = results.sort_values("k")
        self.df["k"] = self.df.index
        self.targets = targets

    def get_foms(self) -> dict[str, float]:
        foms = {}
        for t in self.targets:
            fat = self._get_foms_at_target(t)
            foms[f"n_edges_frac_segment50_{t * 100:.0f}"] = fat["n_edges"]
            for v in self._extra_metrics:
                foms[f"{v}_at_segment50_{t * 100:.0f}"] = fat[v]
        idx_max = self.df["frac50"].argmax()
        fat = self.df.iloc[idx_max]
        foms["max_frac_segment50"] = fat["frac50"]
        foms["n_edges_max_frac_segment50"] = fat["n_edges"]
        for v in self._extra_metrics:
            foms[f"{v}_at_max_frac_segment50"] = fat[v]
        return foms

    @cached_property
    def _spline(self):
        nan_col_mask = self.df.isna().any()
        nan_cols = list(self.df.columns[nan_col_mask])
        not_nan_cols = list(self.df.columns[~nan_col_mask])
        return CubicSpline(self.df["k"], self.df[not_nan_cols]), nan_cols, not_nan_cols

    def _eval_spline(self, k: float) -> dict[str, float]:
        spline, nan_cols, not_nan_cols = self._spline
        vals = np.asarray(spline(k)).squeeze().tolist()
        result = dict(zip(not_nan_cols, vals))
        for c in nan_cols:
            result[c] = float("nan")
        return result

    def _get_target_k(self, target: float) -> float:
        if target > self.df["frac50"].max():
            return float("nan")
        bounds = (float(self.df["k"].min()), float(self.df["k"].max()))
        x0 = sum(bounds) / 2
        return float(
            minimize(
                lambda k: np.abs(
                    self._eval_spline(np.asarray(k).item())["frac50"] - target
                ),
                x0=x0,
                bounds=(bounds,),
            ).x.item()
        )

    def _get_foms_at_target(self, target: float) -> dict[str, float]:
        nan_results = {k: float("nan") for k in self.df.columns}
        if len(self.df) < 2:
            return nan_results
        target_k = self._get_target_k(target)
        if math.isnan(target_k):
            return nan_results
        return self._eval_spline(target_k)


_DEFAULT_KS = list(range(1, 10))


class GraphConstructionKNNScanner:
    """Scan k for kNN graph construction in embedding space
    (reference ``k_scanner.py:147-285``)."""

    def __init__(
        self,
        ks: list[int] = _DEFAULT_KS,
        *,
        targets=(0.8, 0.85, 0.88, 0.9, 0.93, 0.95, 0.97, 0.99),
        max_radius: float = 1.0,
        pt_thld: float = 0.9,
        max_eta: float = 4.0,
        subsample_pids: int | None = None,
        max_edges: int = 5_000_000,
    ):
        self.ks = list(ks)
        self.targets = targets
        self.max_radius = max_radius
        self.pt_thld = pt_thld
        self.max_eta = max_eta
        self.subsample_pids = subsample_pids
        self.max_edges = max_edges
        self._results: list[dict[str, float]] = []

    @property
    def results_raw(self) -> pd.DataFrame:
        return pd.DataFrame.from_records(self._results)

    def get_results(self) -> KScanResults:
        mean_results = self.results_raw.groupby("k").mean()
        return KScanResults(mean_results, targets=self.targets)

    def get_foms(self) -> dict[str, float]:
        return self.get_results().get_foms()

    def reset(self) -> None:
        self._results = []

    def __call__(self, data: EventGraph, i_batch: int, *, latent=None) -> None:
        if i_batch == 0:
            self.reset()
        if latent is not None:
            data = data.replace(x=latent)
        for k in self.ks:
            r = self._evaluate_graph(data, k)
            if r is None:
                break
            self._results.append(r)

    def _evaluate_tracking_metrics_upper_bounds(self, data: EventGraph) -> dict:
        """Perfect-EC upper bounds of the tracking metrics
        (reference ``k_scanner.py:231-243``, arXiv:2309.16754)."""
        labels = get_cc_labels(
            data.edge_index,
            num_nodes=data.num_nodes,
            edge_mask=data.edge_mask & data.y.astype(bool),
            node_mask=data.node_mask,
        )
        return add_key_prefix(
            flatten_track_metrics(
                tracking_metrics_data(data, np.asarray(labels), [0.9])
            ),
            "max_",
        )

    def _evaluate_graph(self, data: EventGraph, k: int) -> dict | None:
        edge_index, edge_mask = knn_with_max_radius(
            data.x, k=min(k, data.num_nodes - 1), max_radius=self.max_radius,
            node_mask=data.node_mask, batch=data.batch,
        )
        n_edges = int(np.asarray(edge_mask).sum())
        if n_edges > self.max_edges:
            logger.warning(
                "Not scanning k>=%d because max edges exceeded (%d > %d)",
                k, n_edges, self.max_edges,
            )
            return None
        pid = data.particle_id
        y = (pid[edge_index[0]] == pid[edge_index[1]]) & edge_mask
        gk = data.replace(edge_index=edge_index, edge_mask=edge_mask, y=y)
        lsfs = get_largest_segment_fracs(
            gk,
            n_particles_sampled=self.subsample_pids,
            pt_thld=self.pt_thld,
            max_eta=self.max_eta,
        )
        return {
            "k": k,
            "frac50": float((lsfs > 0.5).mean()),
            "frac75": float((lsfs > 0.75).mean()),
            "frac100": float((lsfs == 1).mean()),
            "n_edges": n_edges,
            **get_efficiency_purity_edges(
                gk, pt_thld=self.pt_thld, max_eta=self.max_eta
            ),
            **self._evaluate_tracking_metrics_upper_bounds(gk),
        }
