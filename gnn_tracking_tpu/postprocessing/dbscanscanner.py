"""DBSCAN hyperparameter scanning (capability parity: reference
``postprocessing/dbscanscanner.py``).

The trial loop runs on device: one precomputed radius graph per batch, then
each ``(eps, min_samples)`` trial is a jitted cluster + tracking-metrics
call. Host pandas is only used for the final cross-batch aggregation of the
small results table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from gnn_tracking_tpu.metrics.cluster_metrics import (
    flatten_track_metrics,
    tracking_metrics,
)
from gnn_tracking_tpu.ops.dbscan import dbscan as dbscan_op
from gnn_tracking_tpu.postprocessing.cluster_scanner import ClusterScanner
from gnn_tracking_tpu.postprocessing.fastrescanner import DBSCANFastRescan
from gnn_tracking_tpu.utils.dictionaries import add_key_prefix


def dbscan(x: np.ndarray, eps: float = 0.99, min_samples: int = 1) -> np.ndarray:
    """Convenience one-shot DBSCAN (reference ``dbscanscanner.py:23-25``)."""
    import jax.numpy as jnp

    return np.asarray(
        dbscan_op(jnp.asarray(x), eps=eps, min_samples=min_samples, max_num_neighbors=min(128, x.shape[0]))
    )


class OCScanResults:
    """Aggregated scan results (reference ``dbscanscanner.py:28-71``)."""

    def __init__(self, df: pd.DataFrame):
        self._parameters = ["eps", "min_samples"]
        self._df = df
        gb = self.df.groupby(self._parameters)
        _df_mean = gb.mean()
        _df_std = gb.std() / math.sqrt(max(len(_df_mean), 1))
        self._df_mean = _df_mean.merge(
            _df_std,
            left_on=self._parameters,
            right_on=self._parameters,
            suffixes=("", "_std"),
        ).reset_index()

    @property
    def df(self) -> pd.DataFrame:
        return self._df

    @property
    def df_mean(self) -> pd.DataFrame:
        return self._df_mean

    def get_foms(self, guide: str = "double_majority_pt0.9") -> dict[str, float]:
        fom_cols = [
            c
            for c in self._df_mean
            if c not in self._parameters and not str(c).startswith("i_batch")
        ]
        assert guide in fom_cols
        best_idx = self._df_mean[guide].idxmax()
        best_series = self._df_mean.iloc[best_idx]
        foms = add_key_prefix(best_series[fom_cols].to_dict(), "trk.")
        for param in self._parameters:
            foms[f"best_dbscan_{param}"] = best_series[param]
        return foms

    def get_n_best_trials(
        self, n: int, guide: str = "double_majority_pt0.9"
    ) -> list[dict[str, float]]:
        return (
            self._df_mean.sort_values(guide, ascending=False)
            .head(n)[self._parameters]
            .to_dict(orient="records")
        )


class DBSCANHyperParamScanner(ClusterScanner):
    """Random-search DBSCAN hyperparameter scan for validation, keeping the
    best trials across epochs (reference ``dbscanscanner.py:74-188``)."""

    def __init__(
        self,
        *,
        eps_range: tuple[float, float] = (0.0, 1.0),
        min_samples_range: tuple[int, int] = (1, 4),
        n_trials: int = 10,
        keep_best: int = 0,
        guide: str = "double_majority_pt0.9",
        pt_thlds: tuple[float, ...] = (0.0, 0.5, 0.9, 1.5),
        max_eta: float = 4.0,
        max_num_neighbors: int = 128,
        seed: int | None = None,
    ):
        self.eps_range = eps_range
        self.min_samples_range = min_samples_range
        self.n_trials = n_trials
        self.keep_best = keep_best
        self.guide = guide.removeprefix("trk.")
        self.pt_thlds = tuple(pt_thlds)
        self.max_eta = max_eta
        self.max_num_neighbors = max_num_neighbors
        self._rng = np.random.default_rng(seed)
        self._results: list[dict[str, float]] = []
        self._trials: list[dict[str, float]] = []
        self.reset()

    def get_results(self) -> OCScanResults:
        return OCScanResults(pd.DataFrame.from_records(self._results))

    def get_foms(self) -> dict[str, float]:
        return self.get_results().get_foms(self.guide)

    def _get_best_trials(self) -> list[dict[str, float]]:
        if not self._results:
            return []
        return self.get_results().get_n_best_trials(self.keep_best, self.guide)

    def _reset_trials(self) -> None:
        best = self._get_best_trials()
        size_random = self.n_trials - len(best)
        eps = self._rng.uniform(*self.eps_range, size=size_random)
        min_samples = self._rng.integers(
            self.min_samples_range[0], self.min_samples_range[1] + 1, size=size_random
        )
        self._trials = best + [
            {"eps": float(e), "min_samples": int(n)} for e, n in zip(eps, min_samples)
        ]

    def reset(self) -> None:
        self._reset_trials()
        self._results = []

    def __call__(self, data, out: dict, i_batch: int, progress: bool = False) -> None:
        if i_batch == 0:
            self.reset()
        node_mask = np.asarray(data.node_mask)
        hit_mask = out.get("ec_hit_mask")
        if hit_mask is not None:
            node_mask = node_mask & np.asarray(hit_mask)
        scanner = DBSCANFastRescan(
            np.asarray(out["H"]),
            max_eps=max(v["eps"] for v in self._trials),
            max_num_neighbors=self.max_num_neighbors,
            node_mask=node_mask,
        )
        all_labels = scanner.cluster_many(self._trials)
        for trial, labels in zip(self._trials, all_labels):
            metrics = tracking_metrics(
                truth=np.asarray(data.particle_id),
                predicted=labels,
                pts=np.asarray(data.pt),
                eta=np.asarray(data.eta),
                reconstructable=np.asarray(data.reconstructable),
                pt_thlds=self.pt_thlds,
                max_eta=self.max_eta,
                node_mask=node_mask,
            )
            self._results.append(
                {
                    "i_batch": i_batch,
                    "eps": trial["eps"],
                    "min_samples": trial["min_samples"],
                    **flatten_track_metrics(metrics),
                }
            )


class DBSCANHyperParamScannerFixed(DBSCANHyperParamScanner):
    """Fixed trial grid (reference ``dbscanscanner.py:190-212``)."""

    def __init__(self, trials: list[dict[str, float]], **kwargs):
        self._fixed_trials = trials
        super().__init__(n_trials=len(trials), **kwargs)

    def _reset_trials(self) -> None:
        self._trials = list(self._fixed_trials)


class DBSCANPerformanceDetails(ClusterScanner):
    """Detailed per-hit/per-cluster records at fixed DBSCAN parameters
    (reference ``dbscanscanner.py:215-264``)."""

    def __init__(self, eps: float, min_samples: int, max_num_neighbors: int = 128):
        self.eps = eps
        self.min_samples = min_samples
        self.max_num_neighbors = max_num_neighbors
        self._h_dfs: list[pd.DataFrame] = []
        self._c_dfs: list[pd.DataFrame] = []

    def __call__(self, data, out: dict, i_batch: int) -> None:
        import jax.numpy as jnp

        h = np.asarray(out["H"])
        node_mask = np.asarray(data.node_mask)
        labels = np.asarray(
            dbscan_op(
                jnp.asarray(h),
                eps=self.eps,
                min_samples=self.min_samples,
                max_num_neighbors=min(self.max_num_neighbors, h.shape[0]),
                node_mask=jnp.asarray(node_mask),
            )
        )
        h_df = pd.DataFrame(
            {
                "c": labels[node_mask],
                "id": np.asarray(data.particle_id)[node_mask],
                "reconstructable": np.asarray(data.reconstructable)[node_mask],
                "pt": np.asarray(data.pt)[node_mask],
                "eta": np.asarray(data.eta)[node_mask],
            }
        )
        # per-cluster dataframe via groupby (host-side analysis path)
        rows = []
        for c, sub in h_df[h_df.c >= 0].groupby("c"):
            counts = sub["id"].value_counts()
            best_count = counts.max()
            maj_pid = min(p for p, k in counts.items() if k == best_count)
            maj_hits = best_count
            pid_all = (h_df["id"] == maj_pid).sum()
            rows.append(
                {
                    "c": c,
                    "maj_pid": maj_pid,
                    "maj_hits": maj_hits,
                    "cluster_size": len(sub),
                    "maj_pid_hits": pid_all,
                    "maj_frac": maj_hits / len(sub),
                    "maj_pid_frac": maj_hits / pid_all,
                }
            )
        self._h_dfs.append(h_df)
        self._c_dfs.append(pd.DataFrame.from_records(rows))

    def get_results(self) -> tuple[list[pd.DataFrame], list[pd.DataFrame]]:
        return self._h_dfs, self._c_dfs

    def get_foms(self) -> dict[str, float]:
        return {}
