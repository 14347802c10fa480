"""Point-cloud building: TrackML CSV events → EventGraph point clouds.

Capability parity: reference ``preprocessing/point_cloud_builder.py``.
Feature engineering (r, phi, z, eta, u, v, charge_frac + ExaTrkX cell-shape
angles), noise handling, azimuthal sectorization with extended overlap,
reconstructability flags, optional true edges. Host-side ETL (pandas/numpy,
vectorized — e.g. the per-particle sector-majority python loop of the
reference, ``point_cloud_builder.py:256-268``, becomes a groupby), emitting
``.npz`` EventGraphs for the TPU training pipeline.
"""

from __future__ import annotations

import logging
import traceback
from pathlib import Path, PurePath
from typing import Any

import numpy as np
import pandas as pd

import gnn_tracking_tpu.preprocessing.exatrkx_cell_features as ecf
from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.utils.loading import save_graph
from gnn_tracking_tpu.utils.log import get_logger


def get_truth_edge_index(pids: np.ndarray) -> np.ndarray:
    """All intra-particle hit pairs, one direction only
    (reference ``point_cloud_builder.py:20-37``)."""
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    # run boundaries of equal pids
    edges = []
    n = len(pids)
    start = 0
    for end in range(1, n + 1):
        if end == n or sorted_pids[end] != sorted_pids[start]:
            if sorted_pids[start] != 0 and end - start > 1:
                members = np.sort(order[start:end])
                iu = np.triu_indices(len(members), k=1)
                edges.append(np.stack([members[iu[0]], members[iu[1]]]))
            start = end
    if not edges:
        return np.zeros((2, 0), dtype=np.int64)
    return np.concatenate(edges, axis=1)


DEFAULT_FEATURES = (
    "r",
    "phi",
    "z",
    "eta_rz",
    "u",
    "v",
    "charge_frac",
    "leta",
    "lphi",
    "lx",
    "ly",
    "lz",
    "geta",
    "gphi",
)
_DEFAULT_FEATURE_SCALE = tuple(1.0 for _ in DEFAULT_FEATURES)

#: TrackML pixel subdetector (volume, layer) pairs
#: (reference ``point_cloud_builder.py:164-167``)
PIXEL_LAYERS = sorted(
    [(8, 2), (8, 4), (8, 6), (8, 8)]
    + [(7, 14), (7, 12), (7, 10), (7, 8), (7, 6), (7, 4), (7, 2)]
    + [(9, 2), (9, 4), (9, 6), (9, 8), (9, 10), (9, 12), (9, 14)]
)


def simple_data_loader(f) -> tuple[pd.DataFrame, ...]:
    """Read the four per-event CSVs (reference
    ``point_cloud_builder.py:471-479``)."""
    f = str(f)
    suffix = ".csv.gz"
    cells = pd.read_csv(f + "-cells" + suffix, header=0, index_col=False)
    hits = pd.read_csv(f + "-hits" + suffix, header=0, index_col=False)
    truth = pd.read_csv(f + "-truth" + suffix, header=0, index_col=False)
    particles = pd.read_csv(f + "-particles" + suffix, header=0, index_col=False)
    return hits, particles, truth, cells


class PointCloudBuilder:
    """Build point clouds from raw TrackML event files
    (reference ``point_cloud_builder.py:71-469``)."""

    def __init__(
        self,
        *,
        outdir: str | PurePath,
        indir: str | PurePath,
        detector_config: str | PurePath,
        n_sectors: int,
        redo: bool = True,
        pixel_only: bool = True,
        sector_di: float = 0.0001,
        sector_ds: float = 1.1,
        measurement_mode: bool = False,
        thld: float = 0.5,
        remove_noise: bool = False,
        write_output: bool = True,
        log_level=logging.INFO,
        collect_data: bool = True,
        feature_names: tuple = DEFAULT_FEATURES,
        feature_scale: tuple = _DEFAULT_FEATURE_SCALE,
        add_true_edges: bool = False,
        relabel_pids: bool = True,
    ):
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.indir = Path(indir)
        self.n_sectors = n_sectors
        self.redo = redo
        self.pixel_only = pixel_only
        self.sector_di = sector_di
        self.sector_ds = sector_ds
        self.measurement_mode = measurement_mode
        self.thld = thld
        self.remove_noise = remove_noise
        self.write_output = write_output
        self.feature_names = list(feature_names)
        self.feature_scale = np.asarray(feature_scale, dtype=float)
        assert len(self.feature_names) == len(self.feature_scale)
        self.add_true_edges = add_true_edges
        #: Relabel 64-bit TrackML particle ids to dense per-event int32
        #: (0 stays noise). TPU default integer width is 32 bits; raw TrackML
        #: ids (~9e17) would overflow. Original ids go to
        #: ``extras["particle_id_original"]``.
        self.relabel_pids = relabel_pids
        self.stats: dict[int, dict[str, Any]] = {}
        self.measurements: list[dict[str, Any]] = []
        self.data_list: list[EventGraph] = []
        self._collect_data = collect_data
        self.logger = get_logger("PointCloudBuilder", level=log_level)

        suffix = "-hits.csv.gz"
        self.prefixes: list[Path] = []
        self.exists: dict[str, bool] = {}
        outfiles = {child.name for child in self.outdir.iterdir()}
        for p in sorted(self.indir.iterdir()):
            if p.name.endswith(suffix):
                prefix = p.name.replace(suffix, "")
                evtid = int(prefix[-9:])
                for s in range(self.n_sectors):
                    key = f"data{evtid}_s{s}.npz"
                    self.exists[key] = key in outfiles
                self.prefixes.append(self.indir / prefix)

        self._detector = ecf.load_detector(Path(detector_config))[1]

    # ------------------------------------------------------------------
    @staticmethod
    def calc_eta(r: np.ndarray, z: np.ndarray) -> np.ndarray:
        """Pseudorapidity from cylinder coordinates."""
        theta = np.arctan2(r, z)
        return -np.log(np.tan(theta / 2.0))

    def restrict_to_subdetectors(
        self, hits: pd.DataFrame, cells: pd.DataFrame
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Relabel (volume, layer) pairs to consecutive integers; optionally
        keep only pixel layers (reference ``point_cloud_builder.py:162-195``)."""
        if self.pixel_only:
            allowed = PIXEL_LAYERS
        else:
            allowed = sorted(
                set(zip(hits["volume_id"].tolist(), hits["layer_id"].tolist()))
            )
        new_layer_ids = {vl: i for i, vl in enumerate(allowed)}
        keys = list(zip(hits["volume_id"].tolist(), hits["layer_id"].tolist()))
        hits = hits.copy()
        hits["layer"] = [new_layer_ids.get(k, -1) for k in keys]
        hits = hits[hits["layer"] >= 0]
        cells = cells[cells.hit_id.isin(hits.hit_id)].copy()
        return hits, cells

    def append_features(
        self,
        hits: pd.DataFrame,
        particles: pd.DataFrame,
        truth: pd.DataFrame,
        cells: pd.DataFrame,
    ) -> pd.DataFrame:
        """Engineer the node features (reference
        ``point_cloud_builder.py:197-240``)."""
        particles = particles.copy()
        particles["pt"] = np.sqrt(particles.px**2 + particles.py**2)
        particles["eta_pt"] = self.calc_eta(particles.pt, particles.pz)

        truth_noise = truth[["hit_id", "particle_id"]][truth.particle_id == 0].copy()
        truth_noise["pt"] = 0.0
        truth_noise["eta_pt"] = 0.0
        truth = truth[["hit_id", "particle_id"]].merge(
            particles[["particle_id", "pt", "eta_pt"]], on="particle_id"
        )
        if not self.remove_noise:
            truth = pd.concat([truth, truth_noise])

        cells_agg = cells.groupby("hit_id")["value"].agg(["sum", "size"])
        cells_agg["charge_frac"] = cells_agg["sum"] / cells_agg["size"]
        hits = hits.merge(
            cells_agg[["charge_frac"]], left_on="hit_id", right_index=True, how="left"
        )

        hits = ecf.augment_hit_features(hits, cells, detector_proc=self._detector)

        hits["r"] = np.sqrt(hits.x**2 + hits.y**2)
        hits["phi"] = np.arctan2(hits.y, hits.x)
        hits["eta_rz"] = self.calc_eta(hits["r"], hits["z"])
        rho2 = hits["x"] ** 2 + hits["y"] ** 2
        hits["u"] = hits["x"] / rho2
        hits["v"] = hits["y"] / rho2
        return hits.merge(truth[["hit_id", "particle_id", "pt", "eta_pt"]], on="hit_id")

    def sector_hits(
        self, hits: pd.DataFrame, sector_id: int, particle_id_counts: pd.DataFrame
    ) -> pd.DataFrame:
        """Extended azimuthal sector with majority-based particle-to-sector
        assignment (reference ``point_cloud_builder.py:242-333``). The
        per-particle loop of the reference is vectorized as a groupby."""
        hits = hits.copy()
        if self.n_sectors == 1:
            hits["sector"] = 0
            return hits

        theta = np.pi / self.n_sectors
        slope = np.arctan(theta)
        cos_t, sin_t = np.cos(2 * sector_id * theta), np.sin(2 * sector_id * theta)
        hits["ur"] = hits["u"] * cos_t - hits["v"] * sin_t
        hits["vr"] = hits["u"] * sin_t + hits["v"] * cos_t

        in_sector = (
            (hits.vr > -slope * hits.ur) & (hits.vr < slope * hits.ur) & (hits.ur > 0)
        )
        sector = hits[in_sector]

        # particle → sector if >= 50% of its hits are in the strict sector
        counts_total = particle_id_counts.set_index("particle_id")["n_hits"]
        counts_in = sector[sector.particle_id != 0].groupby("particle_id").size()
        frac = (counts_in / counts_total.reindex(counts_in.index)).fillna(0)
        assigned = set(frac[frac >= 0.5].index)

        lower = -self.sector_ds * slope * hits.ur - self.sector_di
        upper = self.sector_ds * slope * hits.ur + self.sector_di
        extended = hits[(hits.vr > lower) & (hits.vr < upper) & (hits.ur > 0)].copy()
        extended["sector"] = [
            sector_id if pid in assigned else -1 for pid in extended["particle_id"]
        ]

        if self.measurement_mode:
            m: dict[str, Any] = {
                "n_hits": len(sector),
                "n_hits_ext": len(extended),
                "n_hits_ratio": len(extended) / len(sector) if len(sector) else 0,
                "n_unique_pids": extended["particle_id"].nunique(),
            }
            majority_contained = []
            for pid in extended["particle_id"].unique():
                if pid == 0:
                    continue
                group = hits[hits.particle_id == pid]
                strict = (
                    (group.vr < slope * group.ur)
                    & (group.vr > -slope * group.ur)
                    & (group.pt >= self.thld)
                )
                n_total = counts_total.get(pid, 0)
                if n_total == 0 or strict.sum() / n_total < 0.5:
                    continue
                ext = (
                    (group.vr < (self.sector_ds * slope * group.ur + self.sector_di))
                    & (group.vr > (-self.sector_ds * slope * group.ur - self.sector_di))
                    & (group.pt > self.thld)
                )
                majority_contained.append(ext.sum() == n_total)
            m["majority_contained"] = (
                sum(majority_contained) / len(majority_contained)
                if majority_contained
                else 0
            )
            self.measurements.append(m)
        return extended

    def to_graph(self, hits: pd.DataFrame) -> EventGraph:
        """Build the EventGraph (reference ``to_pyg_data``,
        ``point_cloud_builder.py:336-353``)."""
        pid = hits["particle_id"].to_numpy()
        extras = {
            "n_hits": np.asarray(hits["n_hits"].to_numpy()),
            "n_layers_hit": np.asarray(hits["n_layers_hit"].to_numpy()),
        }
        # Exact z-reflection companions (geta, gphi of the mirrored
        # cluster), scaled like their x columns — consumed by the
        # ZReflection augmentation (utils/augmentation.py).
        if "geta_refl" in hits.columns:
            scale = np.ones(2)
            for i, name in enumerate(("geta", "gphi")):
                if name in self.feature_names:
                    scale[i] = self.feature_scale[self.feature_names.index(name)]
            extras["cell_refl"] = (
                hits[["geta_refl", "gphi_refl"]].to_numpy() / scale
            ).astype(np.float32)
        if self.relabel_pids:
            extras["particle_id_original"] = pid.astype(np.int64)
            unique = np.unique(pid[pid != 0])
            dense = np.searchsorted(unique, pid) + 1
            pid = np.where(pid == 0, 0, dense).astype(np.int32)
        true_edges = (
            get_truth_edge_index(pid) if self.add_true_edges else np.zeros((2, 0), int)
        )
        x = hits[self.feature_names].to_numpy() / self.feature_scale
        return EventGraph.from_arrays(
            x=x.astype(np.float32),
            particle_id=pid,
            pt=hits["pt"].to_numpy(),
            eta=hits["eta_pt"].to_numpy(),
            reconstructable=hits["reconstructable"].to_numpy().astype(float),
            layer=hits["layer"].to_numpy(),
            sector=hits["sector"].to_numpy(),
            true_edge_index=true_edges,
            extras=extras,
            numpy=True,  # host ETL: never device_put through the tunnel
        )

    def get_measurements(self) -> dict[str, float]:
        df = pd.DataFrame(self.measurements)
        means, stds = df.mean(), df.std()
        out = {}
        for var in means.index:
            out[var] = means[var]
            out[var + "_err"] = stds[var]
        return out

    def process(
        self,
        start: int | None = None,
        stop: int | None = None,
        ignore_loading_errors: bool = False,
    ) -> list[EventGraph] | None:
        """Process event files [start:stop] (reference
        ``point_cloud_builder.py:365-469``)."""
        out_graphs: list[EventGraph] = []
        for f in self.prefixes[start:stop]:
            evtid = int(f.name[-9:])
            try:
                hits, particles, truth, cells = simple_data_loader(f)
            except Exception:
                if ignore_loading_errors:
                    self.logger.error("Error loading event %d", evtid)
                    self.logger.error(traceback.format_exc())
                    continue
                raise

            hits, cells = self.restrict_to_subdetectors(hits, cells)
            hits = self.append_features(hits, particles, truth, cells)

            pid_layer_count = (
                hits.groupby("particle_id")
                .agg(n_hits=("particle_id", "size"), n_layers_hit=("layer_id", "nunique"))
                .reset_index()
            )
            hits = hits.merge(pid_layer_count, on="particle_id", how="left")
            hits["reconstructable"] = (hits["n_layers_hit"] >= 3) & (
                hits["particle_id"] > 0
            )

            n_sector_hits = 0
            n_sector_particles = 0
            for s in range(self.n_sectors):
                name = f"data{evtid}_s{s}.npz"
                if self.exists.get(name) and not self.redo:
                    self.logger.debug("skipping %s", name)
                    continue
                sector_df = self.sector_hits(
                    hits, s, particle_id_counts=pid_layer_count[["particle_id", "n_hits"]]
                )
                n_sector_hits += len(sector_df)
                n_sector_particles += sector_df["particle_id"].nunique()
                graph = self.to_graph(sector_df)
                if self.write_output:
                    save_graph(graph, self.outdir / name)
                if self._collect_data:
                    self.data_list.append(graph)
                out_graphs.append(graph)

            self.stats[evtid] = {
                "n_hits": len(hits),
                "n_particles": hits["particle_id"].nunique(),
                "n_noise": int((hits["particle_id"] == 0).sum()),
                "n_sector_hits": n_sector_hits,
                "n_sector_particles": n_sector_particles,
            }
        return out_graphs
