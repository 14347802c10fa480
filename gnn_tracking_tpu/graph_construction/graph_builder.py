"""Geometric graph construction: point clouds → candidate-edge graphs.

Capability parity: reference ``graph_construction/graph_builder.py``.
Candidate edges connect hits on adjacent detector layers passing cuts on
``phi_slope``, ``z0``, ``dR``; ambiguous barrel↔endcap edges are removed by
the intersecting-line cut and the per-particle truth precedence correction
(reference ``:192-306``, after arXiv:2103.16701 Fig. 3). Host-side ETL with
vectorized numpy per-layer-pair joins, emitting ``.npz`` EventGraphs.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.preprocessing.point_cloud_builder import DEFAULT_FEATURES
from gnn_tracking_tpu.utils.loading import load_graph, save_graph
from gnn_tracking_tpu.utils.log import get_logger

#: Adjacent pixel-detector layer pairs (reference ``graph_builder.py:320-344``)
PIXEL_LAYER_PAIRS = [
    (7, 8), (8, 9), (9, 10),  # barrel-barrel
    (7, 6), (8, 6), (9, 6), (10, 6),  # barrel → left endcap
    (7, 11), (8, 11), (9, 11), (10, 11),  # barrel → right endcap
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # LEC chain
    (11, 12), (12, 13), (13, 14), (14, 15), (15, 16), (16, 17),  # REC chain
]

_BARREL_TO_ENDCAPS = {(7, 6), (8, 6), (9, 6), (10, 6), (7, 11), (8, 11), (9, 11), (10, 11)}
_PRECEDENCE = {
    (7, 6): 0, (8, 6): 1, (9, 6): 2, (10, 6): 3,
    (7, 11): 0, (8, 11): 1, (9, 11): 2, (10, 11): 3,
}


def get_two_hop_tuples(tuples: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Two-hop edge augmentation pairs (reference ``graph_builder.py:19-29``)."""
    additions = set()
    for a, b in tuples:
        for c, d in tuples:
            if b == c:
                additions.add((a, d))
    return additions


def calc_dphi(phi1: np.ndarray, phi2: np.ndarray) -> np.ndarray:
    """phi2 - phi1 wrapped to [-pi, pi]."""
    dphi = phi2 - phi1
    dphi = np.where(dphi > np.pi, dphi - 2 * np.pi, dphi)
    return np.where(dphi < -np.pi, dphi + 2 * np.pi, dphi)


def calc_eta(r: np.ndarray, z: np.ndarray) -> np.ndarray:
    theta = np.arctan2(r, z)
    return -np.log(np.tan(theta / 2.0))


class GraphBuilder:
    """Build candidate-edge graphs from point clouds
    (reference ``graph_builder.py:37-562``)."""

    def __init__(
        self,
        indir: str | Path,
        outdir: str | Path,
        *,
        pixel_only: bool = True,
        redo: bool = True,
        phi_slope_max: float = 0.005,
        z0_max: float = 200.0,
        dR_max: float = 1.7,
        remove_intersecting: bool = True,
        directed: bool = False,
        measurement_mode: bool = False,
        write_output: bool = True,
        log_level: int = 0,
        edge_augmentation: str | None = None,
    ):
        self.indir = Path(indir)
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.pixel_only = pixel_only
        self.redo = redo
        self.phi_slope_max = phi_slope_max
        self.z0_max = z0_max
        self.dR_max = dR_max
        self.feature_names = DEFAULT_FEATURES
        #: Node-feature scaling applied to the output graphs
        #: (reference ``graph_builder.py:89-92``)
        self.feature_scale = np.array(
            [1000.0, np.pi, 1000.0, 1.0, 1 / 1000.0, 1 / 1000.0]
            + [1.0] * (len(DEFAULT_FEATURES) - 6)
        )
        self.directed = directed
        self.measurement_mode = measurement_mode
        self.write_output = write_output
        self.measurements: list[dict] = []
        self.data_list: list[EventGraph] = []
        self._remove_intersecting = remove_intersecting
        self._edge_augmentation = edge_augmentation
        if edge_augmentation and remove_intersecting:
            msg = "Edge augmentation currently requires remove_intersecting==False"
            raise ValueError(msg)
        self.logger = get_logger(
            "GraphBuilder", logging.DEBUG if log_level > 0 else logging.INFO
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _intersect_layer_r(layer1: int, layer2: int) -> float | None:
        """Radius of the barrel layer an edge must not intersect, or None
        (reference ``graph_builder.py:192-206``)."""
        if layer1 == 7 and layer2 in (6, 11):
            return 71.56298065185547
        if layer1 == 8 and layer2 in (6, 11):
            return 115.37811279296875
        return None

    def select_edges(
        self,
        idx1: np.ndarray,
        idx2: np.ndarray,
        r: np.ndarray,
        phi: np.ndarray,
        z: np.ndarray,
        layer1: int,
        layer2: int,
        *,
        use_native: bool | None = None,
    ) -> dict[str, np.ndarray]:
        """Cross-join two layers and apply the geometric cuts
        (reference ``select_edges``, ``graph_builder.py:162-227``).

        Dispatches to the native C++/OpenMP join (``csrc/edge_join.cpp``)
        when available; the numpy path is the fallback and parity oracle.
        """
        from gnn_tracking_tpu import native

        if use_native is None:
            use_native = native.available()
        if use_native:
            return native.select_edges_native(
                idx1,
                idx2,
                r,
                phi,
                z,
                phi_slope_max=self.phi_slope_max,
                z0_max=self.z0_max,
                dR_max=self.dR_max,
                intersect_layer_r=(
                    self._intersect_layer_r(layer1, layer2)
                    if self._remove_intersecting
                    else None
                ),
            )
        i1 = np.repeat(idx1, len(idx2))
        i2 = np.tile(idx2, len(idx1))

        dphi = calc_dphi(phi[i1], phi[i2])
        dz = z[i2] - z[i1]
        dr = r[i2] - r[i1]
        deta = calc_eta(r[i2], z[i2]) - calc_eta(r[i1], z[i1])
        dR = np.sqrt(deta**2 + dphi**2)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi_slope = dphi / dr
            z0 = z[i1] - r[i1] * dz / dr

            # intersecting-line cut for barrel → innermost-endcap edges
            # (reference graph_builder.py:192-206)
            if layer1 == 7 and layer2 in (6, 11):
                layer_r = 71.56298065185547
                z_coord = layer_r * dz / dr + z0
                intersected = (z_coord > -490.975) & (z_coord < 490.975)
            elif layer1 == 8 and layer2 in (6, 11):
                layer_r = 115.37811279296875
                z_coord = layer_r * dz / dr + z0
                intersected = (z_coord > -490.975) & (z_coord < 490.975)
            else:
                intersected = np.zeros(len(i1), dtype=bool)

        good = (
            (np.abs(phi_slope) < self.phi_slope_max)
            & (np.abs(z0) < self.z0_max)
            & (dR < self.dR_max)
        )
        if self._remove_intersecting:
            good &= ~intersected
        return {
            "index_1": i1[good],
            "index_2": i2[good],
            "dr": dr[good],
            "dphi": dphi[good],
            "dz": dz[good],
            "dR": dR[good],
        }

    def correct_truth_labels(
        self,
        layers_1: np.ndarray,
        layers_2: np.ndarray,
        y: np.ndarray,
        particle_ids: np.ndarray,
    ) -> tuple[np.ndarray, int]:
        """Falsify lower-precedence barrel→endcap transition edges per
        particle (reference ``correct_truth_labels``,
        ``graph_builder.py:229-306``)."""
        n_corrected = 0
        for pid in np.unique(particle_ids):
            if pid == 0:
                continue
            relevant = (particle_ids == pid) & (y == 1)
            if not relevant.any():
                continue
            layer_pairs = set(zip(layers_1[relevant].tolist(), layers_2[relevant].tolist()))
            transition = layer_pairs & _BARREL_TO_ENDCAPS
            if len(transition) > 1:
                transition = list(transition)
                prec = np.array([_PRECEDENCE[e] for e in transition])
                to_relabel = np.array(transition)[prec < prec.max()]
                for l1, l2 in to_relabel:
                    relabel = (layers_1 == l1) & (layers_2 == l2) & relevant
                    y[relabel] = 0
                    n_corrected += int(relabel.sum())
        if n_corrected:
            self.logger.debug(
                "Relabeled %d edges crossing from barrel to endcaps.", n_corrected
            )
        return y, n_corrected

    def build_edges(
        self, graph: EventGraph
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Build candidate edges for one point cloud
        (reference ``build_edges``, ``graph_builder.py:308-394``).

        Returns (edge_index [2,E], edge_attr [4,E], y [E], edge_pt [E]).
        Node features must be unscaled (r, phi, z, ...) as produced by
        `PointCloudBuilder`.
        """
        x = np.asarray(graph.x)
        layer = np.asarray(graph.layer)
        pid = np.asarray(graph.particle_id)
        pt = np.asarray(graph.pt)
        r, phi, z = x[:, 0], x[:, 1], x[:, 2]

        layer_pairs = list(PIXEL_LAYER_PAIRS) if self.pixel_only else []
        if self._edge_augmentation == "add_two_hop":
            layer_pairs.extend(sorted(get_two_hop_tuples(layer_pairs)))
        elif self._edge_augmentation is not None:
            msg = f"Invalid augmentation mode: {self._edge_augmentation}"
            raise ValueError(msg)

        by_layer = {l: np.where(layer == l)[0] for l in np.unique(layer)}
        parts = []
        for l1, l2 in layer_pairs:
            if l1 not in by_layer or l2 not in by_layer:
                continue
            parts.append(
                self.select_edges(by_layer[l1], by_layer[l2], r, phi, z, l1, l2)
            )
        if not parts:
            empty = np.zeros((2, 0), dtype=np.int64)
            return empty, np.zeros((4, 0)), np.zeros(0), np.zeros(0)
        merged = {
            k: np.concatenate([p[k] for p in parts]) for k in parts[0]
        }
        edge_index = np.stack([merged["index_1"], merged["index_2"]])
        edge_attr = np.stack(
            [
                merged["dr"] / self.feature_scale[0],
                merged["dphi"] / self.feature_scale[1],
                merged["dz"] / self.feature_scale[2],
                merged["dR"],
            ]
        )
        pid1 = pid[edge_index[0]]
        pid2 = pid[edge_index[1]]
        y = ((pid1 == pid2) & (pid1 > 0)).astype(float)
        if self._remove_intersecting:
            y, _ = self.correct_truth_labels(
                layer[edge_index[0]], layer[edge_index[1]], y, pid1
            )
        edge_pt = pt[edge_index[0]]
        return edge_index, edge_attr, y, edge_pt

    def to_graph(
        self,
        point_cloud: EventGraph,
        edge_index: np.ndarray,
        edge_attr: np.ndarray,
        y: np.ndarray,
    ) -> EventGraph:
        """Scale node features, optionally double edges for undirectedness
        with negated directional attrs (reference ``to_pyg_data``,
        ``graph_builder.py:396-455``)."""
        if not self.directed:
            row, col = edge_index[0], edge_index[1]
            edge_index = np.stack(
                [np.concatenate([row, col]), np.concatenate([col, row])]
            )
            negate = np.array([[-1.0], [-1.0], [-1.0], [1.0]])
            edge_attr = np.concatenate([edge_attr, negate * edge_attr], axis=1)
            y = np.concatenate([y, y])
        # carry node-level extras from the point cloud (cell_refl gets the
        # same geta/gphi scaling as its x columns so the ZReflection
        # augmentation can swap them in directly)
        n = np.asarray(point_cloud.x).shape[0]
        extras = {}
        for k, v in (point_cloud.extras or {}).items():
            v = np.asarray(v)
            if v.shape[:1] != (n,):
                self.logger.debug(
                    "skipping non-node extra %r (shape %s, n=%d)", k, v.shape, n
                )
                continue
            if k == "cell_refl" and len(self.feature_scale) > 13:
                v = (v / self.feature_scale[[12, 13]]).astype(np.float32)
            extras[k] = v
        return EventGraph.from_arrays(
            x=np.asarray(point_cloud.x) / self.feature_scale,
            edge_index=edge_index,
            edge_attr=edge_attr.T,
            y=y,
            particle_id=np.asarray(point_cloud.particle_id),
            pt=np.asarray(point_cloud.pt),
            eta=np.asarray(point_cloud.eta),
            reconstructable=np.asarray(point_cloud.reconstructable),
            layer=np.asarray(point_cloud.layer),
            sector=np.asarray(point_cloud.sector),
            true_edge_index=np.asarray(point_cloud.true_edge_index),
            extras=extras,
            numpy=True,  # host ETL: never device_put through the tunnel
        )

    # ------------------------------------------------------------------
    def get_n_truth_edges(self, graph: EventGraph) -> dict[float, int]:
        """Number of possible true segments between adjacent layer groups,
        per pt threshold (reference ``graph_builder.py:457-469``)."""
        pid = np.asarray(graph.particle_id)
        layer = np.asarray(graph.layer)
        pt = np.asarray(graph.pt)
        n_truth_edges = {0: 0, 0.1: 0, 0.5: 0, 0.9: 0, 1.0: 0}
        for p in np.unique(pid):
            if p == 0:
                continue
            sel = pid == p
            _, counts = np.unique(layer[sel], return_counts=True)
            n_segs = int(np.sum(counts[1:] * counts[:-1]))
            p_pt = pt[sel][0]
            for pt_thld in n_truth_edges:
                if p_pt > pt_thld:
                    n_truth_edges[pt_thld] += n_segs
        return n_truth_edges

    def get_measurements(self) -> dict[str, float]:
        df = pd.DataFrame(self.measurements)
        means, stds = df.mean(), df.std()
        out = {}
        for var in means.index:
            out[var] = means[var]
            out[var + "_err"] = stds[var]
        return out

    @staticmethod
    def get_event_id_sector_from_str(name: str) -> tuple[int, int]:
        number_s = name.split(".")[0][len("data") :]
        evtid_s, sectorid_s = number_s.split("_s")
        return int(evtid_s), int(sectorid_s)

    def process(self, start: int = 0, stop: int | None = 1, *, only_sector: int = -1):
        """Main processing loop (reference ``graph_builder.py:487-557``)."""
        available = sorted(p for p in self.indir.iterdir() if p.suffix == ".npz")
        outfiles = {c.name for c in self.outdir.iterdir()}
        for f in available[start:stop]:
            evtid, sector = self.get_event_id_sector_from_str(f.name)
            if 0 <= only_sector != sector:
                continue
            if f.name in outfiles and not self.redo:
                continue
            point_cloud = load_graph(f, numpy=True)
            edge_index, edge_attr, y, edge_pt = self.build_edges(point_cloud)

            if self.measurement_mode:
                n_truth_edges = self.get_n_truth_edges(point_cloud)
                measurements = {
                    "n_edges": len(y),
                    "n_true_edges": float(y.sum()),
                    "n_false_edges": float(len(y) - y.sum()),
                    **{f"n_truth_edge_{pt}": n for pt, n in n_truth_edges.items()},
                    "edge_purity": float(y.sum() / max(len(y), 1)),
                    **{
                        f"edge_efficiency_{pt}": float(y[edge_pt > pt].sum() / denom)
                        if denom
                        else float("nan")
                        for pt, denom in n_truth_edges.items()
                    },
                }
                self.measurements.append(measurements)

            graph = self.to_graph(point_cloud, edge_index, edge_attr, y)
            if self.write_output:
                save_graph(graph, self.outdir / f.name)
            self.data_list.append(graph)
        if self.measurement_mode:
            self.logger.info("%s", self.get_measurements())
