"""Serving / batch-inference pipeline: checkpoint -> track labels.

The production counterpart of the training stack: load a trained model from
an orbax checkpoint (reference analog: eval-from-checkpoint via
``MLGraphConstruction.from_chkpt`` / ``PreTrainedECGraphTCN``,
``models/graph_construction.py:301``, ``models/edge_classifier.py:166``),
run it over saved event graphs, cluster the condensation latent with the
on-device DBSCAN (reference: ``postprocessing/dbscanscanner.py:84`` chooses
(eps, min_samples) by ``trk.double_majority_pt0.9``), and write per-hit
track labels.

TPU-first shape discipline: events are padded per ``PaddingConfig`` bucket,
so the whole predict function (model apply + radius graph + DBSCAN + label
compaction) compiles ONCE per bucket and is reused across the stream —
there is no per-event recompilation and no host round-trip between the
model and the clustering.

Two model flavors are auto-detected from the forward output:

* condensation models (``H``/``B`` in the output): DBSCAN on the latent
  ``H`` with ``eps``/``min_samples``;
* pure edge classifiers (``W`` only): threshold at ``ec_threshold`` and
  label hits by connected components of the surviving edges — the
  classical EC pipeline (reference ``analysis/clusterfck``-style track
  building).

CLI::

    python -m gnn_tracking_tpu.inference --chkpt runs/tc/checkpoints/epoch9 \
        --indir graphs/val --outdir labels/ --eps 0.3 --min-samples 1
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.ops.cc import compact_labels, connected_components
from gnn_tracking_tpu.ops.dbscan import dbscan
from gnn_tracking_tpu.training.restore import BoundModel, get_model
from gnn_tracking_tpu.utils.loading import PaddingConfig, load_graph
from gnn_tracking_tpu.utils.log import logger


class TrackingPredictor:
    """Checkpointed model + on-device clustering, compiled per shape bucket.

    Args:
        model: a ``BoundModel`` (from ``training.restore.get_model``) or a
            checkpoint path.
        eps, min_samples: DBSCAN hyperparameters for the condensation
            latent (pick them with ``DBSCANHyperParamScanner`` on a
            validation split; the scanner's ``best_dbscan`` FOMs carry the
            selection).
        ec_threshold: edge-classifier cut for EC-only models.
        padding: optional ``PaddingConfig``; when given, every event is
            padded to its bucket before the jitted predict, so a stream of
            variable-size events reuses a handful of compiled programs.
        max_num_neighbors: degree cap of the eps-neighbor graph (must
            exceed the densest eps-neighborhood for sklearn-exact labels).
        graph_transform: optional ``EventGraph -> EventGraph`` applied
            before padding — e.g. learned graph construction from a
            metric-learning checkpoint
            (``training.restore.ml_graph_construction_from_chkpt``), so the
            serving input can be bare point clouds (reference §3.4 "bake").
    """

    def __init__(
        self,
        model: BoundModel | str | Path,
        *,
        eps: float = 0.3,
        min_samples: int = 1,
        ec_threshold: float = 0.5,
        padding: PaddingConfig | None = None,
        max_num_neighbors: int = 128,
        graph_transform=None,
        sort_edges: bool = False,
        precision: str = "f32",
    ):
        if not isinstance(model, BoundModel):
            model = get_model(model)
        self.model = model
        self.eps = float(eps)
        self.min_samples = int(min_samples)
        self.ec_threshold = float(ec_threshold)
        self.padding = padding
        self.max_num_neighbors = int(max_num_neighbors)
        self.graph_transform = graph_transform
        # Serving perf knobs (battery #24: the forward was the serving hot
        # spot at 251 of 456 ms — unsorted edges + f32, vs the sorted bf16
        # training forward at ~24 ms): ``sort_edges`` routes aggregation
        # through the sorted segment path (in-jit target sort + module
        # sorted_edges flag; per-edge outputs are unsorted back), and
        # ``precision="bf16"`` casts params + float inputs for the MXU
        # (latent/labels are computed and returned in f32 as before).
        self.sort_edges = bool(sort_edges)
        if precision not in ("f32", "bf16"):
            msg = f"precision must be 'f32' or 'bf16', got {precision!r}"
            raise ValueError(msg)
        self.precision = precision
        self._module = self.model.module
        if self.sort_edges and getattr(self._module, "sorted_edges", None) is False:
            self._module = self._module.clone(sorted_edges=True)

    # ---------------------------------------------------------------- jit
    def _raw_predict(self, variables, graph: EventGraph):
        unsort = None
        if self.sort_edges:
            graph = graph.sort_edges_by_target(with_unsort=True)
            unsort = graph.extras["edge_unsort"]
        if self.precision == "bf16":

            def _cast(v):
                if hasattr(v, "dtype") and v.dtype == jnp.float32:
                    return v.astype(jnp.bfloat16)
                return v

            variables = jax.tree.map(_cast, variables)
            graph = jax.tree.map(_cast, graph)
        out = self._module.apply(variables, graph)
        node_mask = graph.node_mask

        def _edge_out(w):
            w = w.astype(jnp.float32)
            return w if unsort is None else w[unsort]

        if "H" in out:  # condensation latent -> DBSCAN
            labels = dbscan(
                out["H"].astype(jnp.float32),
                eps=self.eps,
                min_samples=self.min_samples,
                max_num_neighbors=self.max_num_neighbors,
                node_mask=node_mask,
            )
            aux = {"beta": out["B"].astype(jnp.float32)}
        else:  # pure EC -> cut + connected components
            w = out["W"].astype(jnp.float32)
            keep = (w > self.ec_threshold) & graph.edge_mask
            comp = connected_components(
                graph.edge_index, graph.num_nodes, edge_mask=keep,
                node_mask=node_mask,
            )
            labels = compact_labels(comp, valid=node_mask, noise_value=-1)
            aux = {"w": _edge_out(w)}
        if "W" in out:
            aux["w"] = _edge_out(out["W"])
        return labels, aux

    @functools.cached_property
    def _predict_fn(self):
        return jax.jit(self._raw_predict)

    def _raw_predict_packed(self, variables, graph: EventGraph):
        """Pack every output + the real sizes into ONE f32 buffer.

        Serving pays per-transfer tunnel/PCIe roundtrip latency on each
        fetched leaf (battery #28: 3 result arrays + 2 size scalars =
        ~130 ms/event through the axon relay vs ~3 ms of bytes); a single
        result buffer makes the fetch exactly one DMA. Padding only adds
        masked-out entries, so the real sizes are recomputable in-jit.
        """
        labels, aux = self._raw_predict(variables, graph)
        parts = [
            jnp.stack(
                [
                    graph.node_mask.sum().astype(jnp.float32),
                    graph.edge_mask.sum().astype(jnp.float32),
                ]
            ),
            labels.astype(jnp.float32),
        ]
        layout = []
        for k in ("beta", "w"):
            if k in aux:
                layout.append((k, aux[k].shape[0]))
                parts.append(aux[k].astype(jnp.float32))
        # trace-time side channel: runs once per compile, before the first
        # result is unpacked
        self._packed_layout = tuple(layout)
        return jnp.concatenate(parts)

    @functools.cached_property
    def _predict_packed_fn(self):
        return jax.jit(self._raw_predict_packed)

    @functools.cached_property
    def _predict_batch_fn(self):
        """vmapped predict over a leading stacked-events axis (same bucket)."""
        return jax.jit(
            lambda variables, stacked: jax.vmap(
                lambda g: self._raw_predict(variables, g)
            )(stacked)
        )

    # ------------------------------------------------------------- public
    def predict(self, graph: EventGraph) -> dict[str, np.ndarray]:
        """Track labels (and model outputs) for one event.

        Returns numpy arrays trimmed to the event's true (unpadded) size:
        ``labels [n_hits]`` with ``-1`` = noise, plus ``beta`` and/or ``w``.
        """
        return self._fetch(self._dispatch(graph))

    def predict_batch(self, graphs: list[EventGraph]) -> list[dict[str, np.ndarray]]:
        """Track labels for a batch of events in ONE device dispatch.

        Events are padded to a common bucket and stacked on a leading axis;
        the whole pipeline (model + DBSCAN/CC) runs under ``jax.vmap`` — one
        compiled program, better chip utilization for small events. All
        events must land in the same padding bucket (give ``padding``, or
        pass same-shape graphs).
        """
        gs = [
            self.graph_transform(g) if self.graph_transform is not None else g
            for g in graphs
        ]
        sizes = [
            (int(np.asarray(g.node_mask).sum()), int(np.asarray(g.edge_mask).sum()))
            for g in gs
        ]
        if self.padding is not None:
            gs = [self.padding.pad(g) for g in gs]
        shapes = {
            tuple(a.shape for a in jax.tree.leaves(g) if hasattr(a, "shape"))
            for g in gs
        }
        if len(shapes) != 1:
            msg = (
                "predict_batch needs same-bucket events; got shape "
                f"signatures {shapes}. Pass a PaddingConfig with one bucket."
            )
            raise ValueError(msg)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gs)
        variables = {"params": self.model.params}
        if self.model.batch_stats:
            variables["batch_stats"] = self.model.batch_stats
        labels, aux = self._predict_batch_fn(variables, stacked)
        results = []
        for i, (n_real, e_real) in enumerate(sizes):
            out = {"labels": np.asarray(labels[i])[:n_real]}
            if "beta" in aux:
                out["beta"] = np.asarray(aux["beta"][i])[:n_real]
            if "w" in aux:
                out["w"] = np.asarray(aux["w"][i])[:e_real]
            results.append(out)
        return results

    def _dispatch(self, graph: EventGraph):
        """Launch the jitted predict without forcing a host sync; returns
        (device futures, real sizes) — JAX's async dispatch overlaps the
        next event's host load + H2D with this event's compute + D2H."""
        if self.graph_transform is not None:
            graph = self.graph_transform(graph)
        if self.padding is not None:
            graph = self.padding.pad(graph)
        variables = {"params": self.model.params}
        if self.model.batch_stats:
            variables["batch_stats"] = self.model.batch_stats
        # everything (sizes included) rides in ONE packed device buffer —
        # no host sync before the dispatch, exactly one transfer at fetch
        packed = self._predict_packed_fn(variables, graph)
        return packed, graph.x.shape[0]

    def _fetch(self, pending) -> dict[str, np.ndarray]:
        packed, n_pad = pending
        buf = np.asarray(packed)  # the one transfer
        n_real, e_real = int(buf[0]), int(buf[1])
        out = {"labels": buf[2 : 2 + n_pad].astype(np.int32)[:n_real]}
        off = 2 + n_pad
        # _packed_layout is set at trace time (before the first result is
        # consumed)
        for key, length in self._packed_layout:
            vals = buf[off : off + length]
            off += length
            out[key] = vals[: n_real if key == "beta" else e_real]
        return out

    def predict_dir(
        self,
        indir: str | Path,
        outdir: str | Path | None = None,
        *,
        pipeline_depth: int = 2,
        batch_size: int = 1,
        evaluate: bool = False,
        pt_thlds: tuple[float, ...] = (0.0, 0.5, 0.9, 1.5),
    ) -> dict[str, float]:
        """Predict every ``.npz`` event graph under ``indir``.

        Keeps ``pipeline_depth`` events in flight: event ``i+1`` is loaded
        and dispatched before event ``i``'s labels are fetched, so host IO /
        H2D ride under device compute. Writes ``<stem>_labels.npz`` per
        event when ``outdir`` is given; returns throughput stats (events/s
        excludes the first, compiling, event). With ``evaluate=True``,
        events carrying ``particle_id`` truth are scored with the tracking
        FOMs (double-majority & friends, reference
        ``postprocessing/dbscanscanner.py:84``) averaged over events.
        """
        from collections import deque

        files = sorted(Path(indir).glob("*.npz"))
        if not files:
            msg = f"no .npz event graphs under {indir}"
            raise FileNotFoundError(msg)
        if outdir is not None:
            outdir = Path(outdir)
            outdir.mkdir(parents=True, exist_ok=True)
        n_tracks = 0
        t_post_compile = None
        inflight: deque = deque()
        fom_sums: dict[str, float] = {}
        fom_counts: dict[str, int] = {}

        def drain_one():
            f, g, pending = inflight.popleft()
            res = self._fetch(pending)
            # real hits are the prefix of the padded labels, which is
            # exactly what _fetch already trimmed to
            score_and_write(f, g, res, res["labels"])

        def score_and_write(f, g, res, labels_full):
            nonlocal n_tracks
            n_tracks += int(res["labels"].max()) + 1
            if outdir is not None:
                np.savez_compressed(outdir / f"{f.stem}_labels.npz", **res)
            has_truth = all(
                getattr(g, a, None) is not None
                for a in ("particle_id", "pt", "eta", "reconstructable")
            )
            if evaluate and has_truth:
                from gnn_tracking_tpu.metrics.cluster_metrics import (
                    flatten_track_metrics,
                    tracking_metrics_data,
                )

                foms = flatten_track_metrics(
                    tracking_metrics_data(g, labels_full, pt_thlds)
                )
                for k, v in foms.items():
                    if np.isfinite(v):
                        fom_sums[k] = fom_sums.get(k, 0.0) + float(v)
                        fom_counts[k] = fom_counts.get(k, 0) + 1

        if batch_size > 1:
            # vmapped batches: one dispatch per group of same-bucket events
            t_post_compile = None
            for start in range(0, len(files), batch_size):
                chunk = files[start : start + batch_size]
                gs = [load_graph(f) for f in chunk]
                results = self.predict_batch(gs)
                for f, g, res in zip(chunk, gs, results):
                    labels_full = np.full(g.num_nodes, -1, dtype=res["labels"].dtype)
                    labels_full[: res["labels"].shape[0]] = res["labels"]
                    score_and_write(f, g, res, labels_full)
                if start == 0:
                    t_post_compile = time.perf_counter()
            dt = time.perf_counter() - t_post_compile
            stats = {
                "n_events": len(files),
                "n_tracks_total": n_tracks,
                "events_per_s": (len(files) - batch_size) / dt
                if len(files) > batch_size and dt > 0
                else float("nan"),
            }
            stats |= {
                f"trk.{k}": fom_sums[k] / fom_counts[k] for k in sorted(fom_sums)
            }
            logger.info("predict_dir: %s", stats)
            return stats

        for i, f in enumerate(files):
            g = load_graph(f)
            inflight.append((f, g, self._dispatch(g)))
            if i == 0:  # first event compiles; sync it before timing
                drain_one()
                t_post_compile = time.perf_counter()
                continue
            while len(inflight) >= max(1, pipeline_depth):
                drain_one()
        while inflight:
            drain_one()
        dt = time.perf_counter() - t_post_compile
        stats = {
            "n_events": len(files),
            "n_tracks_total": n_tracks,
            "events_per_s": (len(files) - 1) / dt if len(files) > 1 and dt > 0 else float("nan"),
        }
        stats |= {
            f"trk.{k}": fom_sums[k] / fom_counts[k] for k in sorted(fom_sums)
        }
        logger.info("predict_dir: %s", stats)
        return stats


def main(argv: list[str] | None = None) -> dict[str, float]:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--chkpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--indir", required=True, help="dir of .npz event graphs")
    p.add_argument("--outdir", default=None, help="write <stem>_labels.npz here")
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--min-samples", type=int, default=1)
    p.add_argument("--ec-threshold", type=float, default=0.5)
    p.add_argument("--node-bucket", type=int, default=None)
    p.add_argument("--edge-bucket", type=int, default=None)
    p.add_argument(
        "--batch-size", type=int, default=1,
        help=">1: vmapped batches of same-bucket events, one dispatch each",
    )
    p.add_argument(
        "--evaluate", action="store_true",
        help="score predictions against particle_id truth (tracking FOMs)",
    )
    p.add_argument(
        "--ml-chkpt", default=None,
        help="metric-learning checkpoint: build graphs from point clouds "
        "on the fly (learned graph construction)",
    )
    p.add_argument("--ml-neighbors", type=int, default=64)
    p.add_argument("--ml-radius", type=float, default=1.0)
    args = p.parse_args(argv)
    padding = None
    if args.node_bucket and args.edge_bucket:
        padding = PaddingConfig(
            node_bucket=args.node_bucket,
            edge_bucket=args.edge_bucket,
            true_edge_bucket=args.edge_bucket,
        )
    transform = None
    if args.ml_chkpt is not None:
        from gnn_tracking_tpu.training.restore import (
            ml_graph_construction_from_chkpt,
        )

        transform = ml_graph_construction_from_chkpt(
            args.ml_chkpt,
            max_num_neighbors=args.ml_neighbors,
            max_radius=args.ml_radius,
        )
    pred = TrackingPredictor(
        args.chkpt,
        eps=args.eps,
        min_samples=args.min_samples,
        ec_threshold=args.ec_threshold,
        padding=padding,
        graph_transform=transform,
    )
    stats = pred.predict_dir(
        args.indir, args.outdir, evaluate=args.evaluate,
        batch_size=args.batch_size,
    )
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
