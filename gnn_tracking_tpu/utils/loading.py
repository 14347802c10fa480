"""Datasets and data modules for padded event graphs.

Capability parity: reference ``utils/loading.py`` (``TrackingDataset`` over
sorted ``.pt`` files, ``TrackingDataModule`` with train/val/test dict
configs, in-memory ``TestTrackingDataModule``). TPU-first differences:

* events are stored as ``.npz`` archives of plain arrays (``save_graph`` /
  ``load_graph``), loadable without torch;
* every loaded graph is padded to bucketed sizes so jit compiles once per
  bucket instead of once per event (the XLA answer to dynamic batch shapes);
* batching is disjoint-union over pre-padded graphs.
"""

from __future__ import annotations

import dataclasses
import random as _random
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from gnn_tracking_tpu.graphs import EventGraph, batch_graphs
from gnn_tracking_tpu.utils.log import logger

_ARRAY_FIELDS = (
    "x",
    "particle_id",
    "pt",
    "eta",
    "reconstructable",
    "node_mask",
    "layer",
    "sector",
    "batch",
    "edge_index",
    "edge_attr",
    "y",
    "edge_mask",
    "true_edge_index",
    "true_edge_mask",
)


def save_graph(graph: EventGraph, path: str | Path) -> None:
    """Serialize an EventGraph to an ``.npz`` archive."""
    import jax

    # one batched device_get: per-field np.asarray pays a synchronous
    # transfer roundtrip each (no-op for numpy-leaved ETL graphs)
    arrays = {f: getattr(graph, f) for f in _ARRAY_FIELDS}
    for k, v in graph.extras.items():
        arrays[f"extra_{k}"] = v
    arrays = jax.device_get(arrays)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_graph(path: str | Path, *, numpy: bool = False) -> EventGraph:
    """Load an EventGraph from an ``.npz`` archive.

    ``numpy=True`` keeps host numpy leaves (ETL consumers — e.g. the
    geometric GraphBuilder reading point clouds — must not bounce every
    field through a remote accelerator)."""
    import jax.numpy as jnp

    xp = np if numpy else jnp
    with np.load(path) as data:
        kwargs = {f: xp.asarray(data[f]) for f in _ARRAY_FIELDS if f in data}
        extras = {
            k[len("extra_") :]: xp.asarray(data[k])
            for k in data.files
            if k.startswith("extra_")
        }
    return EventGraph(**kwargs, extras=extras)


def _round_up(n: int, bucket: int) -> int:
    return max(bucket, -(-n // bucket) * bucket)


@dataclasses.dataclass
class PaddingConfig:
    """Shape-bucketing config. Sizes are rounded up to multiples of the
    bucket granularity, bounding the number of distinct compiled programs."""

    node_bucket: int = 2048
    edge_bucket: int = 8192
    true_edge_bucket: int = 8192
    #: hard caps (events above are an error — choose buckets for your stream)
    max_nodes: int | None = None
    max_edges: int | None = None
    #: when set, re-lay out edges into the slab format consumed by the fused
    #: interaction-network kernel (``segment_impl="fused"``). The spec is a
    #: deterministic function of the bucketed sizes, so shape stability per
    #: bucket is preserved.
    slab_window: int | None = None
    slab_block: int = 512
    slab_slack: float = 1.5
    slab_overflow_frac: float = 0.25
    #: "fixed" (cmax blocks per slab, fill ~1/slack) or "flat" (variable
    #: blocks per slab, fill ~0.97, for ``segment_impl="fused_flat"``). The
    #: flat block budget is derived from the *bucketed* sizes so shapes stay
    #: stable per bucket.
    slab_layout: str = "fixed"

    def pad(self, g: EventGraph) -> EventGraph:
        n = _round_up(g.num_nodes, self.node_bucket)
        e = _round_up(g.num_edges, self.edge_bucket)
        t = _round_up(max(g.true_edge_index.shape[1], 1), self.true_edge_bucket)
        if self.max_nodes is not None and n > self.max_nodes:
            msg = f"Event with {g.num_nodes} nodes exceeds max_nodes={self.max_nodes}"
            raise ValueError(msg)
        if self.max_edges is not None and e > self.max_edges:
            msg = f"Event with {g.num_edges} edges exceeds max_edges={self.max_edges}"
            raise ValueError(msg)
        g = g.pad_to(n, e, t)
        if self.slab_window is not None:
            from gnn_tracking_tpu.ops.pallas.slab_layout import (
                apply_flat_slab_layout,
                apply_slab_layout,
                default_spec,
                flat_blocks_cap,
            )

            spec = default_spec(
                n,
                e,
                window=self.slab_window,
                block_e=self.slab_block,
                slack=self.slab_slack,
                overflow_frac=self.slab_overflow_frac,
            )
            if self.slab_layout == "flat":
                g = apply_flat_slab_layout(
                    g, spec, blocks_cap=flat_blocks_cap(n, e, spec)
                )
            elif self.slab_layout == "fixed":
                g = apply_slab_layout(g, spec)
            else:
                msg = (
                    f"slab_layout={self.slab_layout!r} unknown; "
                    "expected 'fixed' or 'flat'"
                )
                raise ValueError(msg)
        return g


class TrackingDataset:
    """Dataset over sorted graph files from directories with start/stop
    windowing (reference ``utils/loading.py:17-113``)."""

    def __init__(
        self,
        in_dir: str | Path | Sequence[str | Path],
        *,
        start: int = 0,
        stop: int | None = None,
        sector: int | None = None,
        suffix: str = "*.npz",
    ):
        self._paths = self._get_paths(
            in_dir, start=start, stop=stop, sector=sector, suffix=suffix
        )

    @staticmethod
    def _get_paths(
        in_dir, *, start: int, stop: int | None, sector: int | None, suffix: str
    ) -> list[Path]:
        dirs = [in_dir] if isinstance(in_dir, (str, Path)) else list(in_dir)
        available: list[Path] = []
        for d in dirs:
            d = Path(d)
            if not d.exists():
                msg = f"Directory {d} does not exist"
                raise FileNotFoundError(msg)
            glob = suffix if sector is None else f"*_s{sector}{suffix.lstrip('*')}"
            available.extend(sorted(d.glob(glob)))
        if stop is not None and stop > len(available):
            msg = f"stop={stop} exceeds number of available files ({len(available)})"
            raise ValueError(msg)
        return available[start:stop]

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, idx: int) -> EventGraph:
        return load_graph(self._paths[idx])


class GraphLoader:
    """Minimal host-side loader: shuffling, subsampling, padding, batching.

    Replaces the reference's torch DataLoader + PyG collation
    (``utils/loading.py:223-239``). Runs on the host; the padded output is
    device-put by the training step.
    """

    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 1,
        shuffle: bool = False,
        sample_size: int | None = None,
        padding: PaddingConfig | None = None,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self._dataset = dataset
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._sample_size = sample_size
        self._padding = padding
        self._rng = _random.Random(seed)
        self._prefetch = prefetch
        self.batch_size = batch_size

    def __len__(self) -> int:
        n = len(self._dataset)
        if self._sample_size is not None:
            n = min(n, self._sample_size)
        return -(-n // self._batch_size)

    def _produce(self) -> Iterator[EventGraph]:
        indices = list(range(len(self._dataset)))
        if self._shuffle:
            self._rng.shuffle(indices)
        if self._sample_size is not None:
            indices = indices[: self._sample_size]
        for i in range(0, len(indices), self._batch_size):
            graphs = [self._dataset[j] for j in indices[i : i + self._batch_size]]
            if self._padding is not None:
                graphs = [self._padding.pad(g) for g in graphs]
            yield graphs[0] if len(graphs) == 1 else batch_graphs(graphs)

    def __iter__(self) -> Iterator[EventGraph]:
        if self._prefetch <= 0:
            yield from self._produce()
            return
        # Background-thread prefetch: the loader stays ahead of the training
        # step so host IO/padding overlaps device compute (the reference uses
        # torch DataLoader workers — utils/loading.py:236).
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        sentinel = object()
        error: list[BaseException] = []

        def worker():
            try:
                for item in self._produce():
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised on consumer side
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


class TrackingDataModule:
    """Train/val/test data pipelines from dict configs
    (reference ``utils/loading.py:116-248``).

    Example::

        dm = TrackingDataModule(
            train=dict(dirs=["/data/train"], stop=900, batch_size=1),
            val=dict(dirs=["/data/val"], stop=50),
            identifier="graphs_v1",
        )
    """

    def __init__(
        self,
        *,
        train: dict | None = None,
        val: dict | None = None,
        test: dict | None = None,
        identifier: str = "",
        padding: PaddingConfig | None = None,
    ):
        self._configs = {"train": train, "val": val, "test": test}
        self.identifier = identifier
        self._padding = padding or PaddingConfig()
        self._datasets: dict[str, TrackingDataset | None] = {}

    def setup(self, stage: str = "fit") -> None:
        wanted = {"fit": ["train", "val"], "validate": ["val"], "test": ["test"]}[stage]
        for key in wanted:
            config = self._configs.get(key)
            if config is None:
                if key == "train":
                    msg = f"DataModule not configured for {key} data"
                    raise ValueError(msg)
                logger.debug("DataModule not configured for %s data.", key)
                self._datasets[key] = None
                continue
            self._datasets[key] = TrackingDataset(
                config["dirs"],
                start=config.get("start", 0),
                stop=config.get("stop"),
                sector=config.get("sector"),
            )

    def _loader(self, key: str, shuffle: bool) -> GraphLoader:
        if self._datasets.get(key) is None:
            msg = f"DataModule not configured for {key} data"
            raise ValueError(msg)
        config = self._configs[key] or {}
        return GraphLoader(
            self._datasets[key],
            batch_size=config.get("batch_size", 1),
            sample_size=config.get("sample_size"),
            shuffle=shuffle,
            padding=self._padding,
        )

    def train_dataloader(self) -> GraphLoader:
        return self._loader("train", shuffle=True)

    def val_dataloader(self) -> GraphLoader:
        return self._loader("val", shuffle=False)

    def test_dataloader(self) -> GraphLoader:
        return self._loader("test", shuffle=False)


class TestTrackingDataModule(TrackingDataModule):
    """In-memory data module for tests (reference ``utils/loading.py:251-272``)."""

    class _ListDataset:
        def __init__(self, graphs):
            self._graphs = graphs

        def __len__(self):
            return len(self._graphs)

        def __getitem__(self, idx):
            return self._graphs[idx]

    def __init__(self, graphs: list[EventGraph], padding: PaddingConfig | None = None):
        super().__init__(train={}, val={}, test={}, padding=padding)
        ds = self._ListDataset(graphs)
        self._datasets = {"train": ds, "val": ds, "test": ds}

    def setup(self, stage: str = "fit") -> None:
        pass
