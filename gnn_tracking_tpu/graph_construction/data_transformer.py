"""Apply a transform to every graph file in directories, persisting the
transform config (capability parity: reference
``graph_construction/data_transformer.py``). Used to bake learned graph
construction / EC cuts into datasets offline."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable

import yaml

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.training.config import config_from_obj
from gnn_tracking_tpu.utils.loading import load_graph, save_graph
from gnn_tracking_tpu.utils.log import logger


class DataTransformer:
    """Transform every ``.npz`` graph in input directories and save the
    results, writing the transform config alongside
    (reference ``data_transformer.py:17-121``).

    ``transform`` is a callable ``EventGraph -> EventGraph`` (e.g. a bound
    flax module such as ``MLGraphConstruction.apply`` partial, or `ECCut`).
    """

    def __init__(self, transform: Callable[[EventGraph], EventGraph], *, compact: bool = True):
        self._transform = transform
        self._compact = compact

    def process(self, input_file: Path, output_file: Path, *, redo: bool = True) -> None:
        if not redo and output_file.exists():
            return
        graph = load_graph(input_file)
        transformed = self._transform(graph)
        if self._compact:
            transformed = transformed.compact()
        output_file.parent.mkdir(parents=True, exist_ok=True)
        save_graph(transformed, output_file)

    def process_directories(
        self,
        input_dirs: list[str | Path],
        output_dirs: list[str | Path],
        *,
        redo: bool = True,
        seed_hparams: dict | None = None,
        max_workers: int | None = None,
    ) -> None:
        """Transform all graphs from ``input_dirs`` into ``output_dirs``,
        writing a ``transform_config.yml`` into each output directory.

        ``max_workers`` enables thread-pool parallelism over files (the
        reference uses ``process_map`` — ``data_transformer.py:116-121``;
        threads suffice here since the heavy work releases the GIL in
        XLA/numpy).
        """
        assert len(input_dirs) == len(output_dirs)
        for in_dir, out_dir in zip(input_dirs, output_dirs):
            in_dir, out_dir = Path(in_dir), Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            hparams = seed_hparams
            if hparams is None:
                try:
                    hparams = config_from_obj(self._transform)
                except Exception:  # noqa: BLE001 - config capture is best effort
                    hparams = {"repr": repr(self._transform)}
            (out_dir / "transform_config.yml").write_text(
                yaml.safe_dump(json.loads(json.dumps(hparams, default=str)))
            )
            files = sorted(in_dir.glob("*.npz"))
            logger.info("Transforming %d files from %s", len(files), in_dir)
            if max_workers:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=max_workers) as pool:
                    list(
                        pool.map(
                            lambda f: self.process(f, out_dir / f.name, redo=redo),
                            files,
                        )
                    )
            else:
                for f in files:
                    self.process(f, out_dir / f.name, redo=redo)


class ECCut:
    """Bake an edge-classifier cut into a graph: apply the EC and keep only
    edges with ``w > thld`` (reference ``data_transformer.py:124-147``)."""

    def __init__(self, ec: Callable[[EventGraph], dict], thld: float):
        self._ec = ec
        self._thld = thld

    def __call__(self, data: EventGraph) -> EventGraph:
        w = self._ec(data)["W"]
        out = data.mask_edges(w > self._thld)
        return out.replace(extras={**out.extras, "ec_score": w})


class ECCutRefine(ECCut):
    """Like `ECCut` but also stores the EC score as an edge feature for a
    downstream refinement model (reference ``data_transformer.py:148-159``)."""

    def __call__(self, data: EventGraph) -> EventGraph:
        import jax.numpy as jnp

        w = self._ec(data)["W"]
        out = data.mask_edges(w > self._thld)
        out = out.replace(
            edge_attr=jnp.concatenate([out.edge_attr, w.reshape(-1, 1)], axis=1)
        )
        return out
