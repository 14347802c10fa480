"""Experiment tracking: metric history + run metadata.

Capability parity: reference experiment tracking (TensorBoard/W&B loggers +
``ExpandWandbConfig`` callback, reference ``training/callbacks.py:87-144``).
The TPU build writes dependency-free artifacts:

* ``metrics.jsonl`` — one JSON line per epoch with all metrics;
* ``run_meta.json`` — full config tree, git commit hash, environment info
  (the ``ExpandWandbConfig`` payload);
* optional CSV mirror for spreadsheet-friendly consumption.

External trackers (W&B, TensorBoard) can tail these files; a ``log_hook``
callable can fan metrics out to any backend.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path
from typing import Any, Callable

from gnn_tracking_tpu.utils.versioning import get_commit_hash


def collect_run_metadata(config: dict | None = None) -> dict[str, Any]:
    """Run metadata payload (reference ``ExpandWandbConfig``: optimizer and
    datamodule hparams, git hash, SLURM job id)."""
    import jax

    meta: dict[str, Any] = {
        "config": config or {},
        "git_hash": get_commit_hash(),
        "argv": sys.argv,
        "python": sys.version.split()[0],
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    for env in ("SLURM_JOB_ID", "SLURM_ARRAY_TASK_ID", "HOSTNAME"):
        if env in os.environ:
            meta[env.lower()] = os.environ[env]
    return meta


class RunLogger:
    """JSONL/CSV metric logger with TensorBoard events + fan-out hooks.

    TensorBoard: when the writer is importable (torch's bundled
    ``SummaryWriter`` — event files readable by standard TensorBoard /
    W&B sync, reference ``training/callbacks.py:87-144``), scalars are
    mirrored to ``<log_dir>/tb/`` and the run config goes in as a text
    summary. ``tensorboard=False`` disables; ``None`` (default) =
    auto-enable if available.
    """

    def __init__(
        self,
        log_dir: str | Path,
        *,
        config: dict | None = None,
        csv: bool = False,
        tensorboard: bool | None = None,
        log_hook: Callable[[int, dict[str, float]], None] | None = None,
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = self.log_dir / "metrics.jsonl"
        self._csv = self.log_dir / "metrics.csv" if csv else None
        self._csv_keys: list[str] | None = None
        self._hook = log_hook
        meta = collect_run_metadata(config)
        (self.log_dir / "run_meta.json").write_text(
            json.dumps(meta, indent=2, default=str)
        )
        self._tb = None
        if tensorboard is not False:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir / "tb"))
                self._tb.add_text(
                    "run_meta",
                    "```json\n" + json.dumps(meta, indent=2, default=str) + "\n```",
                    0,
                )
            except Exception:  # noqa: BLE001 - TB is best-effort
                if tensorboard is True:
                    raise

    def log(self, step: int, metrics: dict[str, float]) -> None:
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with self._jsonl.open("a") as f:
            f.write(json.dumps(record) + "\n")
        if self._csv is not None:
            if self._csv_keys is None:
                self._csv_keys = list(record)
                self._csv.write_text(",".join(self._csv_keys) + "\n")
            with self._csv.open("a") as f:
                f.write(
                    ",".join(str(record.get(k, "")) for k in self._csv_keys) + "\n"
                )
        if self._tb is not None:
            for k, v in record.items():
                if k != "step" and not math.isnan(v):
                    self._tb.add_scalar(k, v, step)
            self._tb.flush()
        if self._hook is not None:
            self._hook(step, metrics)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

    def read_history(self) -> list[dict[str, float]]:
        if not self._jsonl.exists():
            return []
        return [json.loads(line) for line in self._jsonl.read_text().splitlines()]
