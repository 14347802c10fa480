"""Minimal training loop with checkpointing and console metric tables.

Replaces the reference's delegation to PyTorch Lightning's ``Trainer``
(reference ``training/run.py``) with an explicit loop: jitted steps, host
metric accumulation with standard errors (``ImprovedLogLM`` analog),
orbax checkpoints carrying the full config tree
(reference checkpoint semantics: ``utils/lightning.py:97-153``), and the
epoch-end validation table (reference ``training/callbacks.py:17-84``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

from gnn_tracking_tpu.training.logging_utils import MetricAccumulator
from gnn_tracking_tpu.utils.log import logger
from gnn_tracking_tpu.utils.nomenclature import random_trial_name


def format_results_table(
    metrics: dict[str, float], *, highlight: Any = None, max_rows: int = 60
) -> str:
    """Epoch results table; rich markup when available
    (reference ``callbacks.py:17-54``)."""
    try:
        import io

        from rich.console import Console
        from rich.table import Table

        table = Table(title="Validation results")
        table.add_column("Metric")
        table.add_column("Value", justify="right")
        table.add_column("Error", justify="right")
        shown = 0
        for k in sorted(metrics):
            if k.endswith("_std"):
                continue
            err = metrics.get(f"{k}_std", float("nan"))
            style = "bold bright_magenta" if highlight and highlight(k) else ""
            table.add_row(k, f"{metrics[k]:.5f}", f"{err:.5f}", style=style)
            shown += 1
            if shown >= max_rows:
                break
        buf = io.StringIO()
        Console(file=buf, width=100).print(table)
        return buf.getvalue()
    except ImportError:
        pass
    lines = ["", f"{'Metric':<50} {'Value':>12} {'Error':>12}"]
    lines.append("-" * 76)
    shown = 0
    for k in sorted(metrics):
        if k.endswith("_std"):
            continue
        err = metrics.get(f"{k}_std", float("nan"))
        mark = ">>" if highlight and highlight(k) else "  "
        lines.append(f"{mark} {k:<48} {metrics[k]:>12.5f} {err:>12.5f}")
        shown += 1
        if shown >= max_rows:
            lines.append(f"... ({len(metrics) - shown} more)")
            break
    return "\n".join(lines)


class Checkpointer:
    """Orbax-backed checkpointing of (params, opt_state, step) + JSON config.

    ``async_save=True`` writes in the background (orbax ``AsyncCheckpointer``
    copies the arrays to host synchronously, so the training step's buffer
    donation cannot invalidate an in-flight save); call :meth:`wait` (the
    Trainer does at the end of ``fit``) before reading the files back.
    """

    def __init__(self, log_dir: Path, *, async_save: bool = False):
        import orbax.checkpoint as ocp

        self._dir = Path(log_dir).absolute() / "checkpoints"
        self._dir.mkdir(parents=True, exist_ok=True)
        self._async = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()

    def save(self, module, config: dict | None = None, tag: str | None = None) -> Path:
        tag = tag if tag is not None else f"{module.step:08d}"
        path = self._dir / f"checkpoint_{tag}"
        state = {"params": module.params, "opt_state": module.opt_state}
        if getattr(module, "batch_stats", None):
            state["batch_stats"] = module.batch_stats
        if self._async:
            import orbax.checkpoint as ocp

            self._ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        else:
            self._ckptr.save(path, state, force=True)
            self._ckptr.wait_until_finished()
        meta = {"step": module.step, "config": config or {}}
        (self._dir / f"checkpoint_{tag}_meta.json").write_text(json.dumps(meta, default=str))
        return path

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk."""
        self._ckptr.wait_until_finished()

    def restore(self, module, path: str | Path) -> None:
        self.wait()
        state = {"params": module.params, "opt_state": module.opt_state}
        if getattr(module, "batch_stats", None):
            state["batch_stats"] = module.batch_stats
        if self._async:
            import orbax.checkpoint as ocp

            restored = self._ckptr.restore(
                Path(path).absolute(), args=ocp.args.StandardRestore(state)
            )
        else:
            restored = self._ckptr.restore(Path(path).absolute(), state)
        module.params = restored["params"]
        module.opt_state = restored["opt_state"]
        if "batch_stats" in restored:
            module.batch_stats = restored["batch_stats"]
        meta_path = Path(str(path) + "_meta.json")
        if meta_path.exists():
            module.step = json.loads(meta_path.read_text())["step"]


class Trainer:
    """Explicit train/validate loop for `TrackingModule` tasks."""

    def __init__(
        self,
        *,
        max_epochs: int = 1,
        max_steps: int | None = None,
        log_dir: str | Path = "runs",
        name: str | None = None,
        checkpoint_every_epoch: bool = True,
        log_every_n_steps: int = 50,
        print_validation_results: bool = True,
        monitor: str | None = None,
        monitor_mode: str = "max",
        val_every_n_epochs: int = 1,
        async_checkpoints: bool = False,
        train_transform=None,
        ema_decay: float | None = None,
    ):
        """
        Args:
            monitor: Validation metric to track; the best epoch additionally
                saves a ``checkpoint_best`` (reference: Lightning's
                ModelCheckpoint(monitor=...)).
            monitor_mode: "max" or "min".
            val_every_n_epochs: Run validation every N epochs.
            async_checkpoints: Write checkpoints in the background (epoch-end
                saves overlap the next epoch's compute).
            train_transform: Optional ``(batch, step) -> batch`` applied to
                every TRAIN batch (never validation) — e.g.
                :class:`~gnn_tracking_tpu.utils.augmentation.PhiRotation`.
                Shape-preserving transforms only (no recompiles).
            ema_decay: When set (e.g. 0.998), maintain an exponential moving
                average of the parameters over training steps. ALL validation
                (including the ``monitor`` selection and ``checkpoint_best``)
                then evaluates and saves the EMA weights — the low-variance
                estimate of the late-training model. Variance reduction for
                noisy, quantized selection metrics (few-particle
                double-majority); the functional-JAX analog of the reference
                ecosystem's ``StochasticWeightAveraging``/EMA callbacks.
                Last-epoch raw params stay in ``module.params``; the EMA tree
                is exposed as :attr:`ema_params`.
        """
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.name = name or random_trial_name()
        self.log_dir = Path(log_dir) / self.name
        self.checkpoint_every_epoch = checkpoint_every_epoch
        self.log_every_n_steps = log_every_n_steps
        self.print_validation_results = print_validation_results
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        self.val_every_n_epochs = val_every_n_epochs
        self.async_checkpoints = async_checkpoints
        if isinstance(train_transform, dict) and "class_path" in train_transform:
            from gnn_tracking_tpu.training.config import obj_from_config

            train_transform = obj_from_config(train_transform)
        self.train_transform = train_transform
        self.ema_decay = ema_decay
        #: EMA parameter tree (populated during fit when ``ema_decay`` set)
        self.ema_params = None
        self._ema_update = None
        self._best_monitor: float | None = None
        #: full validation dict of the best-monitor epoch (model selection,
        #: reference: Lightning ModelCheckpoint(monitor=...) + its
        #: best_model_score)
        self.best_metrics: dict[str, float] = {}
        self._checkpointer: Checkpointer | None = None
        self._run_logger = None
        self.metrics_history: list[dict[str, float]] = []

    @property
    def checkpointer(self) -> Checkpointer:
        if self._checkpointer is None:
            self._checkpointer = Checkpointer(
                self.log_dir, async_save=self.async_checkpoints
            )
        return self._checkpointer

    def fit(
        self,
        module,
        datamodule,
        config: dict | None = None,
        *,
        resume: bool = False,
    ) -> dict[str, float]:
        """Train; with ``resume=True``, restore the latest checkpoint under
        this trainer's ``log_dir`` first (preemption recovery — the TPU
        analog of Lightning's ``ckpt_path="last"``; epochs already covered
        by ``module.step`` are skipped via ``max_steps`` accounting)."""
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        try:
            val_loader = datamodule.val_dataloader()
        except ValueError:
            val_loader = None

        from gnn_tracking_tpu.utils.oom import tolerate_some_oom_errors

        safe_step = tolerate_some_oom_errors(
            lambda batch: module.training_step(batch)
        )
        if resume:
            from gnn_tracking_tpu.training.config import find_latest_checkpoint

            try:
                latest = find_latest_checkpoint(self.log_dir)
            except FileNotFoundError:
                latest = None
            if latest is not None and latest.is_dir():
                # params must exist before restore (orbax needs the template)
                batch0 = next(iter(train_loader))
                module.setup_params(batch0)
                self.checkpointer.restore(module, latest)
                logger.info(
                    "Resumed from %s (step %d)", latest, module.step
                )
        last_val: dict[str, float] = {}
        for epoch in range(self.max_epochs):
            t0 = time.perf_counter()
            acc = MetricAccumulator()
            n_steps = 0
            for batch in train_loader:
                module.setup_params(batch)
                if self.train_transform is not None:
                    batch = self.train_transform(batch, module.step)
                metrics = safe_step(batch)
                if metrics is None:  # skipped OOM batch
                    continue
                if self.ema_decay is not None:
                    import jax

                    if self.ema_params is None:
                        # deep-copy: module.params' buffers are donated into
                        # the next train step — an alias would be deleted
                        self.ema_params = jax.tree.map(
                            lambda a: a.copy(), module.params
                        )
                        d = float(self.ema_decay)
                        self._ema_update = jax.jit(
                            lambda e, p: jax.tree.map(
                                lambda a, b: a * d + b * (1.0 - d), e, p
                            )
                        )
                    else:
                        self.ema_params = self._ema_update(
                            self.ema_params, module.params
                        )
                acc.update(metrics)
                n_steps += 1
                if module.step % self.log_every_n_steps == 0:
                    logger.info(
                        "epoch %d step %d: total=%.5f", epoch, module.step,
                        metrics.get("total", float("nan")),
                    )
                if self.max_steps is not None and module.step >= self.max_steps:
                    break
            train_metrics = {f"{k}_train": v for k, v in acc.compute().items()}
            logger.info(
                "epoch %d done in %.1fs (%d steps)",
                epoch,
                time.perf_counter() - t0,
                n_steps,
            )
            # the final epoch always validates, so `val_every_n_epochs`
            # never silently drops the last (often best) model from
            # selection, and the returned metrics always reflect the end
            # of training
            if val_loader is not None and (
                (epoch + 1) % self.val_every_n_epochs == 0
                or epoch == self.max_epochs - 1
            ):
                last_val = self.validate(
                    module, loader=val_loader, params=self.ema_params
                )
                if self.monitor is not None and self.monitor in last_val:
                    value = last_val[self.monitor]
                    better = self._best_monitor is None or (
                        value > self._best_monitor
                        if self.monitor_mode == "max"
                        else value < self._best_monitor
                    )
                    if better:
                        self._best_monitor = value
                        self.best_metrics = dict(last_val)
                        # checkpoint_best holds the weights that were
                        # evaluated — the EMA tree when ema_decay is on
                        if self.ema_params is not None:
                            raw = module.params
                            module.params = self.ema_params
                            try:
                                self.checkpointer.save(
                                    module, config=config, tag="best"
                                )
                            finally:
                                module.params = raw
                        else:
                            self.checkpointer.save(module, config=config, tag="best")
                        logger.info(
                            "New best %s=%.5f (checkpoint_best)", self.monitor, value
                        )
            epoch_metrics = {**train_metrics, **last_val}
            self.metrics_history.append(epoch_metrics)
            if self._run_logger is None:
                from gnn_tracking_tpu.training.loggers import RunLogger

                self._run_logger = RunLogger(self.log_dir, config=config)
            self._run_logger.log(module.step, epoch_metrics)
            if self.checkpoint_every_epoch:
                self.checkpointer.save(module, config=config)
            if self.max_steps is not None and module.step >= self.max_steps:
                break
        if self._checkpointer is not None:
            self._checkpointer.wait()
        out = dict(last_val)
        if self.monitor is not None and self._best_monitor is not None:
            # expose the selected-model metric alongside the last-epoch
            # values (callers report both: last = unbiased trajectory end,
            # best = what checkpoint_best serves)
            out[f"best_{self.monitor}"] = self._best_monitor
        return out

    def validate(
        self, module, datamodule=None, loader=None, params=None
    ) -> dict[str, float]:
        """Run validation; ``params`` (e.g. :attr:`ema_params` or a restored
        checkpoint tree) temporarily replaces ``module.params`` for the pass."""
        if loader is None:
            datamodule.setup("validate")
            loader = datamodule.val_dataloader()
        raw = module.params
        if params is not None:
            module.params = params
        try:
            acc = MetricAccumulator()
            for i, batch in enumerate(loader):
                module.setup_params(batch)
                acc.update(module.validation_step(batch, i))
            metrics = acc.compute()
            metrics |= module.on_validation_epoch_end()
        finally:
            if params is not None:
                module.params = raw
        if self.print_validation_results:
            print(format_results_table(metrics, highlight=module.highlight_metric))
        return metrics

    def test(self, module, datamodule) -> dict[str, float]:
        datamodule.setup("test")
        loader = datamodule.test_dataloader()
        acc = MetricAccumulator()
        for i, batch in enumerate(loader):
            module.setup_params(batch)
            acc.update(module.validation_step(batch, i))
        metrics = acc.compute()
        metrics |= module.on_validation_epoch_end()
        return metrics
