"""Config-driven object construction and checkpoint discovery.

Capability parity: reference ``utils/lightning.py`` (``obj_from_or_to_hparams``
/ ``load_obj_from_hparams`` / ``get_object_from_path`` /
``find_latest_checkpoint``). The same ``{class_path, init_args}`` YAML layout
the reference uses (LightningCLI-style) instantiates objects here, so
reference configs port over; the full config tree is stored inside every
checkpoint so a model can be reconstructed from the checkpoint alone.
"""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any


def get_object_from_path(path: str, init_args: dict[str, Any] | None = None) -> Any:
    """Import ``module.ClassName`` and instantiate it
    (reference ``utils/lightning.py:83-94``)."""
    module_name, _, class_name = path.rpartition(".")
    module = importlib.import_module(module_name)
    cls = getattr(module, class_name)
    return cls(**(init_args or {}))


def obj_from_config(config: Any) -> Any:
    """Recursively instantiate ``{class_path, init_args}`` trees
    (reference ``utils/lightning.py:59-80``). Lists/dicts are traversed;
    other values pass through."""
    if isinstance(config, dict) and "class_path" in config:
        init_args = {
            k: obj_from_config(v) for k, v in config.get("init_args", {}).items()
        }
        return get_object_from_path(config["class_path"], init_args)
    if isinstance(config, dict):
        return {k: obj_from_config(v) for k, v in config.items()}
    if isinstance(config, list):
        return [obj_from_config(v) for v in config]
    return config


def config_from_obj(obj: Any) -> Any:
    """Best-effort round-trip of an object back to ``{class_path, init_args}``
    using its public attributes (flax module fields or plain attrs)."""
    import dataclasses

    if obj is None or isinstance(obj, (int, float, str, bool)):
        return obj
    if isinstance(obj, (list, tuple)):
        return [config_from_obj(v) for v in obj]
    if isinstance(obj, dict):
        return {k: config_from_obj(v) for k, v in obj.items()}
    cls = type(obj)
    class_path = f"{cls.__module__}.{cls.__qualname__}"
    if dataclasses.is_dataclass(obj):
        init_args = {
            f.name: config_from_obj(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
            if f.init and not f.name.startswith("_") and f.name not in ("parent", "name")
        }
    else:
        init_args = {
            k: config_from_obj(v)
            for k, v in vars(obj).items()
            if not k.startswith("_")
        }
    return {"class_path": class_path, "init_args": init_args}


def find_latest_checkpoint(log_dir: str | Path, trial_name: str = "") -> Path:
    """Find the most recent checkpoint under a log directory
    (reference ``utils/lightning.py:215-238``).

    ``checkpoint_best`` is excluded: with ``Trainer(ema_decay=...)`` it
    holds the EMA weights paired with the raw trajectory's optimizer
    state — a model-selection artifact, not a resumable training state.
    """
    log_dir = Path(log_dir)
    if trial_name:
        log_dir = log_dir / trial_name
    hits = sorted(
        (
            p
            for p in log_dir.glob("**/checkpoint_*")
            if not p.name.endswith("_meta.json") and p.name != "checkpoint_best"
        ),
        key=lambda p: p.stat().st_mtime,
    )
    if not hits:
        msg = f"No checkpoint found below {log_dir}"
        raise FileNotFoundError(msg)
    return hits[-1]
