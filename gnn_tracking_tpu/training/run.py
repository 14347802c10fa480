"""YAML-config CLI entry point.

Capability parity: reference ``training/run.py`` (LightningCLI). The same
config layout — top-level ``model:``/``data:``/``trainer:`` sections with
recursive ``{class_path, init_args}`` object trees — drives our Trainer, so
reference-style configs port over with updated class paths.

Usage::

    python -m gnn_tracking_tpu.training.run fit --config cfg.yml
    python -m gnn_tracking_tpu.training.run validate --config cfg.yml \
        --ckpt_path runs/.../checkpoints/checkpoint_00000100
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

import yaml

from gnn_tracking_tpu.training.config import obj_from_config
from gnn_tracking_tpu.training.trainer import Trainer
from gnn_tracking_tpu.utils.log import logger


def build_from_config(config: dict[str, Any]):
    """Instantiate (module, datamodule, trainer) from a config tree."""
    module = obj_from_config(config["model"])
    datamodule = obj_from_config(config["data"])
    trainer_cfg = config.get("trainer", {})
    if isinstance(trainer_cfg, dict) and "class_path" in trainer_cfg:
        trainer = obj_from_config(trainer_cfg)
    else:
        trainer = Trainer(**trainer_cfg)
    return module, datamodule, trainer


def cli_main(args: list[str] | None = None) -> dict[str, float]:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("command", choices=["fit", "validate", "test"])
    parser.add_argument("--config", required=True, type=Path)
    parser.add_argument("--ckpt_path", type=Path, default=None)
    parsed = parser.parse_args(args)

    config = yaml.safe_load(parsed.config.read_text())
    module, datamodule, trainer = build_from_config(config)

    if parsed.ckpt_path is not None:
        datamodule.setup("validate" if parsed.command != "fit" else "fit")
        loader = (
            datamodule.val_dataloader()
            if parsed.command != "test"
            else datamodule.test_dataloader()
        )
        module.setup_params(next(iter(loader)))
        trainer.checkpointer.restore(module, parsed.ckpt_path)
        logger.info("Restored checkpoint %s", parsed.ckpt_path)

    if parsed.command == "fit":
        return trainer.fit(module, datamodule, config=config)
    if parsed.command == "validate":
        return trainer.validate(module, datamodule)
    return trainer.test(module, datamodule)


if __name__ == "__main__":
    cli_main()
