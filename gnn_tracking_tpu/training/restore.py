"""Restore models from checkpoints by config (capability parity: reference
``utils/lightning.py:97-153`` ``get_lightning_module``/``get_model`` and the
from-checkpoint wrapper classes ``ECFromChkpt`` /
``MLGraphConstruction.from_chkpt`` / ``MLPCTransformerFromMLChkpt``).

Checkpoints written by our ``Trainer`` carry the full config tree
(``checkpoint_*_meta.json``), so a model can be reconstructed from the
checkpoint alone. Two usage modes:

* host-side: ``get_model(path)`` returns a ``BoundModel`` — a plain callable
  ``EventGraph -> output`` with the restored parameters baked in (for data
  transformers, analysis, scanners);
* inside a larger flax model: initialize the parent normally, then
  ``inject_params`` the restored subtree and freeze it via
  ``TrackingModule(frozen_prefixes=...)`` (the reference's ``freeze()``
  analog — ``utils/torch_utils.py:6-29``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import flax
import jax

from gnn_tracking_tpu.training.config import obj_from_config


def load_checkpoint(chkpt_path: str | Path) -> tuple[dict, dict[str, Any]]:
    """Load (state, meta) from an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    chkpt_path = Path(chkpt_path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(chkpt_path)
    meta_path = Path(str(chkpt_path) + "_meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


class BoundModel:
    """A flax module with parameters bound — a plain callable model.

    Applies in eval mode: BatchNorm running averages (``batch_stats``), when
    present in the checkpoint, are bound alongside the parameters.
    """

    def __init__(self, module, params, *, batch_stats=None, rngs: dict | None = None):
        self.module = module
        self.params = params
        self.batch_stats = batch_stats or {}
        self._rngs = rngs or {}

    def __call__(self, data, **kwargs):
        variables = {"params": self.params}
        if self.batch_stats:
            variables["batch_stats"] = self.batch_stats
        return self.module.apply(variables, data, rngs=self._rngs, **kwargs)


def get_model(
    chkpt_path: str | Path,
    *,
    config: dict | None = None,
    subtree: str = "model",
) -> BoundModel:
    """Reconstruct the model from a checkpoint and bind its parameters.

    Args:
        chkpt_path: Checkpoint directory written by our Trainer.
        config: Override the config tree (otherwise read from the
            checkpoint's meta json, key ``config.model.init_args.model``).
        subtree: Name of the parameter subtree holding the model inside the
            training module's parameter tree.
    """
    state, meta = load_checkpoint(chkpt_path)
    if config is None:
        config = meta.get("config", {})
        # the training module config wraps the model config
        model_cfg = config.get("model", {}).get("init_args", {}).get("model")
        if model_cfg is None:
            msg = (
                f"Checkpoint {chkpt_path} carries no model config; pass "
                "`config=` explicitly"
            )
            raise ValueError(msg)
    else:
        model_cfg = config
    module = obj_from_config(model_cfg)
    params = state["params"]
    batch_stats = state.get("batch_stats") or {}
    if subtree and subtree in params:
        params = params[subtree]
        batch_stats = batch_stats.get(subtree, {}) if batch_stats else {}
    return BoundModel(module, params, batch_stats=batch_stats)


def inject_params(params: dict, prefix: str, sub_params: dict) -> dict:
    """Replace the parameter subtree at ``prefix`` (e.g. ``"model/ec"``) with
    pretrained parameters; returns a new tree."""
    flat = flax.traverse_util.flatten_dict(params)
    sub_flat = flax.traverse_util.flatten_dict(sub_params)
    prefix_t = tuple(prefix.split("/"))
    # drop existing entries under the prefix, then insert the new subtree
    flat = {k: v for k, v in flat.items() if k[: len(prefix_t)] != prefix_t}
    for k, v in sub_flat.items():
        # copy: the training step donates its parameter buffers, which must
        # not invalidate the caller's checkpoint arrays
        flat[prefix_t + k] = jax.numpy.array(v, copy=True)
    return flax.traverse_util.unflatten_dict(flat)


def ec_from_chkpt(chkpt_path: str | Path, **kwargs) -> BoundModel:
    """Load a pretrained edge classifier (reference ``ECFromChkpt``,
    ``models/edge_classifier.py:166-183``)."""
    return get_model(chkpt_path, **kwargs)


def ml_graph_construction_from_chkpt(
    chkpt_path: str | Path, *, config: dict | None = None, **gc_kwargs
):
    """Load a pretrained metric-learning model and wrap it in
    ``MLGraphConstruction`` as a plain ``EventGraph -> EventGraph`` callable
    (reference ``MLGraphConstructionFromChkpt``,
    ``models/graph_construction.py:416-419``). The restored parameters are
    baked in (frozen), matching the reference's ``freeze_if`` semantics.
    """
    from gnn_tracking_tpu.models.graph_construction import MLGraphConstruction

    ml = get_model(chkpt_path, config=config)
    gc = MLGraphConstruction(ml=ml, **gc_kwargs)

    def transform(data, *, training: bool = False):
        return gc.apply({}, data, training=training)

    return transform


def ml_pc_transformer_from_chkpt(
    chkpt_path: str | Path, *, original_features: bool = False, **kwargs
):
    """Load a pretrained metric-learning model as a point-cloud transformer
    (reference ``MLPCTransformerFromMLChkpt``)."""
    import jax.numpy as jnp

    ml = get_model(chkpt_path, **kwargs)

    def transform(data):
        out = ml(data)
        x = (
            jnp.concatenate([out["H"], data.x], axis=1)
            if original_features
            else out["H"]
        )
        return data.replace(x=x)

    return transform
