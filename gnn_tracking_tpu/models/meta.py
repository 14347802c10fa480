"""Meta/wrapper models (capability parity: reference ``models/meta.py`` and
``models/noise_classification.py``)."""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from gnn_tracking_tpu.graphs import EventGraph


class Sequential(nn.Module):
    """Sequentially apply EventGraph → EventGraph modules
    (reference ``meta.py:10-27``)."""

    layers: Sequence[nn.Module]

    def __call__(self, data: EventGraph) -> EventGraph:
        for layer in self.layers:
            data = layer(data)
        return data


class TruthNoiseClassifierModel(nn.Module):
    """Mask out noise hits using truth information
    (reference ``noise_classification.py:11-16``). Returns the keep-mask."""

    def __call__(self, data: EventGraph) -> jax.Array:
        return data.particle_id != 0


class WithNoiseClassification(nn.Module):
    """Apply a noise filter before a model (reference
    ``noise_classification.py:20-33``). The filtered hits are masked, not
    removed; the mask is returned as ``hit_mask``."""

    noise_model: nn.Module
    model: nn.Module

    def __call__(self, data: EventGraph) -> dict[str, jax.Array | None]:
        mask = self.noise_model(data)
        masked = data.mask_nodes(mask)
        out = dict(self.model(masked))
        out["hit_mask"] = mask & data.node_mask
        return out
