"""Edge-classification losses (capability parity: reference metrics/losses/ec.py).

All means are masked means so the losses are exact on padded edge arrays.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _masked_mean(values: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return jnp.mean(values)
    return jnp.sum(jnp.where(mask, values, 0.0)) / jnp.maximum(mask.sum(), 1)


def binary_cross_entropy(
    *, inpt: jax.Array, target: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Mean binary cross entropy on probabilities (not logits)."""
    eps = jnp.finfo(inpt.dtype).tiny
    losses = -(
        target * jnp.log(jnp.maximum(inpt, eps))
        + (1.0 - target) * jnp.log(jnp.maximum(1.0 - inpt, eps))
    )
    return _masked_mean(losses, mask)


def binary_focal_loss(
    *,
    inpt: jax.Array,
    target: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    pos_weight: jax.Array | float = 1.0,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Binary focal loss on probabilities, kornia-style
    (reference ``ec.py:12-68``, following arXiv:1708.02002)."""
    assert gamma >= 0.0
    assert 0 <= alpha <= 1
    probs_pos = inpt
    probs_neg = 1 - inpt
    pos_term = -alpha * pos_weight * probs_neg**gamma * target * jnp.log(probs_pos)
    neg_term = -(1.0 - alpha) * probs_pos**gamma * (1.0 - target) * jnp.log(probs_neg)
    return _masked_mean(pos_term + neg_term, mask)


def falsify_low_pt_edges(
    *,
    y: jax.Array,
    edge_index: jax.Array | None = None,
    pt: jax.Array | None = None,
    pt_thld: float = 0.0,
) -> jax.Array:
    """Mark true edges whose source hit has pt < pt_thld as false
    (reference ``ec.py:71-92``)."""
    if math.isclose(pt_thld, 0.0):
        return y
    assert edge_index is not None
    assert pt is not None
    return (y.astype(bool) & (pt[edge_index[0]] > pt_thld)).astype(y.dtype)


class EdgeWeightBCELoss:
    """BCE edge-classification loss (reference ``ec.py:116-121``)."""

    def __init__(self, *, pt_thld: float = 0.0):
        self.pt_thld = pt_thld

    def __call__(
        self,
        *,
        w: jax.Array,
        y: jax.Array,
        edge_index: jax.Array | None = None,
        pt: jax.Array | None = None,
        edge_mask: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        y = falsify_low_pt_edges(y=y.astype(w.dtype), edge_index=edge_index, pt=pt, pt_thld=self.pt_thld)
        return binary_cross_entropy(inpt=w, target=y.astype(w.dtype), mask=edge_mask)


class EdgeWeightFocalLoss:
    """Focal edge-classification loss (reference ``ec.py:124-150``)."""

    def __init__(
        self,
        *,
        alpha: float = 0.25,
        gamma: float = 2.0,
        pos_weight: float = 1.0,
        pt_thld: float = 0.0,
    ):
        self.alpha = alpha
        self.gamma = gamma
        self.pos_weight = pos_weight
        self.pt_thld = pt_thld

    def __call__(
        self,
        *,
        w: jax.Array,
        y: jax.Array,
        edge_index: jax.Array | None = None,
        pt: jax.Array | None = None,
        edge_mask: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        y = falsify_low_pt_edges(y=y.astype(w.dtype), edge_index=edge_index, pt=pt, pt_thld=self.pt_thld)
        return binary_focal_loss(
            inpt=w,
            target=y.astype(w.dtype),
            alpha=self.alpha,
            gamma=self.gamma,
            pos_weight=self.pos_weight,
            mask=edge_mask,
        )


class HaughtyFocalLoss:
    """Focal loss with a pt-based positive weight (reference ``ec.py:153-178``)."""

    def __init__(self, *, alpha: float = 0.25, gamma: float = 2.0, pt_thld: float = 0.0):
        self.alpha = alpha
        self.gamma = gamma
        self.pt_thld = pt_thld

    def __call__(
        self,
        *,
        w: jax.Array,
        y: jax.Array,
        edge_index: jax.Array,
        pt: jax.Array,
        edge_mask: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        pos_weight = falsify_low_pt_edges(
            y=y, edge_index=edge_index, pt=pt, pt_thld=self.pt_thld
        ).astype(w.dtype)
        return binary_focal_loss(
            inpt=w,
            target=y.astype(w.dtype),
            alpha=self.alpha,
            gamma=self.gamma,
            pos_weight=pos_weight,
            mask=edge_mask,
        )
