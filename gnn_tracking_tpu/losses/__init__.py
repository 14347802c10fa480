"""Multi-loss framework (capability parity: reference metrics/losses/__init__.py).

Loss functions are pure jittable functions over arrays plus thin stateless
class wrappers that hold hyperparameters and mirror the reference's
keyword-argument interface (``forward(**model_output_and_data)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class MultiLossFctReturn:
    """Return type for loss functions that return multiple named losses.

    Mirror of reference ``metrics/losses/__init__.py:13-35``.
    """

    #: Split-up losses
    loss_dct: dict[str, jax.Array]
    #: Weights
    weight_dct: dict[str, jax.Array | float]
    #: Other things that should be logged
    extra_metrics: dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self) -> None:
        assert self.loss_dct.keys() == self.weight_dct.keys()

    @property
    def loss(self) -> jax.Array:
        total = sum(self.weighted_losses.values())
        return jnp.asarray(total)

    @property
    def weighted_losses(self) -> dict[str, jax.Array]:
        return {k: v * self.weight_dct[k] for k, v in self.loss_dct.items()}


# Register as a pytree so loss returns can flow through jit/grad boundaries.
jax.tree_util.register_pytree_node(
    MultiLossFctReturn,
    lambda r: (
        (r.loss_dct, r.weight_dct, r.extra_metrics),
        tuple(sorted(r.loss_dct.keys())),
    ),
    lambda aux, children: MultiLossFctReturn(
        loss_dct=children[0], weight_dct=children[1], extra_metrics=children[2]
    ),
)


class MultiLossFct:
    """Base class for loss functions returning multiple named losses."""

    def __call__(self, **kwargs: Any) -> MultiLossFctReturn:
        raise NotImplementedError


class DummyMultiLoss(MultiLossFct):
    """Sums the ``x`` input — for training-loop speed tests
    (reference ``metrics/losses/__init__.py:44``)."""

    def __call__(self, *, x: jax.Array, **kwargs: Any) -> MultiLossFctReturn:
        return MultiLossFctReturn(
            loss_dct={"dummy": jnp.sum(x)},
            weight_dct={"dummy": 1.0},
        )


class LossClones:
    """Evaluate one loss on multiple suffixed inputs (``w_0``/``y_0``, ...).

    Mirror of reference ``metrics/losses/__init__.py:57-124`` — used to apply
    an edge loss to every intermediate EC layer output.
    """

    def __init__(self, loss: Callable[..., Any], prefixes: tuple[str, ...] = ("w", "y")):
        self._loss = loss
        self._prefixes = prefixes

    def __call__(self, **kwargs: Any) -> dict[str, Any]:
        kwargs = dict(kwargs)
        for prefix in self._prefixes:
            kwargs.pop(prefix, None)
        main = self._prefixes[0] + "_"
        layer_names = sorted(k[len(main) :] for k in kwargs if k.startswith(main))
        losses = {}
        for layer_name in layer_names:
            rename = {f"{p}_{layer_name}": p for p in self._prefixes}
            renamed = {rename.get(k, k): v for k, v in kwargs.items()}
            losses[layer_name] = self._loss(**renamed)
        return losses


def unpack_loss_returns(key: str, returns: Any) -> dict[str, Any]:
    """Flatten possibly-nested loss returns into ``{key_subkey: value}``."""
    if isinstance(returns, Mapping):
        return {f"{key}_{k}": v for k, v in returns.items()}
    return {key: returns}
