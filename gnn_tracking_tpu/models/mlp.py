"""Fully-connected building blocks (capability parity: reference models/mlp.py).

Implemented as flax.linen modules. Initialization conventions follow the
reference where they matter for training dynamics:

* ``MLP`` uses torch's Linear default (uniform ±1/sqrt(fan_in)) so learning
  rates transfer.
* ``ResFCNN`` uses the reference's explicit variance-scaled normal init
  (reference ``mlp.py:102-113``): encoder var=1/in_dim, hidden and decoder
  var=2/hidden_dim.

The heterogeneous (pixel/strip) network is computed as two dense towers over
*all* nodes with a mask-select — no dynamic shapes, MXU-friendly, unlike the
reference's boolean-index split (``mlp.py:161-178``).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(scale: float = 1.0) -> Callable:
    """torch.nn.Linear default kernel init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float_):
        fan_in = shape[0]
        bound = scale / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(key, shape, dtype=jnp.float_, fan_in: int = 1):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch's default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(), (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s: torch_bias_init(k, s, fan_in=fan_in), (self.features,)
            )
            y = y + bias
        return y


class NormalLinear(nn.Module):
    """Dense layer with N(0, var) init on all parameters (reference
    ``ResFCNN._reset_layer_parameters``, ``mlp.py:109-113``)."""

    features: int
    var: float
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        std = math.sqrt(self.var)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.normal(k, s) * std,
            (x.shape[-1], self.features),
        )
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s: jax.random.normal(k, s) * std, (self.features,)
            )
            y = y + bias
        return y


class MLP(nn.Module):
    """ReLU multi-layer perceptron (reference ``mlp.py:18-62``).

    ``L`` total layers: 1 input layer, L-2 hidden, 1 output.
    ``hidden_dim=None`` selects max(input_size, output_size).
    """

    output_size: int
    hidden_dim: int | None = None
    L: int = 3
    bias: bool = True
    include_last_activation: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        input_size = x.shape[-1]
        hidden_dim = self.hidden_dim
        if hidden_dim is None:
            hidden_dim = max(input_size, self.output_size)
        # The reference always has at least 2 linear layers (L=1 behaves like
        # L=2, reference mlp.py:44-49); mirror that.
        for _ in range(max(self.L - 1, 1)):
            x = TorchLinear(hidden_dim, use_bias=self.bias)(x)
            x = nn.relu(x)
        x = TorchLinear(self.output_size, use_bias=self.bias)(x)
        if self.include_last_activation:
            x = nn.relu(x)
        return x


class ResFCNN(nn.Module):
    """Residual FCNN with L2-normalized input (reference ``mlp.py:65-120``).

    ``depth``: 1 encoder layer, depth-1 hidden residual layers, 1 decoder.
    Residual update: ``x = sqrt(alpha)*x + sqrt(1-alpha)*layer(relu(x))``.
    """

    out_dim: int
    hidden_dim: int
    depth: int
    alpha: float = 0.6
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, **ignore) -> jax.Array:
        if self.depth < 1:
            msg = "Depth must be at least 1"
            raise ValueError(msg)
        in_dim = x.shape[-1]
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.maximum(norm, 1e-12)
        x = NormalLinear(self.hidden_dim, var=1.0 / in_dim, use_bias=self.bias)(x)
        for _ in range(self.depth - 1):
            delta = NormalLinear(
                self.hidden_dim, var=2.0 / self.hidden_dim, use_bias=self.bias
            )(nn.relu(x))
            x = math.sqrt(self.alpha) * x + math.sqrt(1 - self.alpha) * delta
        return NormalLinear(self.out_dim, var=2.0 / self.hidden_dim, use_bias=self.bias)(
            nn.relu(x)
        )


def get_pixel_mask(layer: jax.Array) -> jax.Array:
    """Pixel detector = layers 0..17 (reference ``mlp.py:123-124``)."""
    return (layer >= 0) & (layer < 18)


class HeterogeneousResFCNN(nn.Module):
    """Separate ResFCNNs for pixel and strip hits (reference ``mlp.py:127-178``).

    TPU-native: both towers run densely over all nodes; outputs are selected
    by the pixel mask. No sorting/partitioning requirement on the input
    (the reference requires pixel-sorted hits).
    """

    out_dim: int
    hidden_dim: int
    depth: int
    alpha: float = 0.6
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, layer: jax.Array, **ignore) -> jax.Array:
        pixel_mask = get_pixel_mask(layer)
        embed_pixel = ResFCNN(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            depth=self.depth,
            alpha=self.alpha,
            bias=self.bias,
            name="pixel_fcnn",
        )(x)
        embed_strip = ResFCNN(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            depth=self.depth,
            alpha=self.alpha,
            bias=self.bias,
            name="strip_fcnn",
        )(x)
        return jnp.where(pixel_mask[:, None], embed_pixel, embed_strip)
