"""Edge-filter models: per-edge decisions without message passing
(capability parity: reference ``models/edge_filter.py``)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.mlp import MLP, NormalLinear


class EFDeepSet(nn.Module):
    """Deep-sets edge filter (reference ``edge_filter.py:22-63``): node
    encoder on L2-normalized features; per-edge permutation invariants
    ``|x_i - x_j|`` and ``x_i + x_j`` → aggregator MLP → W."""

    hidden_dim: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        norm = jnp.linalg.norm(data.x, axis=-1, keepdims=True)
        x = data.x / jnp.maximum(norm, 1e-12)
        x_encoded = MLP(
            output_size=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            L=self.depth,
            bias=False,
            include_last_activation=True,
            name="node_encoder",
        )(x)
        xi = x_encoded[data.edge_index[0]]
        xj = x_encoded[data.edge_index[1]]
        invariant = jnp.concatenate([jnp.abs(xi - xj), xi + xj], axis=1)
        logits = MLP(
            output_size=1,
            hidden_dim=2 * self.hidden_dim,
            L=self.depth,
            bias=False,
            name="aggregator",
        )(invariant)
        epsilon = 1e-8
        w = epsilon + (1 - 2 * epsilon) * nn.sigmoid(logits).squeeze(-1)
        return {"W": w}


class EFMLP(nn.Module):
    """Residual MLP edge filter over ``[x_i, x_j, edge_attr]`` with
    variance-scaled init (reference ``edge_filter.py:66-134``)."""

    node_indim: int
    hidden_dim: int
    depth: int
    edge_indim: int = 0
    beta: float = 0.4

    @nn.compact
    def __call__(self, data: EventGraph) -> dict[str, jax.Array]:
        i, j = data.edge_index[0], data.edge_index[1]
        features = [data.x[i], data.x[j]]
        if self.edge_indim > 0:
            features.append(data.edge_attr)
        x = jnp.concatenate(features, axis=1)
        in_dim = 2 * self.node_indim + self.edge_indim
        x = NormalLinear(self.hidden_dim, var=1.0 / in_dim, use_bias=False, name="encoder")(x)
        for k in range(self.depth - 1):
            delta = NormalLinear(
                self.hidden_dim,
                var=2.0 / self.hidden_dim,
                use_bias=False,
                name=f"layer_{k}",
            )(nn.relu(x))
            x = math.sqrt(self.beta) * delta + math.sqrt(1 - self.beta) * x
        logits = NormalLinear(1, var=2.0 / self.hidden_dim, use_bias=False, name="decoder")(
            nn.relu(x)
        )
        w = 0.001 + 0.998 * nn.sigmoid(logits).squeeze(-1)
        return {"W": w}


class GeometricEF(nn.Module):
    """Parameter-free geometric edge filter: cuts on phi_slope, z0, dR
    (reference ``edge_filter.py:137-162``). Expects node features
    ``[r, phi, z, eta, ...]`` (the default point-cloud layout)."""

    phi_slope_max: float
    z0_max: float
    dR_max: float

    def __call__(self, data: EventGraph) -> jax.Array:
        r, phi, z, eta = data.x[:, 0], data.x[:, 1], data.x[:, 2], data.x[:, 3]
        i, j = data.edge_index[0], data.edge_index[1]
        dz = z[i] - z[j]
        dr = r[i] - r[j]
        dphi = phi[i] - phi[j]
        deta = eta[i] - eta[j]
        dR = jnp.sqrt(deta**2 + dphi**2)
        phi_slope = dphi / dR
        z0 = z[i] - r[i] * dz / dr
        return (
            (jnp.abs(phi_slope) < self.phi_slope_max)
            & (jnp.abs(z0) < self.z0_max)
            & (jnp.abs(dR) < self.dR_max)
        )
