"""Good-node masks (capability parity: reference utils/graph_masks.py:5-35).

The mask selects hits of "interesting" particles: above a pt threshold, not
noise, reconstructable, inside the eta acceptance. On padded graphs the
``node_mask`` must additionally be applied (padding has ``particle_id < 0`` so
it fails ``particle_id > 0`` automatically, but be explicit where it matters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_good_node_mask_tensors(
    *,
    pt: jax.Array,
    particle_id: jax.Array,
    reconstructable: jax.Array,
    eta: jax.Array,
    pt_thld: float = 0.9,
    max_eta: float = 4.0,
) -> jax.Array:
    """Mask of hits from interesting particles (pt, noise, reco, eta cuts)."""
    return (
        (pt > pt_thld)
        & (particle_id > 0)
        & (reconstructable > 0)
        & (jnp.abs(eta) < max_eta)
    )


def get_good_node_mask(data, *, pt_thld: float = 0.9, max_eta: float = 4.0) -> jax.Array:
    """`get_good_node_mask_tensors` applied to an `EventGraph` (incl. padding)."""
    return (
        get_good_node_mask_tensors(
            pt=data.pt,
            particle_id=data.particle_id,
            reconstructable=data.reconstructable,
            eta=data.eta,
            pt_thld=pt_thld,
            max_eta=max_eta,
        )
        & data.node_mask
    )


def get_edge_mask_from_node_mask(node_mask: jax.Array, edge_index: jax.Array) -> jax.Array:
    """Mask of edges whose both endpoints pass the node mask."""
    return node_mask[edge_index[0]] & node_mask[edge_index[1]]
