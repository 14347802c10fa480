"""Static-shape unique-value compaction.

Replaces the reference's dynamic ``torch.unique`` patterns
(``metrics/losses/oc.py:279``, ``metrics/cluster_metrics.py:109``) with a
sort-based compaction under a static cap — the TPU-native answer to
data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_unique(
    values: jax.Array,
    mask: jax.Array,
    max_n: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Unique masked values with static output shape.

    Returns ``(unique_values [max_n], valid [max_n], n_unique)``. The first
    ``n_unique`` entries are the sorted unique values of ``values[mask]``;
    the rest are filled with the dtype's max (which never equals a real
    value as long as real values stay below it), keeping the array sorted so
    ``searchsorted`` works on it directly.
    """
    big = jnp.asarray(jnp.iinfo(values.dtype).max, dtype=values.dtype)
    masked = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(masked)
    prev = jnp.concatenate([jnp.full((1,), big, dtype=sorted_vals.dtype), sorted_vals[:-1]])
    is_first = (sorted_vals != prev) & (sorted_vals != big)
    is_first = is_first.at[0].set(sorted_vals[0] != big)
    rank = jnp.cumsum(is_first) - 1
    n_unique = is_first.sum()
    unique_vals = jnp.full((max_n,), big, dtype=values.dtype)
    scatter_idx = jnp.where(is_first, rank, max_n)
    unique_vals = unique_vals.at[scatter_idx].set(sorted_vals, mode="drop")
    valid = jnp.arange(max_n) < n_unique
    return unique_vals, valid, n_unique


def dense_index_of(values: jax.Array, unique_values: jax.Array) -> jax.Array:
    """Index of each value in the (sorted, padded) unique array.

    For values not present (e.g. padding), the returned index points at some
    slot whose unique value differs — always pair with a validity mask.
    """
    idx = jnp.searchsorted(unique_values, values)
    return jnp.clip(idx, 0, unique_values.shape[0] - 1).astype(jnp.int32)
