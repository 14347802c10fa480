"""Single-kernel connected components: the whole label-propagation loop in
VMEM.

The XLA path (``ops/cc.py``) round-trips ``labels [N]`` and the ``[N, k]``
neighbor gather through HBM once per sweep, and the ``lax.while_loop``
serializes sweeps. For DBSCAN-scale inputs the entire state is tiny
(N=16k: labels 64 KB, neighbor table ~4 MB) — it fits in VMEM with room to
spare, so this kernel runs the complete fixed-point iteration in ONE
``pallas_call``: per sweep a table gather ``labels[neighbor_idx]`` + row-min
(VPU), then pointer-jumping hops, with convergence checked in-kernel.

Requires Mosaic's dynamic-gather lowering for 1-D table lookups
(``jnp.take(table, idx)``); hardware support is probed by the round-2
battery (``exp_cc``) — callers should treat :func:`cc_neighbors_pallas` as
an optimization behind the exact XLA fallback (``connected_components_neighbors``).

Reference replaced: host networkx CC (``analysis/graphs.py:316-343``) inside
the DBSCAN scan loop (``postprocessing/fastrescanner.py:40-66``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gnn_tracking_tpu.ops.pallas.fused_relational import _resolve_interpret


def _cc_kernel(idx_ref, mask_ref, labels_ref, *, n: int, max_sweeps: int, jumps: int):
    labels = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    sentinel = jnp.int32(n)
    idx = idx_ref[:]
    mask = mask_ref[:] > 0

    def sweep(state):
        labels, _, it = state
        neigh = jnp.where(mask, jnp.take(labels, idx, axis=0), sentinel)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        for _ in range(jumps):
            new = jnp.minimum(new, jnp.take(new, new, axis=0))
        return new, labels, it + 1

    def cond(state):
        labels, prev, it = state
        return jnp.any(labels != prev) & (it < max_sweeps)

    first = sweep((labels, labels, jnp.int32(0)))
    labels, _, _ = jax.lax.while_loop(cond, sweep, first)
    labels_ref[:] = labels


@functools.partial(
    jax.jit, static_argnames=("max_sweeps", "jumps", "interpret")
)
def cc_neighbors_pallas(
    neighbor_idx: jax.Array,
    neighbor_mask: jax.Array,
    *,
    max_sweeps: int = 64,
    jumps: int = 6,
    interpret: bool | None = None,
) -> jax.Array:
    """Connected components from a fixed-degree symmetric neighbor table —
    one kernel, state VMEM-resident. Same contract as
    ``ops.cc.connected_components_neighbors``."""
    interpret = _resolve_interpret(interpret)
    n, k = neighbor_idx.shape
    return pl.pallas_call(
        functools.partial(_cc_kernel, n=n, max_sweeps=max_sweeps, jumps=jumps),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        interpret=interpret,
    )(neighbor_idx.astype(jnp.int32), neighbor_mask.astype(jnp.float32))
