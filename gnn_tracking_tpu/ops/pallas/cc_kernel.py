"""Single-kernel connected components: the whole label-propagation loop in
VMEM.

The XLA path (``ops/cc.py``) round-trips ``labels [N]`` and the ``[N, k]``
neighbor gather through HBM once per sweep, and the ``lax.while_loop``
serializes sweeps. For DBSCAN-scale inputs the entire state is tiny
(N=16k: labels 64 KB, neighbor table ~4 MB) — it fits in VMEM with room to
spare, so this kernel runs the complete fixed-point iteration in ONE
``pallas_call``: per sweep a table gather ``labels[neighbor_idx]`` + row-min
(VPU), then pointer-jumping hops, with convergence checked in-kernel.

Mosaic only lowers *2-D* gathers (``take_along_axis`` on rank-2 operands —
a rank-1 ``jnp.take`` fails with "Only 2D gather is supported" on
hardware), so every table lookup here is phrased as an axis-0
``take_along_axis`` against a column-broadcast value table:
``labels[idx[r, j]] == take_along_axis(bcast(labels, [n, k]), idx, 0)[r, j]``.

**Hardware status (probed via the chipless AOT compiler, round 2):** even
the 2-D form only lowers when the gathered dimension fits a single vreg
(8 sublanes — ``tpu.dynamic_gather`` is a per-vreg shuffle; larger tables
fail with "Multiple source vregs along gather dimension"). A DBSCAN-scale
label table (16k+ rows) therefore cannot be gathered inside a kernel at
all on current Mosaic, and this kernel remains an interpret-mode/testing
artifact. Production CC stays on the XLA neighbor-table path
(``ops/cc.py``), which measures 44 ms at 32k×64 on a v5e and 31.9 ms/trial
inside the batched DBSCAN scan (round-2 battery).

Reference replaced: host networkx CC (``analysis/graphs.py:316-343``) inside
the DBSCAN scan loop (``postprocessing/fastrescanner.py:40-66``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gnn_tracking_tpu.ops.pallas.fused_relational import _resolve_interpret

_JUMP_W = 8  # lane width for the (redundant-lane) pointer-jump gathers


def _gather0(vals_col, ids):
    """``vals[ids]`` for a column table: [n,1] values, [n,m] i32 ids → [n,m]."""
    vb = jnp.broadcast_to(vals_col, ids.shape)
    return jnp.take_along_axis(vb, ids, axis=0)


def _cc_kernel(idx_ref, mask_ref, labels_ref, *, n: int, max_sweeps: int, jumps: int):
    idx = idx_ref[:]  # [n, k] i32
    mask = mask_ref[:] > 0
    sentinel = jnp.int32(n)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def sweep(state):
        labels, _, it = state  # labels [n, 1]
        neigh = jnp.where(mask, _gather0(labels, idx), sentinel)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1, keepdims=True))
        for _ in range(jumps):
            ids = jnp.broadcast_to(new, (n, _JUMP_W))
            new = jnp.minimum(
                new, jnp.min(_gather0(new, ids), axis=1, keepdims=True)
            )
        return new, labels, it + 1

    def cond(state):
        labels, prev, it = state
        return jnp.any(labels != prev) & (it < max_sweeps)

    first = sweep((iota_col, iota_col, jnp.int32(0)))
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
    out = pl.pallas_call(
        functools.partial(_cc_kernel, n=n, max_sweeps=max_sweeps, jumps=jumps),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=interpret,
    )(neighbor_idx.astype(jnp.int32), neighbor_mask.astype(jnp.float32))
    return out[:, 0]
