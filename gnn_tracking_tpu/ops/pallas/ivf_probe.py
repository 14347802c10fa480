"""Pallas TPU kernel: the IVF-kNN probe (bucketed cell scan).

``ops/ivf_knn.py``'s probe is the step where every bucketed query scans the
``T`` cells nearest its own cell. The XLA formulation (grouped gathers +
batched norm-expansion matmuls + ``lax.top_k``) measured ~44 ms per probed
cell at 262k points (round-2 battery #11/#13) — ~60x off the memory
roofline, dominated by tiny-slab gathers (`[cap, d]` = 3 KB rows) and
materialized ``[cap, T*cap]`` distance tiles.

This kernel instead runs grid ``(C, T)`` with the ``nbr: [C, T]`` probe
table as a *scalar-prefetch* operand: Pallas pipelines the candidate cell's
coordinate slab (transposed, ``[d, cap]``) and id row straight from HBM by
reading the prefetched ``nbr[i, t]`` inside the BlockSpec index_map — a
data-dependent DMA, no gather op in sight. Distances use the direct
``sum_d (q - c)^2`` form on the VPU (d is 4-16 here; the MXU's K=128
contraction would be ~94% padding) — which is also *exactly* the rerank
formula, so this path has none of the norm-expansion cancellation noise the
XLA probe needs a rerank to absorb. The running ``[cap, kw]`` top-k lives in
the revisited output block across ``t`` steps (same accumulation pattern as
``pairwise_topk_streaming``; full-block read/modify/write, no dynamic-slice
RMW).

Outputs match the XLA probe contract: ``(dists [C*cap, kw], idx [C*cap,
kw])`` in bucket-slot order, +inf rows for empty slots (empty slots carry
``_FAR`` coordinates, so they exclude themselves as candidates and their
query rows are dropped by the caller's scatter).

Reference replaced: torch_cluster ``knn`` (reference
``models/graph_construction.py:222-237``) — the probe is this framework's
scale-out path for it (SURVEY §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(
    nbr_ref,  # [C*T] i32 scalar-prefetch (flat: SMEM pads 2-D lanes to 128)
    q_ref,  # [1, cap, d] query slab (cell i)
    qid_ref,  # [1, 1, cap] i32 query global ids
    ct_ref,  # [1, d, capc] candidate slab, transposed (cell nbr[i, t])
    cid_ref,  # [1, 1, capc] i32 candidate global ids
    dists_ref,  # [1, cap, kw] running best distances (revisited over t)
    idx_ref,  # [1, cap, kw] running best ids (revisited over t)
    *,
    kw: int,
    d: int,
    loop: bool,
):
    cap = q_ref.shape[1]
    capc = ct_ref.shape[2]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        dists_ref[0] = jnp.full((cap, kw), jnp.inf, dtype=jnp.float32)
        idx_ref[0] = jnp.zeros((cap, kw), dtype=jnp.int32)

    # direct-formula distances on the VPU: dd[q, c] = sum_d (Q[q,d]-C[d,c])^2
    dd = jnp.zeros((cap, capc), dtype=jnp.float32)
    for dim in range(d):
        diff = q_ref[0, :, dim : dim + 1] - ct_ref[0, dim : dim + 1, :]
        dd = dd + diff * diff

    cid = jnp.broadcast_to(cid_ref[0], (cap, capc))
    if not loop:
        qid = qid_ref[0, 0][:, None]  # [cap, 1]
        dd = jnp.where(cid == qid, jnp.inf, dd)

    # merge the step's [cap, capc] tile into the running [cap, kw] best:
    # kw rounds of row-min + first-position select (Mosaic has no sort)
    best_d = dists_ref[0]
    best_i = idx_ref[0]
    all_d = jnp.concatenate([best_d, dd], axis=1)
    all_i = jnp.concatenate([best_i, cid], axis=1)
    width = all_d.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (cap, kw), 1)

    def select(j, carry):
        all_d_c, new_d, new_i = carry
        row_min = jnp.min(all_d_c, axis=1, keepdims=True)
        is_min = all_d_c == row_min
        first_min = jnp.min(
            jnp.where(is_min, pos, width), axis=1, keepdims=True
        )
        sel = pos == first_min
        min_i = jnp.max(jnp.where(sel, all_i, 0), axis=1)
        write = out_pos == j
        new_d = jnp.where(write, row_min, new_d)
        new_i = jnp.where(write, min_i[:, None], new_i)
        all_d_c = jnp.where(sel, jnp.inf, all_d_c)
        return all_d_c, new_d, new_i

    init = (
        all_d,
        jnp.full((cap, kw), jnp.inf, dtype=jnp.float32),
        jnp.zeros((cap, kw), dtype=jnp.int32),
    )
    _, new_d, new_i = jax.lax.fori_loop(0, kw, select, init)
    dists_ref[0] = new_d
    idx_ref[0] = new_i


@functools.partial(
    jax.jit, static_argnames=("kw", "loop", "interpret")
)
def ivf_probe(
    xb: jax.Array,  # [C, cap, d] f32 bucketed query coordinates (_FAR empty)
    ib: jax.Array,  # [C, cap] i32 global ids (0 for empty slots)
    xc: jax.Array,  # [C, capc, d] f32 candidate table (may be wider than xb)
    ic: jax.Array,  # [C, capc] i32 candidate global ids
    nbr: jax.Array,  # [C, T] i32 cells each cell probes (self first)
    *,
    kw: int,
    loop: bool = False,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Probe the ``T`` neighbor cells of every bucket slot.

    Returns ``(dists [C*cap, kw], idx [C*cap, kw])`` — squared distances
    (exact f32 direct formula) and global ids of each slot's best ``kw``
    candidates among its cell's probed slabs; +inf where fewer exist.
    """
    c, cap, d = xb.shape
    capc = xc.shape[1]
    t = nbr.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xct = jnp.swapaxes(xc, 1, 2)  # [C, d, capc] — lane dim = capc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, t),
        in_specs=[
            pl.BlockSpec((1, cap, d), lambda i, j, nbr_ref: (i, 0, 0)),
            pl.BlockSpec((1, 1, cap), lambda i, j, nbr_ref: (i, 0, 0)),
            pl.BlockSpec(
                (1, d, capc),
                lambda i, j, nbr_ref: (nbr_ref[i * t + j], 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, capc),
                lambda i, j, nbr_ref: (nbr_ref[i * t + j], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, kw), lambda i, j, nbr_ref: (i, 0, 0)),
            pl.BlockSpec((1, cap, kw), lambda i, j, nbr_ref: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(_probe_kernel, kw=kw, d=d, loop=loop)
    dists, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c, cap, kw), jnp.float32),
            jax.ShapeDtypeStruct((c, cap, kw), jnp.int32),
        ],
        interpret=interpret,
    )(
        nbr.astype(jnp.int32).reshape(-1),
        xb,
        ib[:, None, :],
        xct,
        ic[:, None, :],
    )
    return dists.reshape(c * cap, kw), idx.reshape(c * cap, kw)
