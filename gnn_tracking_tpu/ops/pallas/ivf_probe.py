"""Pallas TPU kernel: the IVF-kNN probe (bucketed cell scan).

``ops/ivf_knn.py``'s probe is the step where every bucketed query scans the
``T`` cells nearest its own cell. The XLA formulation (grouped gathers +
batched norm-expansion matmuls + ``lax.top_k``) measured ~44-57 ms per
probed cell at 262k points (round-2 batteries #11/#13/#15) — ~60x off the
memory roofline, dominated by tiny-slab gathers (``[cap, d]`` = 3 KB rows)
and materialized ``[cap, T*cap]`` distance tiles.

Kernel structure (v2 — battery #15 killed v1): grid ``(C,)`` with the
flattened ``nbr: [C*T]`` probe table as a *scalar-prefetch* operand and
**T static candidate in_specs** — Pallas pipelines each candidate cell's
transposed slab straight from HBM by reading ``nbr[i*T + t]`` inside the
BlockSpec index_map (data-dependent DMA, no gather op). All T distance
tiles are computed in VMEM and merged in ONE top-kw pass per cell, and the
outputs are written once — no revisited output blocks. (v1 used grid
``(C, T)`` with the running top-k in revisited outputs: exact on hardware
but ~64 ms/probed-cell — the per-step output read-modify-write serialized
the pipeline behind 3 KB DMAs.)

Distances use the direct ``sum_d (q - c)^2`` form on the VPU (d is 4-16;
the MXU's K=128 contraction would be ~94% padding) — which is also exactly
the rerank formula, so this path has none of the norm-expansion
cancellation noise the XLA probe needs a rerank to absorb. Global ids ride
as an extra f32 lane of the coordinate slabs (exact for n < 2^24), halving
the DMA count; the i32 output indices are cast on the way out.

Outputs match the XLA probe contract: ``(dists [C*cap, kw], idx [C*cap,
kw])`` in bucket-slot order, +inf rows for empty slots (empty slots carry
``_FAR`` coordinates, so their pair distances overflow to +inf and
self-exclude).

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
    q_ref,  # [1, cap, d+1] query slab: coords + id lane (cell i)
    *refs,  # T x [1, d+1, capc] transposed candidate slabs, then 2 outputs
    kw: int,
    d: int,
    t: int,
    loop: bool,
):
    cand_refs, (dists_ref, idx_ref) = refs[:t], refs[t:]
    cap = q_ref.shape[1]
    capc = cand_refs[0].shape[2]

    qid = q_ref[0, :, d : d + 1]  # [cap, 1] f32 ids
    tiles_d = []
    tiles_i = []
    for ct_ref in cand_refs:
        dd = jnp.zeros((cap, capc), dtype=jnp.float32)
        for dim in range(d):
            diff = q_ref[0, :, dim : dim + 1] - ct_ref[0, dim : dim + 1, :]
            dd = dd + diff * diff
        cid = jnp.broadcast_to(ct_ref[0, d : d + 1, :], (cap, capc))
        if not loop:
            dd = jnp.where(cid == qid, jnp.inf, dd)
        tiles_d.append(dd)
        tiles_i.append(cid)

    all_d = jnp.concatenate(tiles_d, axis=1)  # [cap, T*capc]
    all_i = jnp.concatenate(tiles_i, axis=1)
    width = all_d.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (cap, kw), 1)

    # one top-kw selection per cell: kw rounds of row-min + first-position
    # pick (Mosaic has no sort primitive)
    def select(j, carry):
        all_d_c, new_d, new_i = carry
        row_min = jnp.min(all_d_c, axis=1, keepdims=True)
        is_min = all_d_c == row_min
        first_min = jnp.min(
            jnp.where(is_min, pos, width), axis=1, keepdims=True
        )
        sel = pos == first_min
        min_i = jnp.max(jnp.where(sel, all_i, 0.0), axis=1)
        write = out_pos == j
        new_d = jnp.where(write, row_min, new_d)
        new_i = jnp.where(write, min_i[:, None], new_i)
        all_d_c = jnp.where(sel, jnp.inf, all_d_c)
        return all_d_c, new_d, new_i

    init = (
        all_d,
        jnp.full((cap, kw), jnp.inf, dtype=jnp.float32),
        jnp.zeros((cap, kw), dtype=jnp.float32),
    )
    _, best_d, best_i = jax.lax.fori_loop(0, kw, select, init)
    dists_ref[0] = best_d
    idx_ref[0] = best_i.astype(jnp.int32)


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

    # ids ride as one extra lane (f32 is exact for ids < 2^24)
    xq = jnp.concatenate(
        [xb, ib.astype(jnp.float32)[:, :, None]], axis=2
    )  # [C, cap, d+1]
    xct = jnp.concatenate(
        [jnp.swapaxes(xc, 1, 2), ic.astype(jnp.float32)[:, None, :]], axis=1
    )  # [C, d+1, capc]

    def cand_spec(tt):
        return pl.BlockSpec(
            (1, d + 1, capc),
            lambda i, nbr_ref, tt=tt: (nbr_ref[i * t + tt], 0, 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, cap, d + 1), lambda i, nbr_ref: (i, 0, 0)),
            *[cand_spec(tt) for tt in range(t)],
        ],
        out_specs=[
            pl.BlockSpec((1, cap, kw), lambda i, nbr_ref: (i, 0, 0)),
            pl.BlockSpec((1, cap, kw), lambda i, nbr_ref: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(_probe_kernel, kw=kw, d=d, t=t, loop=loop)
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
        xq,
        *([xct] * t),
    )
    return dists.reshape(c * cap, kw), idx.reshape(c * cap, kw)
