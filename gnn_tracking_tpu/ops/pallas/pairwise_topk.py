"""Pallas TPU kernel: blocked pairwise distances with running top-k.

The kNN/radius-graph builder is the hot op of learned graph construction
(SURVEY §2.9: replaces torch_cluster's C++/CUDA kNN). The XLA path
(``ops/knn.py``) materializes a [B, N] distance block in HBM-visible buffers
and calls ``lax.top_k`` over the full row; this kernel instead keeps a
[B, k] running top-k in VMEM while streaming candidate blocks through the
MXU, so HBM traffic is O(N·k) instead of O(N²/block).

Grid: (query blocks,). Each program:
  1. loads its query block [B, D] into VMEM;
  2. loops over candidate blocks [C, D]: distance tile [B, C] via the MXU
     expansion; merges into the running [B, k] best distances/indices with a
     sort-free "worst-replacement" update per candidate column.

The merge uses an O(C·k) insertion pass expressed with vectorized compares
(k is small, 4-64). For simplicity and correctness-first, this round merges
via jnp.sort over the concatenated [B, k + C] tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pairwise_topk_kernel(
    x_ref,  # [N, D] all points (VMEM)
    cbatch_ref,  # [N, 1] candidate batch ids (VMEM)
    q_ref,  # [B, D] query block (VMEM)
    qvalid_ref,  # [B, 1] query validity (VMEM)
    qbatch_ref,  # [B, 1] query batch ids (VMEM)
    dists_ref,  # [B, k] output distances
    idx_ref,  # [B, k] output indices
    *,
    k: int,
    block_c: int,
    n_total: int,
    loop: bool,
):
    b = q_ref.shape[0]
    q = q_ref[:]
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)  # [B, 1]
    i_base = pl.program_id(0) * b
    row_ids = i_base + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    n_blocks = pl.cdiv(n_total, block_c)

    def body(c_idx, carry):
        best_d, best_i = carry  # [B, k], [B, k]
        start = c_idx * block_c
        cand = x_ref[pl.ds(start, block_c), :]  # [C, D]
        c_norm = jnp.sum(cand * cand, axis=1)[None, :]  # [1, C]
        d = q_norm + c_norm - 2.0 * jnp.dot(
            q, cand.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(d, 0.0)
        col_ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, block_c), 1)
        invalid = col_ids >= n_total
        if not loop:
            invalid = invalid | (col_ids == row_ids)
        cand_batch = cbatch_ref[pl.ds(start, block_c), 0][None, :]  # [1, C]
        invalid = invalid | (qbatch_ref[:] != cand_batch)
        d = jnp.where(invalid, jnp.inf, d)
        # Sort-free merge (Mosaic has no sort primitive): selection of the k
        # smallest from the [B, k + C] union by k rounds of row-min + mask.
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, col_ids], axis=1)
        width = all_d.shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)

        out_pos = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

        def select(j, carry):
            all_d_c, new_d, new_i = carry
            row_min = jnp.min(all_d_c, axis=1, keepdims=True)  # [B, 1]
            # position of (first) min per row
            is_min = all_d_c == row_min
            first_min = jnp.min(jnp.where(is_min, pos, width), axis=1, keepdims=True)
            sel = pos == first_min
            min_i = jnp.max(jnp.where(sel, all_i, 0), axis=1)  # [B]
            # column-j writes via where (Mosaic has no scatter)
            write = out_pos == j
            new_d = jnp.where(write, row_min, new_d)
            new_i = jnp.where(write, min_i[:, None], new_i)
            all_d_c = jnp.where(sel, jnp.inf, all_d_c)
            return all_d_c, new_d, new_i

        init_sel = (
            all_d,
            jnp.full((b, k), jnp.inf, dtype=jnp.float32),
            jnp.zeros((b, k), dtype=jnp.int32),
        )
        _, new_d, new_i = jax.lax.fori_loop(0, k, select, init_sel)
        return new_d, new_i

    init = (
        jnp.full((b, k), jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, n_blocks, body, init)
    qvalid = qvalid_ref[:] > 0
    dists_ref[:] = jnp.where(qvalid, best_d, jnp.inf)
    idx_ref[:] = jnp.where(qvalid, best_i, 0)


def _pairwise_topk_stream_kernel(
    q_ref,  # [B, D] query block (VMEM)
    c_ref,  # [C, D] candidate block (VMEM, streamed from HBM by Pallas)
    qvalid_ref,  # [B, 1] query validity
    dists_ref,  # [B, k] output distances — revisited across candidate steps
    idx_ref,  # [B, k] output indices — revisited across candidate steps
    *,
    k: int,
    block_c: int,
    n_total: int,
    n_cblocks: int,
    loop: bool,
):
    b = q_ref.shape[0]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dists_ref[:] = jnp.full((b, k), jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros((b, k), dtype=jnp.int32)

    q = q_ref[:]
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)
    i_base = pl.program_id(0) * b
    row_ids = i_base + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    cand = c_ref[:]
    c_norm = jnp.sum(cand * cand, axis=1)[None, :]
    start = j * block_c
    d = q_norm + c_norm - 2.0 * jnp.dot(
        q, cand.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(d, 0.0)
    col_ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, block_c), 1)
    invalid = col_ids >= n_total
    if not loop:
        invalid = invalid | (col_ids == row_ids)
    d = jnp.where(invalid, jnp.inf, d)

    best_d = dists_ref[:]
    best_i = idx_ref[:]
    all_d = jnp.concatenate([best_d, d], axis=1)
    all_i = jnp.concatenate([best_i, col_ids], axis=1)
    width = all_d.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def select(jj, carry):
        all_d_c, new_d, new_i = carry
        row_min = jnp.min(all_d_c, axis=1, keepdims=True)
        is_min = all_d_c == row_min
        first_min = jnp.min(jnp.where(is_min, pos, width), axis=1, keepdims=True)
        sel = pos == first_min
        min_i = jnp.max(jnp.where(sel, all_i, 0), axis=1)
        write = out_pos == jj
        new_d = jnp.where(write, row_min, new_d)
        new_i = jnp.where(write, min_i[:, None], new_i)
        all_d_c = jnp.where(sel, jnp.inf, all_d_c)
        return all_d_c, new_d, new_i

    init_sel = (
        all_d,
        jnp.full((b, k), jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )
    _, new_d, new_i = jax.lax.fori_loop(0, k, select, init_sel)

    qvalid = qvalid_ref[:] > 0
    dists_ref[:] = jnp.where(qvalid, new_d, jnp.inf)
    idx_ref[:] = jnp.where(qvalid, new_i, 0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_c", "loop", "interpret"),
)
def pairwise_topk_streaming(
    x: jax.Array,
    *,
    k: int,
    node_mask: jax.Array | None = None,
    block_q: int = 256,
    block_c: int = 512,
    loop: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """HBM-resident variant of :func:`pairwise_topk` for point sets beyond
    the VMEM budget (full-detector events, ~300k hits).

    Grid (query blocks, candidate blocks), candidate axis innermost: Pallas
    streams candidate blocks from HBM with automatic double-buffering while
    the running [B, k] top-k lives in the revisited output block (standard
    TPU accumulation pattern — full-block static read/modify/write, unlike
    the dynamic-slice RMW that Mosaic miscompiles, see ``csr_segment.py``).
    """
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    x = jnp.where(node_mask[:, None], x, jnp.inf).astype(jnp.float32)
    x = jnp.where(jnp.isfinite(x), x, 1e30)

    n_pad = -(-n // block_q) * block_q
    n_pad_c = -(-n_pad // block_c) * block_c
    x_p = jnp.pad(x, ((0, n_pad_c - n), (0, 0)), constant_values=1e30)
    qvalid = jnp.pad(node_mask.astype(jnp.float32), (0, n_pad_c - n))[:, None]

    n_cblocks = n_pad_c // block_c
    grid = (n_pad // block_q, n_cblocks)
    kernel = functools.partial(
        _pairwise_topk_stream_kernel,
        k=k,
        block_c=block_c,
        n_total=n,
        n_cblocks=n_cblocks,
        loop=loop,
    )
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(x_p[:n_pad], x_p, qvalid[:n_pad])
    return dists[:n], idx[:n]


def _pairwise_topk_filter_kernel(
    x_ref,  # [N, D] all points (VMEM)
    cbatch_ref,  # [N, 1] candidate batch ids (VMEM; -2 = masked node)
    q_ref,  # [B, D] query block (VMEM)
    qbatch_ref,  # [B, 1] query batch ids (VMEM)
    dists_ref,  # [B, k] output distances (ascending)
    idx_ref,  # [B, k] output indices
    *,
    k: int,
    block_c: int,
    n_total: int,
    loop: bool,
    radius2: float | None = None,
):
    """Survivor-filtered running top-k (round-3 battery: the k-round merge
    of ``_pairwise_topk_kernel`` pays ~6·k VPU passes over EVERY candidate
    tile — 64·k·6 passes at bench scale — although the expected number of
    candidates that ever IMPROVE the running set is only ~k·ln(N/k)
    ("record values" of a random sequence). This kernel keeps the running
    top-k SORTED ascending so the k-th column is a live threshold τ, and per
    tile extracts only candidates with d < τ, one per improving row per
    iteration of a data-dependent while loop (~4 passes each). Tile 0 is
    peeled and initialized with the k-round select (τ = inf would make the
    filter degenerate there). Average-case ~5-6x fewer VPU passes; the
    worst case (points pre-sorted so every candidate improves, e.g. a
    monotone sweep toward each query) degrades to one extraction per
    candidate — callers with adversarially ordered inputs should keep the
    flat kernel.

    ``radius2`` mode (fixed-radius graphs, SURVEY §2.9 radius_graph /
    rg-condensation): the threshold τ does not need to be ESTABLISHED from
    the data — it starts at the query radius, so the tile-0 peel is skipped
    entirely and only in-radius candidates are ever extracted (for a
    condensed latent that is ~cap·n_within/N per tile, far below the top-k
    record-value rate). The running set is initialized to the sentinel
    ``nextafter(radius2)`` with index -1: a strict ``d < τ`` compare then
    implements the INCLUSIVE ``d² <= r²`` contract of ``radius_graph``
    exactly, and sentinel slots are mapped to (+inf, 0) on write-out."""
    b = q_ref.shape[0]
    q = q_ref[:]
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)  # [B, 1]
    i_base = pl.program_id(0) * b
    row_ids = i_base + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    qbatch = qbatch_ref[:]

    n_blocks = pl.cdiv(n_total, block_c)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, block_c), 1)
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def tile_dists(c_idx):
        start = c_idx * block_c
        cand = x_ref[pl.ds(start, block_c), :]  # [C, D]
        c_norm = jnp.sum(cand * cand, axis=1)[None, :]  # [1, C]
        d = q_norm + c_norm - 2.0 * jnp.dot(
            q, cand.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(d, 0.0)
        col_ids = start + pos
        invalid = col_ids >= n_total
        if not loop:
            invalid = invalid | (col_ids == row_ids)
        cand_batch = cbatch_ref[pl.ds(start, block_c), 0][None, :]  # [1, C]
        invalid = invalid | (qbatch != cand_batch)
        return jnp.where(invalid, jnp.inf, d), start

    if radius2 is not None:
        # Fixed-τ radius mode: no peel, sentinel-initialized running set.
        sentinel = float(np.nextafter(np.float32(radius2), np.float32(np.inf)))
        best_d = jnp.full((b, k), sentinel, dtype=jnp.float32)
        best_i = jnp.full((b, k), -1, dtype=jnp.int32)
        first_tile = 0
    else:
        # --- tile 0 peel: k-round select builds the initial SORTED top-k ---
        d0, start0 = tile_dists(0)

        def select0(j, carry):
            d_c, best_d, best_i = carry
            row_min = jnp.min(d_c, axis=1, keepdims=True)  # [B, 1]
            first_min = jnp.min(
                jnp.where(d_c == row_min, pos, block_c), axis=1, keepdims=True
            )
            write = out_pos == j
            best_d = jnp.where(write, row_min, best_d)
            best_i = jnp.where(write, start0 + first_min, best_i)
            d_c = jnp.where(pos == first_min, jnp.inf, d_c)
            return d_c, best_d, best_i

        _, best_d, best_i = jax.lax.fori_loop(
            0,
            k,
            select0,
            (
                d0,
                jnp.full((b, k), jnp.inf, dtype=jnp.float32),
                jnp.zeros((b, k), dtype=jnp.int32),
            ),
        )
        first_tile = 1

    # --- remaining tiles: filter against τ, extract survivors only ---
    def tile_body(c_idx, carry):
        best_d, best_i = carry
        d_c, start = tile_dists(c_idx)
        row_min = jnp.min(d_c, axis=1, keepdims=True)  # [B, 1]

        def cond(state):
            _, row_min_c, best_d_c, _ = state
            return jnp.any(row_min_c < best_d_c[:, k - 1 : k])

        def extract(state):
            d_c, row_min_c, best_d_c, best_i_c = state
            tau = best_d_c[:, k - 1 : k]
            improving = row_min_c < tau  # [B, 1]
            first_min = jnp.min(
                jnp.where(d_c == row_min_c, pos, block_c),
                axis=1,
                keepdims=True,
            )
            min_i = start + first_min  # [B, 1]
            # insert (row_min, min_i) into the sorted running set
            ins = jnp.sum(
                (best_d_c <= row_min_c).astype(jnp.int32),
                axis=1,
                keepdims=True,
            )
            shift_d = jnp.concatenate(
                [best_d_c[:, :1], best_d_c[:, : k - 1]], axis=1
            )
            shift_i = jnp.concatenate(
                [best_i_c[:, :1], best_i_c[:, : k - 1]], axis=1
            )
            nd = jnp.where(
                out_pos < ins,
                best_d_c,
                jnp.where(out_pos == ins, row_min_c, shift_d),
            )
            ni = jnp.where(
                out_pos < ins,
                best_i_c,
                jnp.where(out_pos == ins, min_i, shift_i),
            )
            best_d_c = jnp.where(improving, nd, best_d_c)
            best_i_c = jnp.where(improving, ni, best_i_c)
            # retire the extracted candidate; recompute the row minimum
            d_c = jnp.where((pos == first_min) & improving, jnp.inf, d_c)
            row_min_c = jnp.min(d_c, axis=1, keepdims=True)
            return d_c, row_min_c, best_d_c, best_i_c

        _, _, best_d, best_i = jax.lax.while_loop(
            cond, extract, (d_c, row_min, best_d, best_i)
        )
        return best_d, best_i

    best_d, best_i = jax.lax.fori_loop(
        first_tile, n_blocks, tile_body, (best_d, best_i)
    )
    if radius2 is not None:
        unfilled = best_i < 0
        best_d = jnp.where(unfilled, jnp.inf, best_d)
        best_i = jnp.where(unfilled, 0, best_i)
    # Masked QUERIES still report their top-k among valid candidates
    # (matching _blocked_neighbor_topk, which zero-substitutes masked coords;
    # knn_graph drops masked-query edges at the edge level).
    dists_ref[:] = best_d
    idx_ref[:] = best_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_c", "loop", "interpret", "radius2"),
)
def pairwise_topk_filter(
    x: jax.Array,
    *,
    k: int,
    node_mask: jax.Array | None = None,
    batch: jax.Array | None = None,
    block_q: int = 256,
    block_c: int = 512,
    loop: bool = False,
    interpret: bool = False,
    radius2: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Survivor-filtered variant of :func:`pairwise_topk` (distances come
    back sorted ascending). Matches ``_blocked_neighbor_topk`` exactly,
    including for masked queries (coords zero-substituted, neighbors still
    reported); masked CANDIDATES are excluded via a -2 sentinel batch id.
    See :func:`_pairwise_topk_filter_kernel` for the algorithm and the
    average/worst-case tradeoff."""
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    x = jnp.where(node_mask[:, None], x, 0.0).astype(jnp.float32)

    n_pad = -(-n // block_q) * block_q
    n_pad_c = -(-n_pad // block_c) * block_c
    x_p = jnp.pad(x, ((0, n_pad_c - n), (0, 0)), constant_values=1e30)
    cbatch = jnp.where(node_mask, batch.astype(jnp.int32), -2)
    cbatch_p = jnp.pad(cbatch, (0, n_pad_c - n), constant_values=-1)[:, None]
    batch_p = jnp.pad(
        batch.astype(jnp.int32), (0, n_pad_c - n), constant_values=-1
    )[:, None]

    grid = (n_pad // block_q,)
    kernel = functools.partial(
        _pairwise_topk_filter_kernel,
        k=k,
        block_c=block_c,
        n_total=n,
        loop=loop,
        radius2=radius2,
    )
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda i: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(x_p, cbatch_p, x_p[:n_pad], batch_p[:n_pad])
    return dists[:n], idx[:n]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_q", "block_c", "loop", "interpret"),
)
def pairwise_topk(
    x: jax.Array,
    *,
    k: int,
    node_mask: jax.Array | None = None,
    batch: jax.Array | None = None,
    block_q: int = 256,
    block_c: int = 512,
    loop: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """For every point, squared distances + indices of its k nearest valid
    neighbors (restricted to the same ``batch`` id when given). Returns
    (``dists_sq [N, k]``, ``idx [N, k]``); invalid entries are +inf. Pallas
    analog of ``ops.knn._blocked_neighbor_topk``.
    """
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    x = jnp.where(node_mask[:, None], x, jnp.inf).astype(jnp.float32)
    # masked points at +inf are never selected; restore zeros for the MXU
    x = jnp.where(jnp.isfinite(x), x, 1e30)

    n_pad = -(-n // block_q) * block_q
    n_pad_c = -(-n_pad // block_c) * block_c
    x_p = jnp.pad(x, ((0, n_pad_c - n), (0, 0)), constant_values=1e30)
    qvalid = jnp.pad(node_mask.astype(jnp.float32), (0, n_pad_c - n))[:, None]
    # padded candidates get batch -1: never equal to any query's batch
    batch_p = jnp.pad(
        batch.astype(jnp.int32), (0, n_pad_c - n), constant_values=-1
    )[:, None]

    grid = (n_pad // block_q,)
    kernel = functools.partial(
        _pairwise_topk_kernel,
        k=k,
        block_c=block_c,
        n_total=n,
        loop=loop,
    )
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full candidate array resident in VMEM (fits for <=100k hits of
            # low-dim embeddings; larger inputs should fall back to ops.knn)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda i: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(x_p, batch_p, x_p[:n_pad], qvalid[:n_pad], batch_p[:n_pad])
    return dists[:n], idx[:n]
