"""Windowed (banded) exact kNN for full-detector point clouds.

Brute-force pairwise kNN is O(N²·D) — 3 s at 262k hits (BENCH_NOTES r1), far
off the SURVEY's full-detector north star. This module exploits spatial
locality the TPU way, with static shapes throughout:

1. project points onto their top principal axis (power iteration — a unit
   vector, so the projection is 1-Lipschitz: ``|key_i - key_j| <= |x_i-x_j|``);
2. sort by key; queries then only need candidate blocks in a diagonal *band*
   of the sorted order — the Pallas kernel streams ``2R+1`` candidate blocks
   per query block instead of all ``N/C`` (compute drops ``N/C / (2R+1)``×);
3. **exactness check**: a query's k-th neighbor distance ``r`` certifies the
   band iff the band's key span covers ``[key_q - r, key_q + r]`` (Lipschitz
   bound) — anything closer than the k-th hit must live inside the band;
4. queries that fail the check (a fixed-capacity set) get one brute-force
   pass over all points; with the cap at a few % of N this is exact for
   realistic hit distributions, and :func:`windowed_knn` reports the
   violation count so callers can assert / re-run wider.

Reference replaced: torch_cluster ``knn`` used by
``models/graph_construction.py:222-237`` (reference repo) — which is exact
but was never run at full-detector scale there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gnn_tracking_tpu.ops.pallas.fused_relational import _resolve_interpret


def principal_axis(x: jax.Array, iters: int = 12) -> jax.Array:
    """Top principal direction via power iteration (unit vector, [D])."""
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    d = x.shape[1]
    v = jnp.full((d,), 1.0 / jnp.sqrt(d), dtype=jnp.float32)

    def body(_, v):
        v = xc.T @ (xc @ v)
        return v / (jnp.linalg.norm(v) + 1e-30)

    return jax.lax.fori_loop(0, iters, body, v)


def _banded_topk_kernel(
    q_ref,  # [B, D] query block (sorted order)
    c_ref,  # [C, D] candidate block (banded index map)
    qvalid_ref,  # [B, 1]
    dists_ref,  # [B, k] revisited
    idx_ref,  # [B, k] revisited
    *,
    k: int,
    block_q: int,
    block_c: int,
    n_total: int,
    n_cblocks: int,
    radius: int,
    loop: bool,
):
    b = q_ref.shape[0]
    j = pl.program_id(1)
    i = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        dists_ref[:] = jnp.full((b, k), jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros((b, k), dtype=jnp.int32)

    # the candidate block this step actually loaded (same clamp as index_map)
    qc = i * block_q // block_c
    raw = qc + j - radius
    cb = jnp.clip(raw, 0, n_cblocks - 1)

    # clamped steps revisit an edge block — process only the genuine one
    @pl.when(raw == cb)
    def _merge():
        q = q_ref[:]
        q_norm = jnp.sum(q * q, axis=1, keepdims=True)
        row_ids = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        cand = c_ref[:]
        c_norm = jnp.sum(cand * cand, axis=1)[None, :]
        d = q_norm + c_norm - 2.0 * jnp.dot(
            q, cand.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(d, 0.0)
        start = cb * block_c
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
            first_min = jnp.min(
                jnp.where(is_min, pos, width), axis=1, keepdims=True
            )
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
    static_argnames=("k", "radius", "block_q", "block_c", "loop", "interpret"),
)
def banded_topk_sorted(
    x_sorted: jax.Array,
    *,
    k: int,
    radius: int,
    valid: jax.Array,
    block_q: int = 256,
    block_c: int = 1024,
    loop: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Running top-k over the ``±radius`` candidate-block band of an already
    key-sorted point array. Returns (dists_sq, idx) in sorted indexing."""
    n, d = x_sorted.shape
    x = jnp.where(valid[:, None], x_sorted, 1e30).astype(jnp.float32)
    n_pad = -(-n // block_q) * block_q
    n_pad_c = -(-n_pad // block_c) * block_c
    x_p = jnp.pad(x, ((0, n_pad_c - n), (0, 0)), constant_values=1e30)
    qvalid = jnp.pad(valid.astype(jnp.float32), (0, n_pad_c - n))[:, None]
    n_cblocks = n_pad_c // block_c

    def cand_map(i, j):
        return (
            jnp.clip(i * block_q // block_c + j - radius, 0, n_cblocks - 1),
            0,
        )

    kernel = functools.partial(
        _banded_topk_kernel,
        k=k,
        block_q=block_q,
        block_c=block_c,
        n_total=n,
        n_cblocks=n_cblocks,
        radius=radius,
        loop=loop,
    )
    dists, idx = pl.pallas_call(
        kernel,
        grid=(n_pad // block_q, 2 * radius + 1),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), cand_map),
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "radius", "block_q", "block_c", "loop", "fallback_cap", "interpret"
    ),
)
def windowed_knn(
    x: jax.Array,
    *,
    k: int,
    radius: int = 4,
    node_mask: jax.Array | None = None,
    block_q: int = 256,
    block_c: int = 1024,
    loop: bool = False,
    fallback_cap: int = 4096,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact kNN via principal-axis band + certified fallback.

    Returns ``(dists_sq [N,k], idx [N,k], n_uncertified [])`` in the input's
    original indexing. ``n_uncertified`` counts queries whose band result
    could not be certified exact *after* the fallback pass (0 for realistic
    point clouds when ``fallback_cap`` is generous; callers needing a hard
    guarantee assert it's 0 and re-run with a larger ``radius``/cap —
    see :func:`gnn_tracking_tpu.ops.knn.knn_graph_windowed`).
    """
    interpret = _resolve_interpret(interpret)
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    xf = x.astype(jnp.float32)
    v = principal_axis(jnp.where(node_mask[:, None], xf, 0.0))
    key = xf @ v
    # invalid points sort to the end (and are never valid candidates)
    key = jnp.where(node_mask, key, jnp.inf)
    order = jnp.argsort(key)
    inv_order = jnp.argsort(order)
    xs = xf[order]
    keys_s = key[order]
    valid_s = node_mask[order]

    dists, idx = banded_topk_sorted(
        xs, k=k, radius=radius, valid=valid_s,
        block_q=block_q, block_c=block_c, loop=loop, interpret=interpret,
    )

    # --- certification (all in sorted indexing) ---
    n_pad = -(-n // block_q) * block_q
    n_cblocks = -(-n_pad // block_c)
    qblock = jnp.arange(n) // block_q
    cb_lo = jnp.clip(qblock * block_q // block_c - radius, 0, n_cblocks - 1)
    cb_hi = jnp.clip(qblock * block_q // block_c + radius, 0, n_cblocks - 1)
    lo_idx = cb_lo * block_c  # first sorted point in the band
    hi_idx = jnp.minimum((cb_hi + 1) * block_c, n) - 1  # last
    kth = jnp.sqrt(jnp.max(jnp.where(jnp.isfinite(dists), dists, 0.0), axis=1))
    found_all = jnp.all(jnp.isfinite(dists), axis=1)
    key_q = keys_s[: n]
    covered_lo = (lo_idx == 0) | (key_q - kth >= keys_s[lo_idx])
    covered_hi = (hi_idx >= n - 1) | (key_q + kth <= keys_s[hi_idx])
    certified = (covered_lo & covered_hi & found_all) | ~valid_s[:n]

    # --- fallback: brute-force the (capped) uncertified set ---
    fallback_cap = min(fallback_cap, n)
    viol_score = jnp.where(certified, 0.0, 1.0)
    _, viol_idx = jax.lax.top_k(viol_score, fallback_cap)  # sorted-index ids
    fb_x = xs[viol_idx]
    # candidates = all points; queries = violators. Reuse the streaming kernel
    # with queries stacked in front of the candidate set.
    fb_d, fb_i = _fallback_brute(
        fb_x, xs, valid_s, k=k, block_c=block_c, loop=loop,
        self_ids=viol_idx, interpret=interpret,
    )
    take_fb = ~certified[viol_idx]
    dists = dists.at[viol_idx].set(
        jnp.where(take_fb[:, None], fb_d, dists[viol_idx])
    )
    idx = idx.at[viol_idx].set(jnp.where(take_fb[:, None], fb_i, idx[viol_idx]))
    n_uncert = jnp.sum(~certified) - jnp.sum(take_fb)

    # --- back to original indexing ---
    dists_o = dists[inv_order]
    idx_o = jnp.where(idx >= 0, order[jnp.clip(idx, 0, n - 1)], 0)[inv_order]
    return dists_o, idx_o, n_uncert


def _fallback_brute(q, cands, cand_valid, *, k, block_c, loop, self_ids, interpret):
    """[V, k] exact top-k of q against all cands (sorted indexing)."""
    vq, d = q.shape
    n = cands.shape[0]
    c = jnp.where(cand_valid[:, None], cands, 1e30)
    n_pad_c = -(-n // block_c) * block_c
    c_p = jnp.pad(c, ((0, n_pad_c - n), (0, 0)), constant_values=1e30)
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)

    def body(start, carry):
        best_d, best_i = carry
        cand = jax.lax.dynamic_slice(c_p, (start * block_c, 0), (block_c, d))
        c_norm = jnp.sum(cand * cand, axis=1)[None, :]
        dd = q_norm + c_norm - 2.0 * jnp.dot(
            q, cand.T, precision=jax.lax.Precision.HIGHEST
        )
        dd = jnp.maximum(dd, 0.0)
        col = (start * block_c + jnp.arange(block_c, dtype=jnp.int32)[None, :]).astype(
            jnp.int32
        )
        invalid = col >= n
        if not loop:
            invalid = invalid | (col == self_ids[:, None].astype(jnp.int32))
        dd = jnp.where(invalid, jnp.inf, dd)
        all_d = jnp.concatenate([best_d, dd], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(col, dd.shape)], axis=1)
        neg_d, sel = jax.lax.top_k(-all_d, k)
        return -neg_d, jnp.take_along_axis(all_i, sel, axis=1)

    init = (
        jnp.full((vq, k), jnp.inf, jnp.float32),
        jnp.zeros((vq, k), jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, n_pad_c // block_c, body, init)
    return best_d, best_i
