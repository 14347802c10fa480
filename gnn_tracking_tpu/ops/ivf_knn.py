"""IVF-certified exact kNN for full-detector point clouds.

Brute-force pairwise kNN is O(N²·D) (3-4 s at 262k hits on a v5e); the
principal-axis *banded* variant (``ops/pallas/windowed_topk.py``) collapses
on clustered latent clouds — a learned condensation embedding concentrates
tracks into tight clusters whose 1-D key span is far wider than any
affordable band, so ~70% of queries fail certification (round-2 hardware
battery). This module is the TPU-native answer at scale, shaped like a
classic IVF-Flat index but **exact**:

1. **coarse quantization** — k-means cells (a few Lloyd sweeps; assignment
   is an ``[N, C]`` distance matmul on the MXU, update a ``segment_sum``);
2. **bucketing** — points sorted by cell into a static ``[C, cap, D]``
   table; over-cap spill goes to a global *extra* set every query also
   scans, so candidate coverage stays complete;
3. **probe** — each query scans the ``T`` cells nearest its own cell
   (batched ``[cap, T·cap]`` distance matmuls + ``top_k``);
4. **certification** — triangle inequality: with ``r`` the query's k-th
   candidate distance, any unvisited cell ``j`` satisfies
   ``min_p |q - p| >= |q - c_j| - rad_j``; a query is certified exact iff
   ``r`` beats that bound for every unvisited cell (one more ``[N, C]``
   matmul);
5. **fallback** — the (capped) uncertified set gets one brute-force pass;
   the returned ``n_uncert`` counts queries still unproven (0 in practice;
   the host wrapper retries with wider caps for a hard guarantee).

All shapes static, everything jittable; distance matmuls run at
``Precision.HIGHEST`` so certification margins are not eaten by the MXU's
default bf16 operand truncation.

Reference replaced: torch_cluster ``knn`` (reference
``models/graph_construction.py:222-237``) — exact, but never run at
full-detector scale there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST
_FAR = 1e30


def _merge_sorted_pairs(da, ia, db, ib, k_out):
    """Merge two row-wise ASCENDING-sorted (dist, idx) lists into the
    k_out smallest, two-pointer style (k_out unrolled steps of
    take_along_axis + compare). Replaces ``top_k(-concat(...))`` whose
    variadic sort costs ~89 ms at [262k, 32] on hardware (r3 battery
    ivfglue micro) — this runs in O(N * k_out) elementwise work.
    Stable: ties prefer the ``a`` side."""
    n = da.shape[0]
    ai = jnp.zeros((n, 1), jnp.int32)
    bi = jnp.zeros((n, 1), jnp.int32)
    out_d, out_i = [], []
    for _ in range(k_out):
        av = jnp.take_along_axis(da, jnp.minimum(ai, da.shape[1] - 1), axis=1)
        bv = jnp.take_along_axis(db, jnp.minimum(bi, db.shape[1] - 1), axis=1)
        av = jnp.where(ai >= da.shape[1], jnp.inf, av)
        bv = jnp.where(bi >= db.shape[1], jnp.inf, bv)
        take_a = av <= bv
        out_d.append(jnp.where(take_a, av, bv))
        out_i.append(
            jnp.where(
                take_a,
                jnp.take_along_axis(ia, jnp.minimum(ai, ia.shape[1] - 1), axis=1),
                jnp.take_along_axis(ib, jnp.minimum(bi, ib.shape[1] - 1), axis=1),
            )
        )
        ai = ai + take_a.astype(jnp.int32)
        bi = bi + (~take_a).astype(jnp.int32)
    return (
        jnp.concatenate(out_d, axis=1),
        jnp.concatenate(out_i, axis=1),
    )


def _pdist2(q, c, precision=_HIGH):
    """Squared distances [Q, C] with f32/HIGHEST matmul (exactness path)."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    cn = jnp.sum(c * c, axis=-1)[None, :]
    d = qn + cn - 2.0 * jnp.dot(q, c.T, precision=precision)
    return jnp.maximum(d, 0.0)


def _assign_blocks(x, centroids, block_n, precision=_HIGH):
    """Nearest-centroid id and distance per point, blockwise over N.

    ``precision`` may safely be DEFAULT (single bf16 MXU pass, ~6x fewer
    tile passes than HIGHEST): cell *assignment* is a clustering choice,
    not a correctness condition — the radius, the probe and the
    certification bound are all computed from whatever assignment comes
    out, so exactness of the final kNN is unaffected (only cell
    shape/balance can drift slightly).
    """
    n = x.shape[0]
    xp = jnp.pad(x, ((0, (-n) % block_n), (0, 0)), constant_values=_FAR)

    def one(q):
        d = _pdist2(q, centroids, precision=precision)
        a = jnp.argmin(d, axis=1).astype(jnp.int32)
        return a, jnp.min(d, axis=1)

    a, d = jax.lax.map(one, xp.reshape(-1, block_n, x.shape[1]))
    return a.reshape(-1)[:n], d.reshape(-1)[:n]


def _principal_order(x, valid):
    from gnn_tracking_tpu.ops.pallas.windowed_topk import principal_axis

    key = jnp.where(valid, x @ principal_axis(jnp.where(valid[:, None], x, 0.0)),
                    jnp.inf)
    return jnp.argsort(key)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "loop", "n_cells", "cell_cap", "n_probe", "extra_cap",
        "fallback_cap", "lloyd_iters", "block_n", "group_cells",
        "certify", "fallback", "spill_passes", "probe_impl", "cand_cap",
        "fast_assign", "bucket_impl", "return_stats",
    ),
)
def ivf_knn(
    x: jax.Array,
    *,
    k: int,
    node_mask: jax.Array | None = None,
    loop: bool = False,
    n_cells: int | None = None,
    cell_cap: int | None = None,
    n_probe: int = 8,
    extra_cap: int = 8192,
    fallback_cap: int = 8192,
    lloyd_iters: int = 2,
    block_n: int = 4096,
    group_cells: int = 32,
    certify: bool = True,
    fallback: bool = True,
    spill_passes: bool = True,
    probe_impl: str | None = None,
    cand_cap: int | None = None,
    fast_assign: bool = True,
    bucket_impl: str = "gather",
    return_stats: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact kNN via certified IVF probing.

    Returns ``(dists_sq [N, k], idx [N, k], n_uncertified [])`` in the
    input's original indexing. Infinite distances mark missing neighbors.
    ``n_uncertified`` is 0 when every query is *proven* exact; callers
    needing the hard guarantee assert it (see
    :func:`gnn_tracking_tpu.ops.knn.knn_graph_ivf`).
    """
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    xf = jnp.where(node_mask[:, None], x.astype(jnp.float32), 0.0)
    # center the cloud: the ``qn + cn - 2qc`` expansion cancels norm-scale
    # terms to produce distance-scale results, so any global offset eats
    # f32 mantissa bits (observed: 4e-5 absolute noise on 0.01 distances
    # at coordinate norms ~200 -> near-tie neighbor swaps)
    w = node_mask.astype(jnp.float32)
    mean = jnp.sum(xf * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    xf = jnp.where(node_mask[:, None], xf - mean[None, :], _FAR)

    if n_cells is None:
        # cells must be FINER than the data's cluster granularity or the
        # certification radius blows up: a cell spanning two latent
        # clusters has rad ~ inter-cluster distance and poisons the
        # triangle bound for every query it neighbors (round-2 hardware
        # battery: n//128 cells -> 77k/262k uncertified). n//32 keeps
        # cells at fragment scale; 8192 caps the [C, C] centroid table.
        n_cells = max(8, min(8192, n // 32))
    if cell_cap is None:
        cell_cap = max(8, (3 * n) // n_cells)
    n_probe = min(n_probe, n_cells)
    fallback_cap = min(fallback_cap, n)
    extra_cap = min(extra_cap, n)
    if probe_impl is None:
        # the Pallas probe (ops/pallas/ivf_probe.py) is ~12x faster per
        # probed cell on hardware (battery #16) and exact; off-TPU it runs
        # in interpret mode, so tests keep covering it
        probe_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if probe_impl not in ("pallas", "xla"):
        raise ValueError(f"probe_impl must be 'pallas' or 'xla', got {probe_impl!r}")
    if bucket_impl not in ("gather", "scatter"):
        raise ValueError(
            f"bucket_impl must be 'gather' or 'scatter', got {bucket_impl!r}"
        )
    if spill_passes not in (True, False, "probe", "extra"):
        raise ValueError(
            "spill_passes must be True, False, 'probe' or 'extra', "
            f"got {spill_passes!r}"
        )
    if cand_cap is None:
        # a wider CANDIDATE table costs the Pallas probe almost nothing
        # and lets the all-queries extra-set scan + full rerank be skipped
        # whenever the widened table swallows every residual. Battery #25
        # (262k clustered): cand_cap=1.5x cell_cap left n_resid=166 ->
        # extra pass + full rerank ran (711 ms); 8/3x (=256 at cap 96)
        # swallowed everything -> 369 ms, certified exact, 0/512 oracle
        # misses.
        cand_cap = cell_cap * 8 // 3 if probe_impl == "pallas" else cell_cap
    cand_cap = max(cand_cap, cell_cap)
    # candidate width: carry k+8 candidates through every merge, then
    # re-rank with the direct (q-p)^2 formula at the end — the norm
    # expansion's f32 cancellation noise (~1e-3 relative on clustered
    # clouds) only has to keep the true kNN inside the top k+8, not rank
    # them exactly
    kw = k + 8

    # --- 1. coarse quantization -------------------------------------------
    order0 = _principal_order(xf, node_mask)
    stride = max(1, n // n_cells)
    seeds = order0[(jnp.arange(n_cells) * stride) % n]
    centroids = xf[seeds]

    assign_prec = (
        jax.lax.Precision.DEFAULT if fast_assign else _HIGH
    )

    def lloyd(centroids, _):
        a, _ = _assign_blocks(xf, centroids, block_n, precision=assign_prec)
        w = node_mask.astype(jnp.float32)
        sums = jax.ops.segment_sum(xf * w[:, None], a, num_segments=n_cells)
        cnts = jax.ops.segment_sum(w, a, num_segments=n_cells)
        new = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None],
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(lloyd, centroids, None, length=lloyd_iters)
    assign, _ = _assign_blocks(xf, centroids, block_n, precision=assign_prec)
    assign = jnp.where(node_mask, assign, n_cells - 1)

    # cell radius over ALL assigned valid points (incl. over-cap spill)
    dist_own = jnp.sqrt(
        jnp.maximum(jnp.sum((xf - centroids[assign]) ** 2, axis=1), 0.0)
    )
    rad = jax.ops.segment_max(
        jnp.where(node_mask, dist_own, 0.0), assign, num_segments=n_cells
    )

    # --- 2. bucketing ------------------------------------------------------
    order = jnp.argsort(assign)
    sa = assign[order]
    first = jnp.searchsorted(sa, jnp.arange(n_cells, dtype=sa.dtype))
    rank = jnp.arange(n, dtype=jnp.int32) - first[sa].astype(jnp.int32)
    in_bucket = (rank < cell_cap) & node_mask[order]

    def build_table(cap):
        """[C*cap] slab tables (coords / global ids / validity)."""
        if bucket_impl == "gather":
            # gather formulation: slot (c, r) reads the sorted stream at
            # first[c] + r — no scatters, every output written exactly once
            cnt = (
                jnp.append(first, jnp.int32(n))[1:] - first
            ).astype(jnp.int32)
            r = jnp.arange(cap, dtype=jnp.int32)[None, :]
            pos = first.astype(jnp.int32)[:, None] + r
            take = order[jnp.clip(pos, 0, n - 1)]
            valid = (r < cnt[:, None]) & node_mask[take]
            xt = jnp.where(valid[..., None], xf[take], _FAR).reshape(-1, d)
            it = jnp.where(valid, take, 0).astype(jnp.int32).reshape(-1)
            return xt, it, valid.reshape(-1)
        in_b = (rank < cap) & node_mask[order]
        # out-of-bucket entries aim out of range: a default slot of 0 would
        # let their scatter writes clobber the real slot-0 contents
        # (mode="drop")
        slot_b = jnp.where(
            in_b, sa.astype(jnp.int32) * cap + rank, n_cells * cap
        )
        xt = jnp.full((n_cells * cap, d), _FAR, jnp.float32)
        xt = xt.at[slot_b].set(xf[order], mode="drop")
        it = jnp.zeros((n_cells * cap,), jnp.int32)
        it = it.at[slot_b].set(order.astype(jnp.int32), mode="drop")
        vt = jnp.zeros((n_cells * cap,), bool).at[slot_b].set(
            in_b, mode="drop"
        )
        return xt, it, vt

    xb, ib, vb = build_table(cell_cap)

    # candidate table: same layout, wider cap (cand_cap >= cell_cap). The
    # probes scan these slabs, so visited cells are covered up to cand_cap
    # without the all-queries extra pass.
    if cand_cap == cell_cap:
        xcb, icb, vcb = xb, ib, vb
    else:
        xcb, icb, vcb = build_table(cand_cap)

    # Two over-cap sets, and they must NOT be conflated (round-2 battery
    # #18 + CPU repro: conflating them returned DUPLICATE neighbor ids):
    #
    # * spill (rank >= cell_cap): points absent from the QUERY buckets —
    #   they need their own probe pass below (``spill_probe``);
    # * resid (rank >= cand_cap): points absent from the CANDIDATE slabs —
    #   they must be merged into every query via ``extra_pass``.
    #
    # With a widened candidate table (cand_cap > cell_cap) the sets
    # differ: ranks in [cell_cap, cand_cap) are already candidates in
    # their cell's slab, so putting them in the extra set too makes the
    # concat+top_k merges count the same point twice — each duplicate
    # evicts a true neighbor, and certification cannot catch it (the k-th
    # distance only shrinks). The extra CANDIDATE set is therefore the
    # residual only.
    spill = (~in_bucket) & node_mask[order]
    n_spill = jnp.sum(spill)
    resid = (rank >= cand_cap) & node_mask[order]
    n_resid = jnp.sum(resid)
    spill_pos = jnp.nonzero(spill, size=extra_cap, fill_value=0)[0]
    spill_valid = jnp.arange(extra_cap) < n_spill
    spill_ids = order[spill_pos].astype(jnp.int32)
    x_spill = jnp.where(spill_valid[:, None], xf[spill_ids], _FAR)
    if cand_cap == cell_cap:
        resid_pos, resid_valid = spill_pos, spill_valid
        resid_ids, x_resid = spill_ids, x_spill
    else:
        resid_pos = jnp.nonzero(resid, size=extra_cap, fill_value=0)[0]
        resid_valid = jnp.arange(extra_cap) < n_resid
        resid_ids = order[resid_pos].astype(jnp.int32)
        x_resid = jnp.where(resid_valid[:, None], xf[resid_ids], _FAR)
    # candidate coverage is complete only if the extra set swallowed every
    # residual; spilled QUERIES beyond the cap simply stay +inf and fail
    # ``found_all`` -> fallback
    spill_lost = jnp.maximum(n_resid - extra_cap, 0)
    # diagnostics for config tuning (battery use): returned as a 4th value
    # when ``return_stats`` (static) is set
    stats = {
        "n_spill": n_spill, "n_resid": n_resid, "spill_lost": spill_lost,
        "n_cells": jnp.int32(n_cells), "cell_cap": jnp.int32(cell_cap),
        "cand_cap": jnp.int32(cand_cap),
    }

    # --- 3. probe ----------------------------------------------------------
    cdist = _pdist2(centroids, centroids)
    _, nbr = jax.lax.top_k(-cdist, n_probe)  # [C, T], self first (d=0)

    xb3 = xb.reshape(n_cells, cell_cap, d)
    ib2 = ib.reshape(n_cells, cell_cap)
    xc3 = xcb.reshape(n_cells, cand_cap, d)
    ic2 = icb.reshape(n_cells, cand_cap)
    vc2 = vcb.reshape(n_cells, cand_cap)
    g = group_cells
    n_groups = -(-n_cells // g)
    pad_c = n_groups * g - n_cells
    cells = jnp.pad(jnp.arange(n_cells, dtype=jnp.int32), (0, pad_c))

    if probe_impl == "pallas":
        # scalar-prefetched cell-slab DMA + VPU direct-formula distances +
        # in-VMEM running top-k (see ops/pallas/ivf_probe.py). The direct
        # formula is exact (no norm-expansion cancellation); empty slots
        # carry _FAR coords, whose squared distances overflow to +inf and
        # self-exclude.
        from gnn_tracking_tpu.ops.pallas.ivf_probe import ivf_probe

        pd, pi = ivf_probe(xb3, ib2, xc3, ic2, nbr, kw=kw, loop=loop)
    else:

        def probe(cell_ids):
            # shift each cell's queries AND candidates by the cell
            # centroid: distances are shift-invariant, but the local frame
            # keeps norms at neighborhood scale so the norm-expansion
            # matmul stays precise
            shift = centroids[cell_ids][:, None, :]  # [g, 1, d]
            q = (xb3[cell_ids] - shift).reshape(g * cell_cap, d)
            qid = ib2[cell_ids].reshape(g * cell_cap)
            cand_cells = nbr[cell_ids]  # [g, T]
            cx = (
                xc3[cand_cells].reshape(g, n_probe * cand_cap, d) - shift
            )
            cid = ic2[cand_cells].reshape(g, n_probe * cand_cap)
            cvalid = vc2[cand_cells].reshape(g, n_probe * cand_cap)
            dd = jax.vmap(_pdist2)(
                q.reshape(g, cell_cap, d), cx
            )  # [g, cap, T*cand_cap]
            cid_b = jnp.broadcast_to(cid[:, None, :], dd.shape)
            bad = ~jnp.broadcast_to(cvalid[:, None, :], dd.shape)
            if not loop:
                bad |= cid_b == qid.reshape(g, cell_cap)[:, :, None]
            neg, pos = jax.lax.top_k(-jnp.where(bad, jnp.inf, dd), kw)
            return -neg, jnp.take_along_axis(cid_b, pos, axis=2)

        pd, pi = jax.lax.map(probe, cells.reshape(n_groups, g))
        pd = pd.reshape(-1, kw)[: n_cells * cell_cap]
        pi = pi.reshape(-1, kw)[: n_cells * cell_cap]

    # bucket results back to original indexing via the INVERSE map: scatter
    # only an [N] i32 slot table, then row-gather the [*, kw] results —
    # far cheaper than scattering the [C*cap, kw] f32+i32 tables themselves
    # (TPU scatters serialize on conflict detection; gathers don't)
    n_slots = pd.shape[0]
    slot_of = jnp.full((n,), n_slots, jnp.int32).at[
        jnp.where(vb, ib, n)
    ].set(jnp.arange(n_slots, dtype=jnp.int32), mode="drop")
    has_slot = slot_of < n_slots
    take = jnp.minimum(slot_of, n_slots - 1)
    dists = jnp.where(has_slot[:, None], pd[take], jnp.inf)
    idx = jnp.where(has_slot[:, None], pi[take], 0)

    # extra-set pass (original indexing, blockwise, only if spill exists):
    # every query merges the spill points' top-k with its bucket result so
    # candidate coverage stays complete. The pass runs on a SIZE LADDER:
    # its cost is ~linear in the static extra-set width, and the runtime
    # residual count is usually tiny next to extra_cap (r3 battery ivfglue:
    # the fixed-8192 pass cost ~535 ms of the 850 ms total at 262k), so a
    # runtime cond picks the smallest rung that holds every residual.
    def _extra_with(cap):
        x_r = x_resid[:cap]
        ids_r = resid_ids[:cap]
        valid_r = resid_valid[:cap]

        def run(carry):
            dists, idx = carry
            xq = jnp.pad(
                xf, ((0, (-n) % block_n), (0, 0)), constant_values=_FAR
            )
            qi = jnp.pad(
                jnp.arange(n, dtype=jnp.int32), (0, (-n) % block_n),
                constant_values=-1,
            )

            def one(args):
                q, qid = args
                de = _pdist2(q, x_r)  # [B, cap]
                ebad = ~valid_r[None, :]
                if not loop:
                    ebad = ebad | (ids_r[None, :] == qid[:, None])
                neg_e, pos_e = jax.lax.top_k(
                    -jnp.where(ebad, jnp.inf, de), kw
                )
                return -neg_e, ids_r[pos_e]

            de, ie = jax.lax.map(
                one, (xq.reshape(-1, block_n, d), qi.reshape(-1, block_n))
            )
            de = de.reshape(-1, kw)[:n]
            ie = ie.reshape(-1, kw)[:n]
            # both lists are ascending-sorted and id-disjoint (the extra
            # set is the residual, absent from every candidate slab) —
            # two-pointer merge instead of an 89 ms [N, 2kw] top_k
            return _merge_sorted_pairs(dists, idx, de, ie, kw)

        return run

    extra_rungs = [c for c in (256, 2048) if c < extra_cap] + [extra_cap]
    extra_pass = _extra_with(extra_rungs[-1])
    for c in reversed(extra_rungs[:-1]):
        extra_pass = (
            lambda small, big, c=c: lambda carry: jax.lax.cond(
                n_resid <= c, small, big, carry
            )
        )(_extra_with(c), extra_pass)

    def _spill_probe_with(cap):
        """Probe pass for the spilled queries themselves, at rung ``cap``.

        A spilled (over-cap) point is not in any bucket, so the grouped
        probe never ran for it — before this pass its only candidates were
        the *other* spill points (extra set), yet certification assumed it
        had scanned its ``nbr[assign]`` neighborhood (round-2 battery #8:
        1% of queries certified-but-wrong at 262k). Scan those cells'
        buckets here so the triangle bound's premise holds for every query.

        Like ``_extra_with``, the pass runs on a size ladder: its cost is
        linear in the static query width, and the runtime spill count is
        usually far below ``extra_cap`` (battery #24 ivfglue: the spill
        passes were ~550 of 795 ms at the full width).
        """
        ids_c = spill_ids[:cap]
        x_c = x_spill[:cap]
        valid_c = spill_valid[:cap]

        def run(carry):
            dists, idx = carry
            own_cell = assign[ids_c]
            cand_cells = nbr[own_cell]  # [X, T]
            shift_x = centroids[own_cell]  # [X, d] local frame (see probe)
            bq = min(1024, cap)
            pad_x = (-cap) % bq

            def one(args):
                q, qid, cc, qvalid, sh = args  # [B,d],[B],[B,T],[B],[B,d]
                b = q.shape[0]
                q = q - sh
                cx = xc3[cc].reshape(b, n_probe * cand_cap, d) - sh[:, None, :]
                cid = ic2[cc].reshape(b, n_probe * cand_cap)
                cv = vc2[cc].reshape(b, n_probe * cand_cap)
                qn = jnp.sum(q * q, axis=-1)[:, None]
                cn = jnp.sum(cx * cx, axis=-1)
                dd = qn + cn - 2.0 * jnp.einsum(
                    "bd,bjd->bj", q, cx, precision=_HIGH
                )
                dd = jnp.maximum(dd, 0.0)
                bad = ~cv | ~qvalid[:, None]
                if not loop:
                    bad |= cid == qid[:, None]
                neg, pos = jax.lax.top_k(-jnp.where(bad, jnp.inf, dd), kw)
                return -neg, jnp.take_along_axis(cid, pos, axis=1)

            dp, ip = jax.lax.map(
                one,
                (
                    jnp.pad(x_c, ((0, pad_x), (0, 0)), constant_values=_FAR)
                    .reshape(-1, bq, d),
                    jnp.pad(ids_c, (0, pad_x)).reshape(-1, bq),
                    jnp.pad(cand_cells, ((0, pad_x), (0, 0))).reshape(
                        -1, bq, n_probe
                    ),
                    jnp.pad(valid_c, (0, pad_x)).reshape(-1, bq),
                    jnp.pad(shift_x, ((0, pad_x), (0, 0))).reshape(-1, bq, d),
                ),
            )
            dp = dp.reshape(-1, kw)[:cap]
            ip = ip.reshape(-1, kw)[:cap]
            # rows at ids_c hold only extra_pass (residual-set) results,
            # disjoint from the candidate slabs dp scanned -> no duplicates;
            # both sides sorted ascending -> two-pointer merge
            dm, im = _merge_sorted_pairs(dists[ids_c], idx[ids_c], dp, ip, kw)
            keep = valid_c[:, None]
            dists = dists.at[ids_c].set(jnp.where(keep, dm, dists[ids_c]))
            idx = idx.at[ids_c].set(jnp.where(keep, im, idx[ids_c]))
            return dists, idx

        return run

    spill_rungs = [c for c in (256, 2048) if c < extra_cap] + [extra_cap]
    spill_probe = _spill_probe_with(spill_rungs[-1])
    for c in reversed(spill_rungs[:-1]):
        spill_probe = (
            lambda small, big, c=c: lambda carry: jax.lax.cond(
                n_spill <= c, small, big, carry
            )
        )(_spill_probe_with(c), spill_probe)

    if spill_passes in (True, "extra"):
        # all-queries extra-set scan: needed only when the candidate table
        # did not swallow every spill (n_resid > 0) — with the widened
        # cand_cap table this is the rare case, so the ~429 ms pass
        # (battery #13) is usually cond-skipped at runtime
        dists, idx = jax.lax.cond(
            n_resid > 0, extra_pass, lambda c: c, (dists, idx)
        )
    if spill_passes in (True, "probe"):
        dists, idx = jax.lax.cond(
            n_spill > 0, spill_probe, lambda c: c, (dists, idx)
        )

    # --- 3b. re-rank: exact distances for the kw survivors ------------------
    # the direct difference formula has no cancellation (error ~eps * d^2
    # itself), so the final top-k selection and the certification radius
    # are immune to the norm-expansion noise that picked the candidates
    def full_rerank(carry):
        dists, idx = carry

        def rerank(args):
            dn, ix, q = args  # [B, kw], [B, kw], [B, d]
            diff = q[:, None, :] - xf[ix]
            dr = jnp.sum(diff * diff, axis=-1)
            dr = jnp.where(jnp.isfinite(dn), dr, jnp.inf)
            neg, pos = jax.lax.top_k(-dr, k)
            return -neg, jnp.take_along_axis(ix, pos, axis=1)

        bnr = min(block_n, 8192)
        pad_r = (-n) % bnr
        dk, ik = jax.lax.map(
            rerank,
            (
                jnp.pad(dists, ((0, pad_r), (0, 0)), constant_values=jnp.inf)
                .reshape(-1, bnr, kw),
                jnp.pad(idx, ((0, pad_r), (0, 0))).reshape(-1, bnr, kw),
                jnp.pad(xf, ((0, pad_r), (0, 0))).reshape(-1, bnr, d),
            ),
        )
        return dk.reshape(-1, k)[:n], ik.reshape(-1, k)[:n]

    if probe_impl == "pallas":
        # the Pallas probe's distances are already the exact direct formula,
        # sorted ascending (ops/pallas/ivf_probe.py) — the full-N rerank
        # (~140 ms at 262k, battery #17) collapses to a slice. Only rows
        # whose candidates came through a norm-expansion merge still need
        # the direct formula: the spilled queries (spill_probe), and — when
        # the widened candidate table did NOT swallow every residual — all
        # rows (extra_pass), handled by the same runtime cond that gated
        # the pass itself.
        def fix_spill(carry):
            dk, ik = carry
            dkw, ikw = dists[spill_ids], idx[spill_ids]
            diff = xf[spill_ids][:, None, :] - xf[ikw]
            dr = jnp.sum(diff * diff, axis=-1)
            dr = jnp.where(jnp.isfinite(dkw), dr, jnp.inf)
            neg, pos = jax.lax.top_k(-dr, k)
            dm, im = -neg, jnp.take_along_axis(ikw, pos, axis=1)
            keep = spill_valid[:, None]
            dk = dk.at[spill_ids].set(jnp.where(keep, dm, dk[spill_ids]))
            ik = ik.at[spill_ids].set(jnp.where(keep, im, ik[spill_ids]))
            return dk, ik

        def spill_then_slice(_):
            # the spill fix is only worth running when the full rerank
            # won't supersede it (advisor r2: doing it unconditionally
            # wasted extra_cap rows of work in the residual case)
            dk, ik = dists[:, :k], idx[:, :k]
            if spill_passes in (True, "probe"):
                dk, ik = jax.lax.cond(
                    n_spill > 0, fix_spill, lambda c: c, (dk, ik)
                )
            return dk, ik

        if spill_passes in (True, "extra"):
            dists, idx = jax.lax.cond(
                n_resid > 0,
                lambda _: full_rerank((dists, idx)),
                spill_then_slice,
                None,
            )
        else:
            dists, idx = spill_then_slice(None)
    else:
        dists, idx = full_rerank((dists, idx))

    def _ret(dists, idx, unc):
        if return_stats:
            return dists, idx, unc, stats
        return dists, idx, unc

    if not certify:
        # timing/diagnostic mode: skip certification + fallback entirely
        return _ret(dists, idx, jnp.array(-1, jnp.int32))

    # --- 4. certification --------------------------------------------------
    kth = jnp.sqrt(
        jnp.where(jnp.isfinite(dists[:, -1]), dists[:, -1], jnp.inf)
    )
    found_all = jnp.isfinite(dists).all(axis=1)
    visited = nbr[assign]  # [N, T]

    def certify(args):
        q, vis, r = args
        b = q.shape[0]
        dc = jnp.sqrt(_pdist2(q, centroids))  # [B, C]
        bound = dc - rad[None, :]
        # visited mask via scatter (a [B, T, C] iota compare is ~T x the
        # memory traffic of the bound matrix itself)
        rows = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], vis.shape
        )
        vm = jnp.zeros((b, n_cells), bool).at[rows, vis].set(True)
        bound = jnp.where(vm, jnp.inf, bound)
        # absolute safety margin: distance matmuls (HIGHEST) are good to
        # ~1e-6 relative; never let fp noise certify a borderline query
        return r <= jnp.min(bound, axis=1) - 1e-5 * jnp.maximum(1.0, r)

    bn = min(block_n, 2048)
    xq = jnp.pad(xf, ((0, (-n) % bn), (0, 0)), constant_values=_FAR)
    vq = jnp.pad(visited, ((0, (-n) % bn), (0, 0)))
    rq = jnp.pad(kth, (0, (-n) % bn))
    cert = jax.lax.map(
        certify,
        (
            xq.reshape(-1, bn, d),
            vq.reshape(-1, bn, n_probe),
            rq.reshape(-1, bn),
        ),
    ).reshape(-1)[:n]
    certified = (cert & found_all & (spill_lost == 0)) | ~node_mask

    # --- 5. fallback (skipped entirely when everything certified) ----------
    from gnn_tracking_tpu.ops.pallas.windowed_topk import _fallback_brute

    if not fallback:
        # stage-attribution mode: report the violator count directly
        return _ret(dists, idx, jnp.sum(~certified))

    def run_fallback(cap):
        """One brute-force rung at width ``cap``: fixes up to ``cap``
        violators and marks them proven-exact in ``certified``."""

        def _rung(carry):
            dists, idx, certified = carry
            # first <=cap violators; fill rows (index 0) are harmless: they
            # recompute row 0's brute result and write identical values
            viol_idx = jnp.nonzero(~certified, size=cap, fill_value=0)[0]
            # brute at width kw + direct-formula rerank: the streaming
            # kernel's norm expansion carries the same near-tie noise as
            # the probe
            fb_dn, fb_iw = _fallback_brute(
                xf[viol_idx], xf, node_mask, k=kw, block_c=1024, loop=loop,
                self_ids=viol_idx.astype(jnp.int32), interpret=False,
            )
            diff = xf[viol_idx][:, None, :] - xf[fb_iw]
            fb_dr = jnp.where(
                jnp.isfinite(fb_dn), jnp.sum(diff * diff, axis=-1), jnp.inf
            )
            neg, pos = jax.lax.top_k(-fb_dr, k)
            fb_d = -neg
            fb_i = jnp.take_along_axis(fb_iw, pos, axis=1)
            take_fb = ~certified[viol_idx]
            dists = dists.at[viol_idx].set(
                jnp.where(take_fb[:, None], fb_d, dists[viol_idx])
            )
            idx = idx.at[viol_idx].set(
                jnp.where(take_fb[:, None], fb_i, idx[viol_idx])
            )
            certified = certified.at[viol_idx].set(True)
            return dists, idx, certified

        return _rung

    # cap ladder: the brute pass costs ~cap (1165 ms at 8192 vs 115 ms at
    # 1024 for 262k points, round-2 battery #12), while the violator count
    # is typically tiny (66 at 262k clustered) — so run a cheap small rung
    # first and escalate to the full cap only if violators remain
    rungs = [c for c in (256, 1024) if c < fallback_cap] + [fallback_cap]
    carry = (dists, idx, certified)
    for cap in rungs:
        carry = jax.lax.cond(
            jnp.sum(~carry[2]) > 0, run_fallback(cap), lambda c: c, carry
        )
    dists, idx, certified = carry
    return _ret(dists, idx, jnp.sum(~certified))
