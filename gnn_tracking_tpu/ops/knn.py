"""Fixed-degree kNN and radius graphs on TPU.

TPU-native replacement for the ``torch_cluster`` C++/CUDA kernels used by the
reference (``knn_graph`` at ``models/graph_construction.py:14,233``;
``radius_graph`` at ``metrics/losses/oc.py:115`` and
``metrics/losses/metric_learning.py:97``). Design:

* Brute-force blocked pairwise distances: query blocks of ``block_size`` rows
  against all points — the inner product rides the MXU, the block never
  materialises the full N² matrix in HBM.
* Output is a fixed-degree edge list ``[2, N*k]`` + validity mask — static
  shapes, jittable, maskable.
* Edge direction convention matches torch_cluster: for each query node ``i``
  its neighbors ``j`` produce edges ``(j, i)`` (source=neighbor,
  target=query). Since neighborhood relations are symmetric, both directions
  are present unless truncated by the degree cap.

For very large N, the Pallas kernel in ``ops/pallas/pairwise_topk.py`` fuses
the distance computation with a running top-k to cut HBM traffic further.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_BIG = jnp.inf

#: in-jit small-N (<=8 MB) neighbor-selection implementation: "hier"
#: (hierarchical XLA TopK — measured 60x SLOWER than the Pallas kernel on
#: v5e, battery topk 2026-08-20: XLA TopK at 4.2-6.0 s vs 76-448 ms; kept
#: only as an A/B arm), "pallas" (streaming running-merge kernel), or
#: "filter" (survivor-filtered kernel — battery #24: EXACT on 32768/32768
#: rows and 1.6x/2.6x/3.2x faster than "pallas" at k=8/32/64; default).
#: Env override for A/B batteries; read at import time — in-process flips
#: only affect traces created afterwards.
_SMALL_TOPK_IMPL = os.environ.get("GNN_TRACKING_KNN_SMALL_IMPL", "filter")
_SMALL_TOPK_CHOICES = ("hier", "pallas", "filter")
if _SMALL_TOPK_IMPL not in _SMALL_TOPK_CHOICES:
    msg = (
        "GNN_TRACKING_KNN_SMALL_IMPL must be one of "
        f"{_SMALL_TOPK_CHOICES}, got {_SMALL_TOPK_IMPL!r}"
    )
    raise ValueError(msg)

#: in-jit small-N radius-graph implementation: "filter" (fixed-τ survivor
#: filter — the threshold is the query radius, so no top-k peel is needed
#: and only in-radius candidates are ever extracted) or "topk" (select the
#: cap nearest, then mask by radius — the pre-round-3 path).
_RADIUS_IMPL = os.environ.get("GNN_TRACKING_RADIUS_IMPL", "filter")
if _RADIUS_IMPL not in ("filter", "topk"):
    msg = (
        "GNN_TRACKING_RADIUS_IMPL must be one of ('filter', 'topk'), "
        f"got {_RADIUS_IMPL!r}"
    )
    raise ValueError(msg)


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    return jnp.pad(x, [(0, target - n)] + [(0, 0)] * (x.ndim - 1))


def _hier_block_topk(
    x: jax.Array,
    k: int,
    *,
    node_mask: jax.Array | None,
    batch: jax.Array | None,
    loop: bool,
    block_q: int = 256,
    chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Hierarchical blocked top-k: per-chunk ``lax.top_k`` over the candidate
    axis, then one merge ``top_k`` over the surviving ``nc*k`` columns.

    Exact: the global k best of a row are contained in the union of each
    chunk's k best (k <= per-chunk keep). Selection work is the hardware
    TopK over chunk-wide rows instead of the k-round running merge of the
    Pallas kernel (whose cost is k passes over ALL N candidates per row —
    round-3 battery: 232 ms at N=32k/k=32 vs a 0.26 ms byte floor). The
    distance block [B, N] is materialized once per query block, so traffic
    is ~2·N²·4 bytes total — at 32k that is ~8.6 GB ≈ 15 ms at bench
    bandwidth, ~15x the running-merge kernel.
    """
    n, d = x.shape
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    x = jnp.where(node_mask[:, None], x, 0)
    sq_norms = jnp.sum(x * x, axis=-1)

    # candidate side padded to a chunk multiple (padding never selected)
    n_pad_c = -(-n // chunk) * chunk
    xc = jnp.pad(x, ((0, n_pad_c - n), (0, 0)))
    c_norms = jnp.pad(sq_norms, (0, n_pad_c - n))
    c_valid = jnp.pad(node_mask, (0, n_pad_c - n))
    c_batch = jnp.pad(batch, (0, n_pad_c - n), constant_values=-1)
    nc = n_pad_c // chunk
    kb = min(k, chunk)
    col_ids = jnp.arange(n_pad_c, dtype=jnp.int32)
    chunk_off = (jnp.arange(nc, dtype=jnp.int32) * chunk)[None, :, None]

    xq = _pad_rows(x, block_q)
    q_norms = _pad_rows(sq_norms, block_q)
    q_batch = _pad_rows(batch, block_q)
    q_index = _pad_rows(jnp.arange(n, dtype=jnp.int32), block_q)
    n_blocks = xq.shape[0] // block_q

    def one_block(args):
        bq, bnorm, bbatch, bidx = args
        # precision note: see the HIGHEST comment in _blocked_neighbor_topk
        dmat = bnorm[:, None] + c_norms[None, :] - 2.0 * jnp.dot(
            bq, xc.T, precision=jax.lax.Precision.HIGHEST
        )
        dmat = jnp.maximum(dmat, 0.0)
        invalid = ~c_valid[None, :] | (bbatch[:, None] != c_batch[None, :])
        if not loop:
            invalid |= bidx[:, None] == col_ids[None, :]
        dmat = jnp.where(invalid, _BIG, dmat)
        d3 = dmat.reshape(block_q, nc, chunk)
        neg_d, ci = jax.lax.top_k(-d3, kb)  # [B, nc, kb]
        flat_d = (-neg_d).reshape(block_q, nc * kb)
        flat_i = (ci + chunk_off).reshape(block_q, nc * kb)
        neg_d2, pos = jax.lax.top_k(-flat_d, k)
        idx = jnp.take_along_axis(flat_i, pos, axis=1)
        return -neg_d2, idx

    blocks = (
        xq.reshape(n_blocks, block_q, -1),
        q_norms.reshape(n_blocks, block_q),
        q_batch.reshape(n_blocks, block_q),
        q_index.reshape(n_blocks, block_q),
    )
    dists, idx = jax.lax.map(one_block, blocks)
    return dists.reshape(-1, k)[:n], idx.reshape(-1, k)[:n]


def _blocked_neighbor_topk(
    x: jax.Array,
    k: int,
    *,
    node_mask: jax.Array | None,
    batch: jax.Array | None,
    loop: bool,
    block_size: int,
) -> tuple[jax.Array, jax.Array]:
    """For every node, squared distances and indices of its k nearest valid
    neighbors. Returns (``dists_sq [N, k]``, ``idx [N, k]``); entries with
    infinite distance are invalid (fewer than k valid neighbors exist).
    """
    n, d = x.shape
    # Streaming Pallas kernel: running top-k in VMEM while candidate blocks
    # stream through the MXU — measured ~100x faster than the lax.top_k path
    # on v5e (scripts/tpu_experiments.py). Requires the point array resident
    # in VMEM; fall back to the XLA path beyond ~8 MB or with batch vectors.
    if jax.default_backend() == "tpu":
        # Neighbor SELECTION is non-differentiable and pallas_call has no JVP
        # rule — detach the kernel input (losses differentiate through the
        # distances recomputed from the live ``x`` in ``knn_graph``). Without
        # this, any loss whose latent feeds the graph build (rg condensation,
        # hinge) dies in ``_pallas_call_jvp_rule``.
        xs = jax.lax.stop_gradient(x)
        if n * d * 4 <= 8 * 1024 * 1024:
            if _SMALL_TOPK_IMPL == "hier":
                return _hier_block_topk(
                    xs, k, node_mask=node_mask, batch=batch, loop=loop
                )
            if _SMALL_TOPK_IMPL == "filter":
                from gnn_tracking_tpu.ops.pallas.pairwise_topk import (
                    pairwise_topk_filter,
                )

                return pairwise_topk_filter(
                    xs, k=k, node_mask=node_mask, batch=batch, loop=loop
                )
            from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk

            return pairwise_topk(
                xs, k=k, node_mask=node_mask, batch=batch, loop=loop
            )
        if batch is None:
            # Beyond the VMEM budget: IVF-certified kNN (ops/ivf_knn.py) —
            # k-means cells + triangle-inequality certification + capped
            # brute fallback. Exact whenever the returned `n_uncert` is 0
            # (~always for hit/latent clouds); it cannot be raised from
            # inside jit, so offline callers needing the hard guarantee use
            # :func:`knn_graph_ivf`, which asserts and retries.
            from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

            dists, idx, _ = ivf_knn(
                xs, k=k, node_mask=node_mask, loop=loop
            )
            return dists, idx
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)

    x = jnp.where(node_mask[:, None], x, 0)
    sq_norms = jnp.sum(x * x, axis=-1)

    xq = _pad_rows(x, block_size)
    q_norms = _pad_rows(sq_norms, block_size)
    q_batch = _pad_rows(batch, block_size)
    q_index = _pad_rows(jnp.arange(n, dtype=jnp.int32), block_size)
    n_blocks = xq.shape[0] // block_size

    def one_block(args):
        bq, bnorm, bbatch, bidx = args
        # [B, N] squared euclidean distances via the MXU-friendly expansion
        # HIGHEST: default MXU precision truncates f32 operands to bf16 and
        # the norm-expansion then cancels catastrophically for tight
        # clusters (battery #7: ~1%% operand error -> 100%%+ distance error
        # at intra-cluster scale), mis-ranking neighbors
        d = bnorm[:, None] + sq_norms[None, :] - 2.0 * jnp.dot(
            bq, x.T, precision=jax.lax.Precision.HIGHEST
        )
        d = jnp.maximum(d, 0.0)
        invalid = ~node_mask[None, :] | (bbatch[:, None] != batch[None, :])
        if not loop:
            invalid |= bidx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
        d = jnp.where(invalid, _BIG, d)
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx

    blocks = (
        xq.reshape(n_blocks, block_size, -1),
        q_norms.reshape(n_blocks, block_size),
        q_batch.reshape(n_blocks, block_size),
        q_index.reshape(n_blocks, block_size),
    )
    dists, idx = jax.lax.map(one_block, blocks)
    return dists.reshape(-1, k)[:n], idx.reshape(-1, k)[:n]


@functools.partial(jax.jit, static_argnames=("k", "loop", "block_size"))
def knn_graph(
    x: jax.Array,
    k: int,
    *,
    node_mask: jax.Array | None = None,
    batch: jax.Array | None = None,
    loop: bool = False,
    block_size: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """k-nearest-neighbor graph (fixed degree, padded).

    Returns ``(edge_index [2, N*k], edge_mask [N*k], dists [N*k])`` where
    ``dists`` are Euclidean (not squared) distances. Invalid entries (masked
    query node or fewer than k valid neighbors) are masked.
    """
    dists_sq, idx = _blocked_neighbor_topk(
        x, k, node_mask=node_mask, batch=batch, loop=loop, block_size=block_size
    )
    return _edges_from_neighbor_topk(x, dists_sq, idx, node_mask)


def _edges_from_neighbor_topk(
    x: jax.Array,
    dists_sq: jax.Array,
    idx: jax.Array,
    node_mask: jax.Array | None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Assemble (edge_index, mask, dists) from per-node neighbor top-k."""
    n, k = idx.shape
    query = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    valid = jnp.isfinite(dists_sq)
    if node_mask is not None:
        valid &= node_mask[:, None]
    source = jnp.where(valid, idx, 0)
    edge_index = jnp.stack([source.reshape(-1), query.reshape(-1)])
    # Recompute distances differentiably from the selected indices: the
    # selection itself is non-differentiable (and the Pallas path has no
    # VJP), but losses differentiate through the distance VALUES
    # (hinge repulsion, rg condensation). Double-where keeps d(sqrt)/dx
    # finite at masked/zero entries.
    diff = x[source] - x[query[:, 0]][:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    safe = valid & (d2 > 0)
    dists = jnp.where(safe, jnp.sqrt(jnp.where(safe, d2, 1.0)), 0.0)
    return edge_index, valid.reshape(-1), dists.reshape(-1)


def knn_graph_windowed(
    x: jax.Array,
    k: int,
    *,
    node_mask: jax.Array | None = None,
    radius: int = 4,
    block_c: int = 1024,
    fallback_cap: int = 8192,
    max_retries: int = 3,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Guaranteed-exact full-detector kNN graph (host-driven, not jittable).

    Runs :func:`...windowed_topk.windowed_knn` and, if any query remains
    uncertified (fallback cap exhausted — adversarial distributions only),
    re-runs with a doubled band radius and cap until certified. Same return
    convention as :func:`knn_graph`. Use in ETL / offline graph construction
    (reference ``models/graph_construction.py:222-237`` at the full-detector
    scale the reference never reached).
    """
    from gnn_tracking_tpu.ops.pallas.windowed_topk import windowed_knn

    n = x.shape[0]
    for _ in range(max_retries):
        dists_sq, idx, n_uncert = windowed_knn(
            jax.lax.stop_gradient(x), k=k, node_mask=node_mask,
            radius=radius, block_c=block_c, fallback_cap=fallback_cap,
        )
        if int(n_uncert) == 0:
            break
        radius *= 2
        fallback_cap = min(2 * fallback_cap, n)
    else:
        msg = f"windowed kNN not certified exact after {max_retries} retries"
        raise RuntimeError(msg)
    query = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    valid = jnp.isfinite(dists_sq)
    if node_mask is not None:
        valid &= node_mask[:, None]
    source = jnp.where(valid, idx, 0)
    edge_index = jnp.stack([source.reshape(-1), query.reshape(-1)])
    dists = jnp.sqrt(jnp.where(valid, dists_sq, 0.0))
    return edge_index, valid.reshape(-1), dists.reshape(-1)


def knn_graph_ivf(
    x: jax.Array,
    k: int,
    *,
    node_mask: jax.Array | None = None,
    n_probe: int = 8,
    fallback_cap: int = 8192,
    max_retries: int = 3,
    **ivf_kwargs,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Guaranteed-exact full-detector kNN graph (host-driven, not jittable).

    Runs :func:`gnn_tracking_tpu.ops.ivf_knn.ivf_knn` and, while any query
    remains uncertified (fallback cap exhausted), retries with doubled probe
    width and fallback cap. Same return convention as :func:`knn_graph`.
    Use in ETL / offline graph construction (reference
    ``models/graph_construction.py:222-237`` at the full-detector scale the
    reference never reached).
    """
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    n = x.shape[0]
    for _ in range(max_retries):
        dists_sq, idx, n_uncert = ivf_knn(
            jax.lax.stop_gradient(x), k=k, node_mask=node_mask,
            n_probe=n_probe, fallback_cap=fallback_cap, **ivf_kwargs,
        )
        if int(n_uncert) == 0:
            break
        n_probe *= 2
        fallback_cap = min(2 * fallback_cap, n)
    else:
        msg = f"IVF kNN not certified exact after {max_retries} retries"
        raise RuntimeError(msg)
    query = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    valid = jnp.isfinite(dists_sq)
    if node_mask is not None:
        valid &= node_mask[:, None]
    source = jnp.where(valid, idx, 0)
    edge_index = jnp.stack([source.reshape(-1), query.reshape(-1)])
    dists = jnp.sqrt(jnp.where(valid, dists_sq, 0.0))
    return edge_index, valid.reshape(-1), dists.reshape(-1)


def knn_with_max_radius(
    x: jax.Array,
    k: int,
    *,
    max_radius: float | None = None,
    node_mask: jax.Array | None = None,
    batch: jax.Array | None = None,
    block_size: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """kNN graph with edges beyond ``max_radius`` dropped (masked).

    Capability parity: reference ``models/graph_construction.py:222-237``.
    Returns ``(edge_index [2, N*k], edge_mask [N*k])``.
    """
    edge_index, mask, dists = knn_graph(
        x, k, node_mask=node_mask, batch=batch, loop=False, block_size=block_size
    )
    if max_radius is not None:
        mask = mask & (dists <= max_radius)
    return edge_index, mask


#: trace-time counter of filter-path radius_graph dispatches (diagnostics /
#: tests: increments once per trace that takes the survivor-filter branch).
_RADIUS_FILTER_DISPATCHES = 0


def _radius_uses_filter(n: int, d: int, r_concrete: float | None) -> bool:
    """Dispatch predicate for the survivor-filter radius path (pure, so it
    can be unit-tested with a monkeypatched backend)."""
    return (
        _RADIUS_IMPL == "filter"
        and r_concrete is not None
        and jax.default_backend() == "tpu"
        and n * d * 4 <= 8 * 1024 * 1024
    )


@functools.partial(
    jax.jit, static_argnames=("k", "radius2", "loop")
)
def _radius_graph_filter(
    x: jax.Array,
    *,
    k: int,
    radius2: float,
    node_mask: jax.Array | None,
    batch: jax.Array | None,
    loop: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    # Kernel membership is decided with f32 norm-expansion distances; inflate
    # the extraction threshold slightly so kernel rounding can only
    # over-include — the exact ``dists <= r`` mask below trims, never the
    # kernel (boundary-exactness contract vs the topk backend).
    dists_sq, idx = pairwise_topk_filter(
        jax.lax.stop_gradient(x), k=k, node_mask=node_mask, batch=batch,
        loop=loop, radius2=radius2 * (1.0 + 1e-3),
    )
    return _edges_from_neighbor_topk(x, dists_sq, idx, node_mask)


def radius_graph(
    x: jax.Array,
    r: float,
    *,
    max_num_neighbors: int = 256,
    node_mask: jax.Array | None = None,
    batch: jax.Array | None = None,
    loop: bool = False,
    block_size: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-degree radius graph: up to ``max_num_neighbors`` *nearest*
    neighbors within radius ``r`` per node.

    Returns ``(edge_index [2, N*cap], edge_mask [N*cap], dists [N*cap])``.
    Note: where torch_cluster truncates by an arbitrary order when the cap is
    hit, we keep the *nearest* neighbors (strictly better for the losses that
    consume this).

    On TPU (small-N regime, concrete ``r``) this dispatches to the fixed-τ
    survivor-filter kernel: the extraction threshold starts at ``r²`` so
    only in-radius candidates are ever extracted — measured far cheaper
    than running full top-k and masking (round-3: serving radius build and
    the rg-condensation loss are ~80-90% neighbor selection).

    NOT itself jitted: ``r`` must stay a concrete Python float at dispatch
    time (under a caller's jit it still is, as long as the caller passes a
    Python float / marks it static — a traced ``r`` falls back to the topk
    path). Both branches are jitted internally, so eager callers still get
    compiled execution.
    """
    n = x.shape[0]
    k = min(max_num_neighbors, n)
    r_concrete: float | None
    try:
        r_concrete = float(r)
    except (TypeError, jax.errors.TracerArrayConversionError):
        r_concrete = None  # traced radius: τ must be trace-time static
    if _radius_uses_filter(n, x.shape[1], r_concrete):
        global _RADIUS_FILTER_DISPATCHES
        _RADIUS_FILTER_DISPATCHES += 1
        edge_index, mask, dists = _radius_graph_filter(
            x, k=k, radius2=r_concrete * r_concrete, node_mask=node_mask,
            batch=batch, loop=loop,
        )
    else:
        edge_index, mask, dists = knn_graph(
            x, k, node_mask=node_mask, batch=batch, loop=loop,
            block_size=block_size,
        )
    r_arr = jnp.asarray(r, dtype=dists.dtype)
    mask = mask & (dists <= r_arr)
    return edge_index, mask, dists
