"""Slab-padded edge layout for fused CSR message passing.

The fused relational kernel (``fused_relational.py``) processes edges in a
dense ``[S, Cmax * EB]`` layout: ``S`` destination slabs of ``W`` consecutive
target nodes, each with a fixed budget of ``Cmax`` chunks of ``EB`` edges.
Within a slab, every edge's destination lies in ``[s*W, (s+1)*W)`` so the
scatter becomes a windowed one-hot matmul on the MXU with *no*
read-modify-write outside the slab's own (revisited) output block, and the
source gather reads a ``[3W]`` window ``[(s-1)*W, (s+2)*W)`` around the slab
— exact for spatially sorted graphs, where kNN/sector edges connect nearby
node indices (reference builds its graphs per phi-sector:
``graph_construction/graph_builder.py``; our point-cloud builder orders hits
so this locality holds).

Edges that don't fit — source outside the ``3W`` window, or a slab fuller
than its chunk budget — go to a fixed-capacity *overflow* list evaluated by
a plain XLA path. Overflow slots still occupy a (masked) position in the
dense layout so the padded edge order is a complete, stable edge list that
every non-fused consumer (losses, metrics, the XLA fallback) can use as-is.

This is host-side, per-event preprocessing (numpy), run once in the data
loader next to padding/bucketing (``utils/loading.PaddingConfig``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SlabLayoutSpec:
    """Static configuration of a slab layout (fixed per padding bucket)."""

    window: int  # W: nodes per destination slab
    block_e: int  # EB: edges per kernel chunk
    cmax: int  # chunks per slab
    overflow_cap: int  # capacity of the XLA overflow edge list

    @property
    def slab_capacity(self) -> int:
        return self.cmax * self.block_e

    def num_slabs(self, n_nodes: int) -> int:
        return -(-n_nodes // self.window)

    def num_edges(self, n_nodes: int) -> int:
        return self.num_slabs(n_nodes) * self.slab_capacity


def default_spec(
    n_nodes: int,
    n_edges: int,
    *,
    window: int = 1024,
    block_e: int = 512,
    slack: float = 1.5,
    overflow_frac: float = 0.25,
) -> SlabLayoutSpec:
    """Heuristic spec: per-slab budget ``slack`` times the mean occupancy."""
    s = max(-(-n_nodes // window), 1)
    mean_chunks = n_edges / (s * block_e)
    cmax = max(int(np.ceil(mean_chunks * slack)), 1)
    overflow_cap = int(np.ceil(n_edges * overflow_frac / block_e) * block_e)
    return SlabLayoutSpec(
        window=window, block_e=block_e, cmax=cmax, overflow_cap=max(overflow_cap, block_e)
    )


class SlabLayoutError(ValueError):
    """Graph does not fit the slab layout spec (raise before training)."""


def slab_partition(
    src: np.ndarray,
    dst: np.ndarray,
    valid: np.ndarray,
    n_nodes: int,
    spec: SlabLayoutSpec,
) -> dict[str, np.ndarray]:
    """Assign edges to slab-layout slots.

    Returns a dict of numpy arrays:

    * ``perm``: ``[E_pad]`` original-edge index per slot, or ``-1`` (padding);
    * ``dstloc``/``srcloc``: per-slot local indices for the kernel
      (``dst - s*W`` in ``[0, W)``; ``src - (s-1)*W`` in ``[0, 3W)``);
    * ``inwin``: per-slot bool — computed by the kernel (in its dst slab,
      src within the 3W window); everything else is 0 in the kernel output;
    * ``of_pos``/``of_slot_mask``: overflow edges' slot positions + validity
      (their src/dst are recovered from the laid-out edge_index itself).

    ``E_pad = S * cmax * EB``. Raises :class:`SlabLayoutError` when the
    valid edges exceed total capacity or the overflow list's capacity.
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    valid = np.asarray(valid).astype(bool)
    w, eb = spec.window, spec.block_e
    s_slabs = spec.num_slabs(n_nodes)
    cap = spec.slab_capacity
    e_pad = s_slabs * cap

    vids = np.nonzero(valid)[0]
    if len(vids) > e_pad:
        msg = (
            f"{len(vids)} valid edges exceed slab capacity {e_pad} "
            f"({s_slabs} slabs x {cap}); increase cmax"
        )
        raise SlabLayoutError(msg)

    vsrc, vdst = src[vids], dst[vids]
    slab = vdst // w
    srcloc_all = vsrc - (slab - 1) * w
    inwin_all = (srcloc_all >= 0) & (srcloc_all < 3 * w)

    # stable dst order within slabs keeps the layout globally dst-sorted
    order = np.argsort(vdst, kind="stable")

    perm = np.full(e_pad, -1, dtype=np.int64)
    inwin = np.zeros(e_pad, dtype=bool)
    overflow_slots: list[int] = []
    free_slots: list[np.ndarray] = []
    leftovers: list[np.ndarray] = []  # positions into vids that spilled

    counts = np.bincount(slab, minlength=s_slabs)
    start = 0
    for s in range(s_slabs):
        sel = order[start : start + counts[s]]
        start += counts[s]
        fit_in = sel[inwin_all[sel]]
        fit_out = sel[~inwin_all[sel]]
        # in-window edges first (kernel path); they MUST live in their slab
        kept = fit_in[:cap]
        spill_in = fit_in[cap:]  # extremely full slab: route to overflow
        base = s * cap
        perm[base : base + len(kept)] = vids[kept]
        inwin[base : base + len(kept)] = True
        rest = np.arange(base + len(kept), base + cap)
        free_slots.append(rest)
        leftovers.append(np.concatenate([fit_out, spill_in]))

    free = np.concatenate(free_slots) if free_slots else np.zeros(0, np.int64)
    left = np.concatenate(leftovers) if leftovers else np.zeros(0, np.int64)
    if len(left) > len(free):  # can't happen: total capacity checked above
        msg = f"internal: {len(left)} overflow edges > {len(free)} free slots"
        raise SlabLayoutError(msg)
    if len(left) > spec.overflow_cap:
        msg = (
            f"{len(left)} overflow edges exceed overflow_cap="
            f"{spec.overflow_cap}; raise overflow_cap or improve node ordering"
        )
        raise SlabLayoutError(msg)
    slots = free[: len(left)]
    perm[slots] = vids[left]
    overflow_slots = slots

    # local indices for the kernel (don't-care 0 on non-inwin slots)
    slot_slab = np.arange(e_pad) // cap
    dstloc = np.where(inwin, dst[np.maximum(perm, 0)] - slot_slab * w, 0)
    srcloc = np.where(inwin, src[np.maximum(perm, 0)] - (slot_slab - 1) * w, 0)

    of_pos = np.full(spec.overflow_cap, e_pad, dtype=np.int64)  # E_pad = drop
    of_pos[: len(overflow_slots)] = overflow_slots
    of_mask = np.zeros(spec.overflow_cap, dtype=bool)
    of_mask[: len(overflow_slots)] = True

    return {
        "perm": perm,
        "dstloc": dstloc.astype(np.int32),
        "srcloc": srcloc.astype(np.int32),
        "inwin": inwin,
        "of_pos": of_pos.astype(np.int32),
        "of_mask": of_mask,
        "n_overflow": np.asarray(len(overflow_slots)),
    }


def apply_slab_layout(graph, spec: SlabLayoutSpec | None = None):
    """Re-lay out an :class:`~gnn_tracking_tpu.graphs.EventGraph`'s edges into
    slab order and attach the kernel metadata under ``extras``.

    The result is a normal EventGraph (dst-sorted, padded edges masked) whose
    ``extras`` carry ``slab_dstloc``, ``slab_srcloc``, ``slab_inwin``,
    ``slab_of_pos``, ``slab_of_mask``. Models opt in via
    ``segment_impl="fused"``.
    """
    import jax.numpy as jnp

    src = np.asarray(graph.edge_index[0])
    dst = np.asarray(graph.edge_index[1])
    valid = np.asarray(graph.edge_mask)
    n = graph.num_nodes
    if spec is None:
        spec = default_spec(n, int(valid.sum()))
    part = slab_partition(src, dst, valid, n, spec)
    perm = part["perm"]
    take = np.maximum(perm, 0)
    pad = perm < 0
    e_pad = len(perm)

    new_src = np.where(pad, 0, src[take])
    # padding edges keep the layout dst-sorted AND inside their slab
    slot_slab = np.arange(e_pad) // spec.slab_capacity
    pad_dst = np.minimum((slot_slab + 1) * spec.window, n) - 1
    new_dst = np.where(pad, pad_dst, dst[take])
    new_ei = np.stack([new_src, new_dst]).astype(np.int32)

    def _edge_rows(arr):
        a = np.asarray(arr)
        out = a[take]
        out[pad] = 0
        return out

    extras = dict(graph.extras)
    extras.update(
        slab_dstloc=jnp.asarray(part["dstloc"]),
        slab_srcloc=jnp.asarray(part["srcloc"]),
        slab_inwin=jnp.asarray(part["inwin"]),
        slab_of_pos=jnp.asarray(part["of_pos"]),
        slab_of_mask=jnp.asarray(part["of_mask"]),
    )
    return graph.replace(
        edge_index=jnp.asarray(new_ei),
        edge_attr=jnp.asarray(_edge_rows(graph.edge_attr)),
        y=jnp.asarray(_edge_rows(graph.y)),
        edge_mask=jnp.asarray(~pad & np.asarray(graph.edge_mask)[take]),
        extras=extras,
    )


# NOTE on sortedness: overflow edges occupy arbitrary free slots with their
# REAL (src, dst), so a laid-out graph is only *mostly* dst-sorted. Consumers
# must not pass indices_are_sorted=True for fused-layout graphs unless the
# overflow list is empty; the fused kernel itself never relies on the global
# hint (in-window slots are exactly slab-local by construction).


def flat_slab_partition(
    src: np.ndarray,
    dst: np.ndarray,
    valid: np.ndarray,
    n_nodes: int,
    spec: SlabLayoutSpec,
    blocks_cap: int | None = None,
) -> dict[str, np.ndarray]:
    """Flat-block slab layout: variable blocks per slab, fill ~0.97.

    The fixed ``cmax``-chunks-per-slab layout (:func:`slab_partition`) pays
    ``slack``x padding on every slab (fill 1/slack ≈ 0.66 at the default
    1.5), and the padding inflates every downstream ``[E_pad, ·]`` edge op —
    the round-2 battery measured the fused EC step losing to XLA on exactly
    this overhead. Here each slab gets ``ceil(count_s / EB)`` blocks (≥ 1 so
    every aggregation window is visited and zeroed), blocks are concatenated
    slab-ascending, and a per-block ``block_slab`` stream drives the
    kernel's dynamic index maps (scalar prefetch). ``E_pad ≈ E + S·EB/2``.

    Same slot semantics as :func:`slab_partition` (``perm``/``dstloc``/
    ``srcloc``/``inwin``/overflow); adds ``block_slab [n_blocks] i32``.
    ``blocks_cap`` pads the block list to a static size for bucketing
    (extra all-padding blocks are appended to the last slab).
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    valid = np.asarray(valid).astype(bool)
    w, eb = spec.window, spec.block_e
    s_slabs = max(-(-n_nodes // w), 1)

    vids = np.nonzero(valid)[0]
    vsrc, vdst = src[vids], dst[vids]
    slab = vdst // w
    srcloc_all = vsrc - (slab - 1) * w
    inwin_all = (srcloc_all >= 0) & (srcloc_all < 3 * w)

    order = np.argsort(vdst, kind="stable")
    counts = np.bincount(slab, minlength=s_slabs)

    n_in = int(inwin_all.sum())
    blocks_per_slab = np.maximum(
        -(-np.bincount(slab[inwin_all], minlength=s_slabs) // eb), 1
    )
    n_blocks = int(blocks_per_slab.sum())
    if blocks_cap is not None:
        if n_blocks > blocks_cap:
            msg = (
                f"{n_blocks} blocks exceed blocks_cap={blocks_cap} "
                f"({n_in} in-window edges, {s_slabs} slabs x EB {eb})"
            )
            raise SlabLayoutError(msg)
        blocks_per_slab[-1] += blocks_cap - n_blocks
        n_blocks = blocks_cap
    e_pad = n_blocks * eb
    block_starts = np.concatenate([[0], np.cumsum(blocks_per_slab)])[:-1] * eb

    perm = np.full(e_pad, -1, dtype=np.int64)
    inwin = np.zeros(e_pad, dtype=bool)
    block_slab = np.repeat(np.arange(s_slabs), blocks_per_slab).astype(np.int32)

    leftovers: list[np.ndarray] = []
    free_slots: list[np.ndarray] = []
    start = 0
    for s in range(s_slabs):
        sel = order[start : start + counts[s]]
        start += counts[s]
        fit_in = sel[inwin_all[sel]]
        fit_out = sel[~inwin_all[sel]]
        cap_s = blocks_per_slab[s] * eb
        kept = fit_in[:cap_s]  # ceil sizing: only blocks_cap can truncate
        spill_in = fit_in[cap_s:]
        base = block_starts[s]
        perm[base : base + len(kept)] = vids[kept]
        inwin[base : base + len(kept)] = True
        free_slots.append(np.arange(base + len(kept), base + cap_s))
        leftovers.append(np.concatenate([fit_out, spill_in]))

    free = np.concatenate(free_slots) if free_slots else np.zeros(0, np.int64)
    left = np.concatenate(leftovers) if leftovers else np.zeros(0, np.int64)
    if len(left) > len(free):
        msg = (
            f"{len(left)} overflow edges exceed {len(free)} free slots; "
            "raise blocks_cap (or improve node ordering)"
        )
        raise SlabLayoutError(msg)
    if len(left) > spec.overflow_cap:
        msg = (
            f"{len(left)} overflow edges exceed overflow_cap="
            f"{spec.overflow_cap}; raise overflow_cap or improve node ordering"
        )
        raise SlabLayoutError(msg)
    slots = free[: len(left)]
    perm[slots] = vids[left]

    slot_slab = np.repeat(block_slab, eb).astype(np.int64)
    dstloc = np.where(inwin, dst[np.maximum(perm, 0)] - slot_slab * w, 0)
    srcloc = np.where(inwin, src[np.maximum(perm, 0)] - (slot_slab - 1) * w, 0)

    of_pos = np.full(spec.overflow_cap, e_pad, dtype=np.int64)
    of_pos[: len(slots)] = slots
    of_mask = np.zeros(spec.overflow_cap, dtype=bool)
    of_mask[: len(slots)] = True

    return {
        "perm": perm,
        "dstloc": dstloc.astype(np.int32),
        "srcloc": srcloc.astype(np.int32),
        "inwin": inwin,
        "block_slab": block_slab,
        "of_pos": of_pos.astype(np.int32),
        "of_mask": of_mask,
        "n_overflow": np.asarray(len(slots)),
    }


def flat_blocks_cap(
    n_nodes: int, n_edges: int, spec: SlabLayoutSpec, slack: float = 1.05
) -> int:
    """Static block budget for a padding bucket (flat layout)."""
    s = spec.num_slabs(n_nodes)
    return int(np.ceil(n_edges * slack / spec.block_e)) + s


def apply_flat_slab_layout(graph, spec: SlabLayoutSpec | None = None,
                           blocks_cap: int | None = None):
    """Flat-block variant of :func:`apply_slab_layout`; adds the
    ``slab_block_slab`` extras stream consumed by ``fused_relational_flat``."""
    import jax.numpy as jnp

    src = np.asarray(graph.edge_index[0])
    dst = np.asarray(graph.edge_index[1])
    valid = np.asarray(graph.edge_mask)
    n = graph.num_nodes
    if spec is None:
        spec = default_spec(n, int(valid.sum()))
    if blocks_cap is None:
        blocks_cap = flat_blocks_cap(n, int(valid.sum()), spec)
    part = flat_slab_partition(src, dst, valid, n, spec, blocks_cap=blocks_cap)
    perm = part["perm"]
    take = np.maximum(perm, 0)
    pad = perm < 0
    e_pad = len(perm)

    new_src = np.where(pad, 0, src[take])
    slot_slab = np.repeat(part["block_slab"], spec.block_e).astype(np.int64)
    pad_dst = np.minimum((slot_slab + 1) * spec.window, n) - 1
    new_dst = np.where(pad, pad_dst, dst[take])
    new_ei = np.stack([new_src, new_dst]).astype(np.int32)

    def _edge_rows(arr):
        a = np.asarray(arr)
        out = a[take]
        out[pad] = 0
        return out

    extras = dict(graph.extras)
    extras.update(
        slab_dstloc=jnp.asarray(part["dstloc"]),
        slab_srcloc=jnp.asarray(part["srcloc"]),
        slab_inwin=jnp.asarray(part["inwin"]),
        slab_block_slab=jnp.asarray(part["block_slab"]),
        slab_of_pos=jnp.asarray(part["of_pos"]),
        slab_of_mask=jnp.asarray(part["of_mask"]),
    )
    return graph.replace(
        edge_index=jnp.asarray(new_ei),
        edge_attr=jnp.asarray(_edge_rows(graph.edge_attr)),
        y=jnp.asarray(_edge_rows(graph.y)),
        edge_mask=jnp.asarray(~pad & np.asarray(graph.edge_mask)[take]),
        extras=extras,
    )
