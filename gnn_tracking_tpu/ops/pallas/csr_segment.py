"""Pallas TPU kernel: segment-sum over dst-sorted edges as windowed one-hot
matmuls — the scatter-free aggregation path.

Profiling (scripts/tpu_experiments.py) shows the EC step spends most of its
time in XLA's scatter/gather lowering of segment ops. With edges sorted by
target, each contiguous edge block touches a bounded window of consecutive
target nodes, so the scatter becomes a one-hot matmul on the MXU.

Mosaic-compatibility notes (learned on real hardware): revisited output
blocks with dynamic-slice read-modify-write miscompile, so the forward
emits **slab-aligned per-block partials** instead: each edge block writes a
``[2·window, F]`` partial anchored at an aligned slab boundary, and a tiny
XLA segment-sum over ``2·n_blocks`` slabs combines them. The backward of
segment-sum (gather of cotangents at dst) reads a dynamic window — plain
input reads, no RMW.

Requirement: within every ``block_e``-edge block,
``max(dst) - floor(min(dst)/window)*window < 2*window`` (true whenever the
per-block dst spread is < window; validated by ``max_window_spread``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def max_window_spread(dst: np.ndarray, block_e: int) -> int:
    """Host-side check: max dst spread within any edge block."""
    dst = np.asarray(dst)
    pad = (-len(dst)) % block_e
    dst = np.concatenate([dst, np.full(pad, dst[-1] if len(dst) else 0)])
    blocks = dst.reshape(-1, block_e)
    return int((blocks.max(axis=1) - blocks.min(axis=1)).max() + 1)


def validate_pallas_segment(
    graph, *, block_e: int = 1024, window: int = 1024
) -> None:
    """Host-side guard for ``segment_impl='pallas_sorted'``: edges must be
    dst-sorted, edge count divisible by the block size, and every block's dst
    spread must fit the window — otherwise contributions are silently
    dropped. Raise before training, not after."""
    dst = np.asarray(graph.edge_index)[1]
    if len(dst) % block_e != 0:
        msg = f"edge count {len(dst)} not divisible by block_e={block_e}"
        raise ValueError(msg)
    if (np.diff(dst) < 0).any():
        msg = "edges are not sorted by target; call sort_edges_by_target()"
        raise ValueError(msg)
    spread = max_window_spread(dst, block_e)
    if spread > window:
        msg = (
            f"per-block dst spread {spread} exceeds window {window}; "
            "increase window or fall back to segment_impl='xla'"
        )
        raise ValueError(msg)


def _fwd_kernel(w0_all_ref, dst_ref, msgs_ref, partial_ref, *, window: int):
    dst = dst_ref[:]  # [EB] int32 (this block)
    # f32 compute regardless of input dtype: exact accumulation, and bf16
    # one-hot matmuls ICE the Mosaic compiler
    msgs = msgs_ref[:].astype(jnp.float32)  # [EB, F]
    w0 = w0_all_ref[pl.program_id(0)]  # slab anchor (scalar prefetch, SMEM)
    local = dst - w0  # in [0, 2*window) given bounded spread
    eb = dst.shape[0]
    # transposed one-hot [2*window, EB]: the canonical (lhs last dim × rhs
    # first dim) MXU contraction orientation
    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (2 * window, eb), 0)
        == local[None, :]
    ).astype(msgs.dtype)
    # HIGHEST precision: the MXU truncates f32 operands to bf16 by
    # default (~1e-2 relative error on the aggregated messages — observed as
    # a hardware-only "mismatch" vs XLA's exact f32 segment-sum)
    partial_ref[0] = jax.lax.dot_general(
        onehot_t,
        msgs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(partial_ref.dtype)  # [2*window, F]


def _gather_kernel(w0_all_ref, dst_ref, values_ref, out_ref, *, window: int):
    """values[dst] for a dst-sorted block via windowed one-hot matmul."""
    dst = dst_ref[:]
    w0 = w0_all_ref[pl.program_id(0)]
    local = dst - w0
    eb = dst.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (eb, 2 * window), 1) == local[:, None]
    ).astype(jnp.float32)
    vals_win = values_ref[pl.ds(w0, 2 * window), :].astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        onehot,
        vals_win,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)


def _resolve_interpret(interpret):
    # Mosaic only exists on TPU; interpret elsewhere (tests, CPU meshes)
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_nodes(n_nodes: int, window: int) -> int:
    # room for the last slab's +window overhang
    return (-(-n_nodes // window) + 1) * window


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sorted_segment_sum(
    messages: jax.Array,
    dst: jax.Array,
    num_nodes: int,
    block_e: int = 1024,
    window: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """Segment-sum of dst-sorted messages via windowed one-hot matmuls.

    ``messages`` [E, F] (masked entries must already be zeroed), ``dst`` [E]
    non-decreasing int32. Returns [num_nodes, F].
    """
    return _fwd(messages, dst, num_nodes, block_e, window, interpret)


def _fwd(messages, dst, num_nodes, block_e, window, interpret):
    interpret = _resolve_interpret(interpret)
    window = min(window, num_nodes)
    e, f = messages.shape
    assert e % block_e == 0, (e, block_e)
    n_blocks = e // block_e
    n_pad = _pad_nodes(num_nodes, window)
    n_slabs = n_pad // window
    # slab anchors computed outside the kernel (rank-1 outputs of width 1
    # violate Mosaic's lane-tiling constraints)
    slabs = jnp.clip(
        dst.reshape(n_blocks, block_e).min(axis=1) // window, 0, n_slabs - 2
    ).astype(jnp.int32)
    w0s = slabs * window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_e,), lambda i, w: (i,)),
            pl.BlockSpec((block_e, f), lambda i, w: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * window, f), lambda i, w: (i, 0, 0)),
    )
    partials = pl.pallas_call(
        functools.partial(_fwd_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 2 * window, f), jnp.float32),
        interpret=interpret,
    )(w0s, dst, messages)
    # combine: 2 aligned slabs per block, summed by slab index (tiny scatter
    # over 2*n_blocks items instead of E rows)
    slab_parts = partials.reshape(n_blocks * 2, window, f)
    slab_ids = jnp.stack([slabs, slabs + 1], axis=1).reshape(-1)
    n_slabs = n_pad // window
    out = jax.ops.segment_sum(slab_parts, slab_ids, num_segments=n_slabs)
    return out.reshape(n_slabs * window, f)[:num_nodes].astype(messages.dtype)


def _fwd_rule(messages, dst, num_nodes, block_e, window, interpret):
    return _fwd(messages, dst, num_nodes, block_e, window, interpret), dst


def _bwd_rule(num_nodes, block_e, window, interpret, dst, g):
    grad_msgs = _gather(g, dst, block_e, window, interpret)
    return grad_msgs, None


sorted_segment_sum.defvjp(_fwd_rule, _bwd_rule)


def _gather(values, dst, block_e, window, interpret):
    interpret = _resolve_interpret(interpret)
    num_nodes = values.shape[0]
    window = min(window, num_nodes)
    e = dst.shape[0]
    f = values.shape[1]
    n_pad = _pad_nodes(num_nodes, window)
    n_blocks = e // block_e
    n_slabs = n_pad // window
    slabs = jnp.clip(
        dst.reshape(n_blocks, block_e).min(axis=1) // window, 0, n_slabs - 2
    ).astype(jnp.int32)
    w0s = slabs * window
    values_p = jnp.pad(values, ((0, n_pad - num_nodes), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_e,), lambda i, w: (i,)),
            pl.BlockSpec((n_pad, f), lambda i, w: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_e, f), lambda i, w: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, f), values.dtype),
        interpret=interpret,
    )(w0s, dst, values_p)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_gather(
    values: jax.Array,
    dst: jax.Array,
    block_e: int = 1024,
    window: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """``values[dst]`` for non-decreasing ``dst`` via windowed one-hot
    matmuls — the dual of `sorted_segment_sum` (its backward IS the segment
    sum, and vice versa). values [N, F], dst [E] → [E, F]."""
    return _gather(values, dst, block_e, window, interpret)


def _gather_fwd_rule(values, dst, block_e, window, interpret):
    return _gather(values, dst, block_e, window, interpret), (dst, values.shape[0])


def _gather_bwd_rule(block_e, window, interpret, res, g):
    dst, n = res
    grad_values = _fwd(g, dst, n, block_e, window, interpret).astype(g.dtype)
    return grad_values, None


sorted_gather.defvjp(_gather_fwd_rule, _gather_bwd_rule)
