"""Pallas TPU kernel: segment-sum over dst-sorted edges as windowed one-hot
matmuls — the scatter-free aggregation path.

Profiling (scripts/tpu_experiments.py) shows the EC step is dominated by
XLA's scatter/gather lowering of segment ops (~90ms of a 106ms step at 32-wide
features). With edges sorted by target, each contiguous edge block touches a
bounded window of consecutive target nodes, so the scatter becomes

    out[w0 : w0 + W] += onehot(dst - w0)ᵀ @ messages_block

— an MXU matmul instead of a serialized scatter. The backward of segment-sum
(a gather of cotangents at dst) is the transposed matmul, wired via
custom_vjp.

Requirement: within every ``block_e``-edge block, ``max(dst) - min(dst) <
window`` (true for graphs with bounded degree skew; the host-side
``max_window_spread`` check validates, and ``ops.segment`` is the fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl



def max_window_spread(dst: np.ndarray, block_e: int) -> int:
    """Host-side check: max dst spread within any edge block."""
    dst = np.asarray(dst)
    pad = (-len(dst)) % block_e
    dst = np.concatenate([dst, np.full(pad, dst[-1] if len(dst) else 0)])
    blocks = dst.reshape(-1, block_e)
    return int((blocks.max(axis=1) - blocks.min(axis=1)).max() + 1)


def _fwd_kernel(dst_ref, msgs_ref, out_ref, *, window: int, n_nodes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dst = dst_ref[:]  # [EB] int32 (this block)
    msgs = msgs_ref[:]  # [EB, F]
    w0 = jnp.minimum(jnp.min(dst), n_nodes - window)
    w0 = jnp.maximum(w0, 0)
    local = dst - w0  # [EB] in [0, window)
    eb = dst.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (eb, window), 1) == local[:, None]
    ).astype(msgs.dtype)
    contrib = jax.lax.dot_general(
        onehot,
        msgs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [window, F]
    out_ref[pl.ds(w0, window), :] += contrib.astype(out_ref.dtype)


def _bwd_kernel(dst_ref, grad_ref, out_ref, *, window: int, n_nodes: int):
    dst = dst_ref[:]
    w0 = jnp.minimum(jnp.min(dst), n_nodes - window)
    w0 = jnp.maximum(w0, 0)
    local = dst - w0
    eb = dst.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (eb, window), 1) == local[:, None]
    ).astype(grad_ref.dtype)
    g_win = grad_ref[pl.ds(w0, window), :]  # [window, F]
    out_ref[:] = jax.lax.dot_general(
        onehot,
        g_win,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
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


def _resolve_interpret(interpret):
    # Mosaic only exists on TPU; interpret elsewhere (tests, CPU meshes)
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd(messages, dst, num_nodes, block_e, window, interpret):
    interpret = _resolve_interpret(interpret)
    window = min(window, num_nodes)
    e, f = messages.shape
    assert e % block_e == 0, (e, block_e)
    grid = (e // block_e,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, window=window, n_nodes=num_nodes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e,), lambda i: (i,)),
            pl.BlockSpec((block_e, f), lambda i: (i, 0)),
        ],
        # full output resident across the sequential grid (revisited block)
        out_specs=pl.BlockSpec((num_nodes, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_nodes, f), jnp.float32),
        interpret=interpret,
    )(dst, messages)
    return out.astype(messages.dtype)


def _fwd_rule(messages, dst, num_nodes, block_e, window, interpret):
    return _fwd(messages, dst, num_nodes, block_e, window, interpret), dst


def _bwd_rule(num_nodes, block_e, window, interpret, dst, g):
    interpret = _resolve_interpret(interpret)
    window = min(window, num_nodes)
    e = dst.shape[0]
    f = g.shape[1]
    grid = (e // block_e,)
    grad_msgs = pl.pallas_call(
        functools.partial(_bwd_kernel, window=window, n_nodes=num_nodes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e,), lambda i: (i,)),
            pl.BlockSpec((num_nodes, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_e, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, f), g.dtype),
        interpret=interpret,
    )(dst, g)
    return grad_msgs, None


sorted_segment_sum.defvjp(_fwd_rule, _bwd_rule)


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
    return _gather_fwd(values, dst, block_e, window, interpret)


def _gather_fwd(values, dst, block_e, window, interpret):
    interpret = _resolve_interpret(interpret)
    window = min(window, values.shape[0])
    e = dst.shape[0]
    f = values.shape[1]
    n = values.shape[0]
    grid = (e // block_e,)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, window=window, n_nodes=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e,), lambda i: (i,)),
            pl.BlockSpec((n, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_e, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((e, f), values.dtype),
        interpret=interpret,
    )(dst, values)
    return out


def _gather_fwd_rule(values, dst, block_e, window, interpret):
    return _gather_fwd(values, dst, block_e, window, interpret), (
        dst,
        values.shape[0],
    )


def _gather_bwd_rule(block_e, window, interpret, res, g):
    dst, n = res
    grad_values = _fwd(g, dst, n, block_e, window, interpret).astype(g.dtype)
    return grad_values, None


sorted_gather.defvjp(_gather_fwd_rule, _gather_bwd_rule)
