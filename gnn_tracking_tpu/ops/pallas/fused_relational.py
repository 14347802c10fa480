"""Fused gather→relational-MLP→segment-add Pallas kernel.

The interaction network's per-edge pipeline (reference
``models/interaction_network.py:54-103``: PyG gather, 3-layer relational MLP,
scatter-add) is the EC train step's hot loop. The XLA path materializes every
``[E, ·]`` intermediate in HBM and lowers the scatter serially, leaving the
step HBM-bound at ~3% MFU. This kernel keeps the whole edge pipeline in VMEM:

* grid ``(S, Cmax)`` over destination slabs × edge chunks
  (``slab_layout.py`` layout);
* endpoint gathers and the destination scatter are windowed one-hot matmuls
  on the MXU (bf16 one-hot x bf16 payload with f32 accumulation — exact for
  bf16 data, single pass);
* the 3 MLP layers run on the chunk in VMEM; the first layer is computed as
  three split matmuls (no in-kernel concat);
* the aggregation accumulates into the slab's revisited output block
  (full-block static read-modify-write — the Mosaic-safe accumulation
  pattern) so there is no partial/combine pass;
* the backward recomputes the forward from inputs (flash-attention style):
  no ``[E, H]`` residuals ever reach HBM. Weight gradients accumulate in
  constantly-revisited f32 blocks across the whole grid.

Out-of-window edges (source beyond the ``3W`` halo, or an over-full slab)
are evaluated by a plain XLA branch over the fixed-capacity overflow list
(see ``slab_layout.py``) and added outside the kernel; that branch is
ordinary differentiable JAX, so the custom VJP here only covers the dense
in-window part.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: row-mask lowering variant: "diag" (MXU diagonal matmul — default),
#: "reshape" (lane->sublane relayout; produced wrong results on hardware
#: in the round-2 battery, kept for bisection), "none" (debug, no mask).
MASK_IMPL = "diag"


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _onehot_t(idx_row, rows, cols, dtype):
    """Transposed one-hot: ``oh[n, e] = (n == idx[0, e])``.

    ``idx_row`` is a ``[1, E]`` i32 block — the index streams are shipped as
    2-D ``[n_blocks, block_e]`` arrays because Mosaic rejects rank-1 s32
    operands whose block shape disagrees with XLA's 1-D tiling (T(1024) vs
    T(512) layout-verification failure, seen on hardware). Keeping the index
    dim in lanes means no in-kernel transpose: gathers contract the one-hot's
    row axis (``transpose_a``), scatters contract its column axis.
    """
    it = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    return (it == idx_row).astype(dtype)


def _tile_row(ref, flat):
    """Select row ``flat % 8`` of an ``[8, eb]`` index tile as ``[1, eb]``.

    Pallas TPU block shapes need sublane counts divisible by 8, so per-edge
    streams ride as 8-row tiles (block index ``flat // 8``); each grid step
    extracts its own row with an iota compare + sublane reduce.
    """
    tile = ref[:]
    rsel = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0) == flat % 8
    return jnp.sum(jnp.where(rsel, tile, jnp.zeros_like(tile)), axis=0,
                   keepdims=True)


def _row_scale(et, inw_row, dtype):
    """``et * inw[e]`` per edge row, as a diagonal-matmul: no relayout.

    ``inw_row`` is ``[1, eb]`` (lanes); scaling ``et [eb, F]`` per row needs
    the mask along sublanes. A ``reshape(eb, 1)`` is a lane→sublane
    relayout, which is a suspect construct on hardware; the MXU route is
    unambiguous: ``D = diag(inw)`` built from a 2-D iota equality (inw
    broadcasts along rows), then ``D @ et``. Cost ``eb²·F`` MACs per block —
    small next to the MLP.
    """
    eb = et.shape[0]
    i0 = jax.lax.broadcasted_iota(jnp.int32, (eb, eb), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (eb, eb), 1)
    diag = jnp.where(i0 == i1, jnp.broadcast_to(inw_row, (eb, eb)), 0.0)
    return _mxu(diag.astype(dtype), et.astype(dtype))


def _mxu(a, b, transpose_a=False, transpose_b=False):
    """Matmul with f32 accumulation on the MXU, no operand transposition
    materialized (dot_general contraction picks the axes).

    For f32 operands the MXU's default precision truncates them to bf16
    (~1% rel err — the round-1 csr_segment lesson); f32 compute is the
    exactness-testing path, so it pays for HIGHEST. bf16 operands are
    already exact at default precision with f32 accumulation.
    """
    ca = 0 if transpose_a else 1
    cb = 1 if transpose_b else 0
    precision = (
        jax.lax.Precision.HIGHEST
        if a.dtype == jnp.float32 or b.dtype == jnp.float32
        else None
    )
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _gather3(sl, xw0, xw1, xw2, w, eb, dtype):
    """x[src] for srcloc in [0, 3W) from three W-row windows.

    ``sl`` is ``[1, eb]``; each term contracts the one-hot's window axis so
    the result is ``[eb, Fx]`` without materializing any transpose.
    """
    out = _mxu(_onehot_t(sl, w, eb, dtype), xw0, transpose_a=True)
    out += _mxu(_onehot_t(sl - w, w, eb, dtype), xw1, transpose_a=True)
    out += _mxu(_onehot_t(sl - 2 * w, w, eb, dtype), xw2, transpose_a=True)
    return out


def _mlp_fwd(gdst, gsrc, ea, ws, dtype):
    """relu((concat @ W1)+b1) → relu(@W2+b2) → @W3+b3, concat-free.

    Also returns the ReLU masks, taken on the f32 pre-activations: Mosaic
    has no bf16 vector ``cmpf`` on v5e, and casting the bf16 activations
    back to f32 for the comparison re-materializes the pre-cast f32 value
    into the following matmul (mixed f32×bf16 ``tpu.matmul`` = compile
    error). Masks straight off the f32 accumulators avoid both.
    """
    w1d, w1s, w1e, b1, w2, b2, w3, b3 = ws
    pre1 = _mxu(gdst.astype(dtype), w1d)
    pre1 += _mxu(gsrc.astype(dtype), w1s)
    pre1 += _mxu(ea, w1e)
    pre1 = pre1 + b1.astype(jnp.float32)
    m1 = pre1 > 0.0
    h1 = jnp.maximum(pre1, 0.0).astype(dtype)
    pre2 = _mxu(h1, w2) + b2.astype(jnp.float32)
    m2 = pre2 > 0.0
    h2 = jnp.maximum(pre2, 0.0).astype(dtype)
    et = _mxu(h2, w3) + b3.astype(jnp.float32)
    return h1, h2, et, m1, m2


def _fwd_kernel(
    ea_ref, sl_ref, dl_ref, inw_ref,
    xw0_ref, xw1_ref, xw2_ref,
    w1d_ref, w1s_ref, w1e_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    eout_ref, agg_ref,
    *, w: int, cmax: int, dtype, mask_impl: str = "diag",
):
    eb = ea_ref.shape[0]
    flat = pl.program_id(0) * cmax + pl.program_id(1)
    sl = _tile_row(sl_ref, flat)  # [1, eb]
    dl = _tile_row(dl_ref, flat)
    inw = _tile_row(inw_ref, flat).astype(jnp.float32)  # [1, eb]

    gsrc = _gather3(sl, xw0_ref[:], xw1_ref[:], xw2_ref[:], w, eb, dtype)
    oh_dl = _onehot_t(dl, w, eb, dtype)  # [w, eb]
    gdst = _mxu(oh_dl, xw1_ref[:], transpose_a=True)
    ws = (
        w1d_ref[:], w1s_ref[:], w1e_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
    )
    _, _, et, _, _ = _mlp_fwd(gdst, gsrc, ea_ref[:], ws, dtype)
    if mask_impl == "reshape":
        et = et * inw.reshape(eb, 1)
    elif mask_impl == "diag":
        et = _row_scale(et, inw, dtype)
    # "none": debug only — no masking
    eout_ref[:] = et.astype(eout_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        agg_ref[:] = jnp.zeros_like(agg_ref)

    agg_ref[:] += _mxu(oh_dl, et.astype(dtype))


def _bwd_kernel(
    ea_ref, sl_ref, dl_ref, inw_ref,
    xw0_ref, xw1_ref, xw2_ref,
    w1d_ref, w1s_ref, w1e_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    geout_ref, gagg_ref,
    gea_ref, gxd_ref, gxs_ref,
    gw1d_ref, gw1s_ref, gw1e_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref,
    *, w: int, cmax: int, dtype, mask_impl: str = "diag",
):
    eb = ea_ref.shape[0]
    flat = pl.program_id(0) * cmax + pl.program_id(1)
    sl = _tile_row(sl_ref, flat)  # [1, eb]
    dl = _tile_row(dl_ref, flat)
    inw = _tile_row(inw_ref, flat).astype(jnp.float32)  # [1, eb]

    # --- recompute forward ---
    gsrc = _gather3(sl, xw0_ref[:], xw1_ref[:], xw2_ref[:], w, eb, dtype)
    oh_dl = _onehot_t(dl, w, eb, dtype)  # [w, eb]
    gdst = _mxu(oh_dl, xw1_ref[:], transpose_a=True)
    ws = (
        w1d_ref[:], w1s_ref[:], w1e_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
    )
    h1, h2, _, m1, m2 = _mlp_fwd(gdst, gsrc, ea_ref[:], ws, dtype)

    # --- cotangent of the raw MLP output ---
    # fwd: e_out = et*inw; agg += onehot(dl) @ (et*inw)
    g_et = geout_ref[:].astype(jnp.float32)
    g_et += _mxu(oh_dl, gagg_ref[:].astype(dtype), transpose_a=True)
    if mask_impl == "reshape":
        g_et = (g_et * inw.reshape(eb, 1)).astype(dtype)
    elif mask_impl == "diag":
        g_et = _row_scale(g_et, inw, dtype).astype(dtype)
    else:
        g_et = g_et.astype(dtype)

    g_h2 = (_mxu(g_et, w3_ref[:], transpose_b=True) * m2).astype(dtype)
    g_h1 = (_mxu(g_h2, w2_ref[:], transpose_b=True) * m1).astype(dtype)
    g_gdst = _mxu(g_h1, w1d_ref[:], transpose_b=True).astype(dtype)
    g_gsrc = _mxu(g_h1, w1s_ref[:], transpose_b=True).astype(dtype)
    gea_ref[:] = _mxu(g_h1, w1e_ref[:], transpose_b=True).astype(gea_ref.dtype)

    # --- node grads: windowed one-hot scatters ---
    @pl.when(pl.program_id(1) == 0)
    def _():
        gxd_ref[:] = jnp.zeros_like(gxd_ref)
        gxs_ref[:] = jnp.zeros_like(gxs_ref)

    gxd_ref[:] += _mxu(oh_dl, g_gdst)
    for i in range(3):
        oh_s = _onehot_t(sl - i * w, w, eb, dtype)
        gxs_ref[0, pl.ds(i * w, w), :] += _mxu(oh_s, g_gsrc)

    # --- weight grads: f32 accumulators revisited across the whole grid ---
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for r in (gw1d_ref, gw1s_ref, gw1e_ref, gb1_ref, gw2_ref, gb2_ref,
                  gw3_ref, gb3_ref):
            r[:] = jnp.zeros_like(r)

    # gathers return f32 accumulators; cast to the compute dtype so the
    # weight-grad matmuls are single-precision (Mosaic rejects f32×bf16).
    # Exact: a one-hot gather of bf16 data round-trips through f32 losslessly.
    gw1d_ref[:] += _mxu(gdst.astype(dtype), g_h1, transpose_a=True)
    gw1s_ref[:] += _mxu(gsrc.astype(dtype), g_h1, transpose_a=True)
    gw1e_ref[:] += _mxu(ea_ref[:], g_h1, transpose_a=True)
    gb1_ref[:] += jnp.sum(g_h1.astype(jnp.float32), axis=0, keepdims=True)
    gw2_ref[:] += _mxu(h1, g_h2, transpose_a=True)
    gb2_ref[:] += jnp.sum(g_h2.astype(jnp.float32), axis=0, keepdims=True)
    gw3_ref[:] += _mxu(h2, g_et, transpose_a=True)
    gb3_ref[:] += jnp.sum(g_et.astype(jnp.float32), axis=0, keepdims=True)


def _rows8(a):
    """Pad a [nb, eb] stream to a row multiple of 8 (tile granularity)."""
    return jnp.pad(a, ((0, (-a.shape[0]) % 8), (0, 0)))


def _pad_x(x, w, s_slabs):
    n = x.shape[0]
    return jnp.pad(x, ((w, (s_slabs + 1) * w - n), (0, 0)))


def _common_specs(w, f_ea, eb, cmax, shapes):
    """in_specs shared by fwd and bwd (edge streams, x windows, weights)."""
    edge_idx2 = lambda s, c: (s * cmax + c, 0)
    idx_tile = lambda s, c: ((s * cmax + c) // 8, 0)
    const2 = lambda s, c: (0, 0)
    return [
        pl.BlockSpec((eb, f_ea), edge_idx2),  # edge_attr
        # index streams ride as [n_blocks, eb] rows: rank-1 s32 operands hit
        # a Mosaic/XLA layout-verification mismatch on hardware (T(1024) vs
        # block-sized tiling), and sublane-1 blocks violate the (8, 128)
        # block-divisibility rule — so each grid step maps an 8-row tile and
        # selects its own row in-kernel (``_tile_row``).
        pl.BlockSpec((8, eb), idx_tile),  # srcloc
        pl.BlockSpec((8, eb), idx_tile),  # dstloc
        pl.BlockSpec((8, eb), idx_tile),  # inwin
        pl.BlockSpec((w, shapes["fx"]), lambda s, c: (s, 0)),  # x win s-1
        pl.BlockSpec((w, shapes["fx"]), lambda s, c: (s + 1, 0)),  # win s
        pl.BlockSpec((w, shapes["fx"]), lambda s, c: (s + 2, 0)),  # win s+1
        pl.BlockSpec(shapes["w1d"], const2),
        pl.BlockSpec(shapes["w1s"], const2),
        pl.BlockSpec(shapes["w1e"], const2),
        pl.BlockSpec(shapes["b1"], const2),
        pl.BlockSpec(shapes["w2"], const2),
        pl.BlockSpec(shapes["b2"], const2),
        pl.BlockSpec(shapes["w3"], const2),
        pl.BlockSpec(shapes["b3"], const2),
    ]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def fused_relational(
    window: int,
    block_e: int,
    compute_dtype,
    interpret: bool | None,
    x: jax.Array,
    edge_attr: jax.Array,
    srcloc: jax.Array,
    dstloc: jax.Array,
    inwin: jax.Array,
    weights: dict[str, jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """In-window part of one interaction-network edge pipeline.

    Args (all shapes static): ``x [N, Fx]``, ``edge_attr [E_pad, Fe]`` in slab
    layout, ``srcloc``/``dstloc``/``inwin [E_pad]`` from
    :func:`slab_layout.slab_partition`, ``weights`` with keys
    ``w1d/w1s/w1e/b1/w2/b2/w3/b3`` (first layer split by input block:
    ``W1 = [w1d; w1s; w1e]`` over [x_dst, x_src, edge_attr]).

    Returns ``(e_tilde [E_pad, Fo] — zero outside the in-window set,
    agg [N, Fo] — sum of in-window e_tilde at targets)``.
    """
    out, _ = _fwd_impl(
        window, block_e, compute_dtype, interpret,
        x, edge_attr, srcloc, dstloc, inwin, weights,
    )
    return out


def _prep(window, block_e, x, edge_attr, weights, compute_dtype):
    n, fx = x.shape
    e_pad, fe = edge_attr.shape
    s_slabs = -(-n // window)
    cmax = e_pad // (s_slabs * block_e)
    assert s_slabs * cmax * block_e == e_pad, (
        f"edge layout {e_pad} != S({s_slabs}) x Cmax({cmax}) x EB({block_e})"
    )
    cd = compute_dtype
    xp = _pad_x(x.astype(cd), window, s_slabs)
    ea = edge_attr.astype(cd)
    wl = {k: v.astype(cd) for k, v in weights.items()}
    for k in ("b1", "b2", "b3"):
        wl[k] = wl[k].reshape(1, -1)
    shapes = {
        "fx": fx,
        "w1d": wl["w1d"].shape, "w1s": wl["w1s"].shape, "w1e": wl["w1e"].shape,
        "b1": wl["b1"].shape, "w2": wl["w2"].shape, "b2": wl["b2"].shape,
        "w3": wl["w3"].shape, "b3": wl["b3"].shape,
    }
    return n, fx, fe, e_pad, s_slabs, cmax, xp, ea, wl, shapes


def _fwd_impl(window, block_e, compute_dtype, interpret,
              x, edge_attr, srcloc, dstloc, inwin, weights):
    interpret = _resolve_interpret(interpret)
    cd = jnp.dtype(compute_dtype)
    n, fx, fe, e_pad, s_slabs, cmax, xp, ea, wl, shapes = _prep(
        window, block_e, x, edge_attr, weights, cd
    )
    fo = weights["w3"].shape[1]
    sl2 = _rows8(srcloc.reshape(-1, block_e))
    dl2 = _rows8(dstloc.reshape(-1, block_e))
    inw2 = _rows8(inwin.astype(jnp.float32).reshape(-1, block_e))
    kernel = functools.partial(
        _fwd_kernel, w=window, cmax=cmax, dtype=cd, mask_impl=MASK_IMPL
    )
    eout, agg = pl.pallas_call(
        kernel,
        grid=(s_slabs, cmax),
        in_specs=_common_specs(window, fe, block_e, cmax, shapes),
        out_specs=[
            pl.BlockSpec((block_e, fo), lambda s, c: (s * cmax + c, 0)),
            pl.BlockSpec((window, fo), lambda s, c: (s, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, fo), x.dtype),
            jax.ShapeDtypeStruct((s_slabs * window, fo), jnp.float32),
        ],
        interpret=interpret,
    )(
        ea, sl2, dl2, inw2, xp[:, :], xp, xp,
        wl["w1d"], wl["w1s"], wl["w1e"], wl["b1"],
        wl["w2"], wl["b2"], wl["w3"], wl["b3"],
    )
    return (eout, agg[:n].astype(x.dtype)), (x, edge_attr, srcloc, dstloc, inwin, weights)


def _bwd_impl(window, block_e, compute_dtype, interpret, res, cts):
    x, edge_attr, srcloc, dstloc, inwin, weights = res
    g_eout, g_agg = cts
    interpret = _resolve_interpret(interpret)
    cd = jnp.dtype(compute_dtype)
    n, fx, fe, e_pad, s_slabs, cmax, xp, ea, wl, shapes = _prep(
        window, block_e, x, edge_attr, weights, cd
    )
    fo = weights["w3"].shape[1]
    sl2 = _rows8(srcloc.reshape(-1, block_e))
    dl2 = _rows8(dstloc.reshape(-1, block_e))
    inw2 = _rows8(inwin.astype(jnp.float32).reshape(-1, block_e))
    gagg_p = jnp.pad(
        g_agg.astype(cd), ((0, s_slabs * window - n), (0, 0))
    )
    kernel = functools.partial(
        _bwd_kernel, w=window, cmax=cmax, dtype=cd, mask_impl=MASK_IMPL
    )
    h = weights["w2"].shape[0]
    edge_idx2 = lambda s, c: (s * cmax + c, 0)
    const2 = lambda s, c: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(s_slabs, cmax),
        in_specs=_common_specs(window, fe, block_e, cmax, shapes)
        + [
            pl.BlockSpec((block_e, fo), edge_idx2),  # g_eout
            pl.BlockSpec((window, fo), lambda s, c: (s, 0)),  # g_agg window
        ],
        out_specs=[
            pl.BlockSpec((block_e, fe), edge_idx2),  # g_edge_attr
            pl.BlockSpec((window, fx), lambda s, c: (s, 0)),  # g_x dst part
            pl.BlockSpec((1, 3 * window, fx), lambda s, c: (s, 0, 0)),  # src parts
            pl.BlockSpec(shapes["w1d"], const2),
            pl.BlockSpec(shapes["w1s"], const2),
            pl.BlockSpec(shapes["w1e"], const2),
            pl.BlockSpec(shapes["b1"], const2),
            pl.BlockSpec(shapes["w2"], const2),
            pl.BlockSpec(shapes["b2"], const2),
            pl.BlockSpec(shapes["w3"], const2),
            pl.BlockSpec(shapes["b3"], const2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, fe), jnp.float32),
            jax.ShapeDtypeStruct((s_slabs * window, fx), jnp.float32),
            jax.ShapeDtypeStruct((s_slabs, 3 * window, fx), jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1d"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1s"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1e"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b1"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w2"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b2"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w3"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b3"], jnp.float32),
        ],
        interpret=interpret,
    )(
        ea, sl2, dl2, inw2, xp, xp, xp,
        wl["w1d"], wl["w1s"], wl["w1e"], wl["b1"],
        wl["w2"], wl["b2"], wl["w3"], wl["b3"],
        g_eout.astype(cd), gagg_p,
    )
    (g_ea, gxd, gxs_parts, gw1d, gw1s, gw1e, gb1, gw2, gb2, gw3, gb3) = outs

    # combine src partials: slab s's window covers padded slabs [s, s+3)
    # of xp; key each [W, fx] piece by its absolute padded slab.
    pieces = gxs_parts.reshape(s_slabs * 3, window, fx)
    keys = (
        jnp.arange(s_slabs)[:, None] + jnp.arange(3)[None, :]
    ).reshape(-1)
    gxp_src = jax.ops.segment_sum(pieces, keys, num_segments=s_slabs + 2)
    gxp_src = gxp_src.reshape((s_slabs + 2) * window, fx)
    g_x = gxd[:n] + gxp_src[window : window + n]

    g_weights = {
        "w1d": gw1d.astype(weights["w1d"].dtype),
        "w1s": gw1s.astype(weights["w1s"].dtype),
        "w1e": gw1e.astype(weights["w1e"].dtype),
        "b1": gb1[0].astype(weights["b1"].dtype),
        "w2": gw2.astype(weights["w2"].dtype),
        "b2": gb2[0].astype(weights["b2"].dtype),
        "w3": gw3.astype(weights["w3"].dtype),
        "b3": gb3[0].astype(weights["b3"].dtype),
    }
    return (
        g_x.astype(x.dtype),
        g_ea.astype(edge_attr.dtype),
        None,
        None,
        None,
        g_weights,
    )


fused_relational.defvjp(_fwd_impl, _bwd_impl)


def fused_relational_reference(
    x, edge_attr, srcloc, dstloc, inwin, weights, *, window: int, block_e: int
):
    """Plain-XLA reference of the kernel's exact semantics (tests)."""
    n = x.shape[0]
    e_pad = edge_attr.shape[0]
    s_slabs = -(-n // window)
    cmax = e_pad // (s_slabs * block_e)
    slab = jnp.arange(e_pad) // (cmax * block_e)
    src = jnp.clip(srcloc + (slab - 1) * window, 0, n - 1)
    dst = jnp.clip(dstloc + slab * window, 0, n - 1)
    xp = _pad_x(x, window, s_slabs)
    gsrc = xp[srcloc + slab * window]  # == x[src] with halo zero padding
    gdst = x[dst]
    w1 = jnp.concatenate([weights["w1d"], weights["w1s"], weights["w1e"]], 0)
    m = jnp.concatenate([gdst, gsrc, edge_attr], axis=1)
    h1 = jax.nn.relu(m @ w1 + weights["b1"])
    h2 = jax.nn.relu(h1 @ weights["w2"] + weights["b2"])
    et = (h2 @ weights["w3"] + weights["b3"]) * inwin[:, None]
    agg = jax.ops.segment_sum(et, dst, num_segments=n)
    return et, agg


# --- flat-block layout (variable blocks per slab, scalar-prefetched slab ids)


def _first_visit(bs_ref, b):
    """True on a slab's first block (zero the revisited accumulator)."""
    prev = bs_ref[jnp.maximum(b - 1, 0)]
    return (b == 0) | (bs_ref[b] != prev)


def _fwd_kernel_flat(
    bs_ref,
    ea_ref, sl_ref, dl_ref, inw_ref,
    xw0_ref, xw1_ref, xw2_ref,
    w1d_ref, w1s_ref, w1e_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    eout_ref, agg_ref,
    *, w: int, dtype, mask_impl: str = "diag",
):
    eb = ea_ref.shape[0]
    b = pl.program_id(0)
    sl = _tile_row(sl_ref, b)  # [1, eb]
    dl = _tile_row(dl_ref, b)
    inw = _tile_row(inw_ref, b).astype(jnp.float32)

    gsrc = _gather3(sl, xw0_ref[:], xw1_ref[:], xw2_ref[:], w, eb, dtype)
    oh_dl = _onehot_t(dl, w, eb, dtype)
    gdst = _mxu(oh_dl, xw1_ref[:], transpose_a=True)
    ws = (
        w1d_ref[:], w1s_ref[:], w1e_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
    )
    _, _, et, _, _ = _mlp_fwd(gdst, gsrc, ea_ref[:], ws, dtype)
    if mask_impl == "reshape":
        et = et * inw.reshape(eb, 1)
    elif mask_impl == "diag":
        et = _row_scale(et, inw, dtype)
    eout_ref[:] = et.astype(eout_ref.dtype)

    @pl.when(_first_visit(bs_ref, b))
    def _():
        agg_ref[:] = jnp.zeros_like(agg_ref)

    agg_ref[:] += _mxu(oh_dl, et.astype(dtype))


def _bwd_kernel_flat(
    bs_ref,
    ea_ref, sl_ref, dl_ref, inw_ref,
    xw0_ref, xw1_ref, xw2_ref,
    w1d_ref, w1s_ref, w1e_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    geout_ref, gagg_ref,
    gea_ref, gxd_ref, gxs_ref,
    gw1d_ref, gw1s_ref, gw1e_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref,
    *, w: int, dtype, mask_impl: str = "diag",
):
    eb = ea_ref.shape[0]
    b = pl.program_id(0)
    sl = _tile_row(sl_ref, b)
    dl = _tile_row(dl_ref, b)
    inw = _tile_row(inw_ref, b).astype(jnp.float32)

    gsrc = _gather3(sl, xw0_ref[:], xw1_ref[:], xw2_ref[:], w, eb, dtype)
    oh_dl = _onehot_t(dl, w, eb, dtype)
    gdst = _mxu(oh_dl, xw1_ref[:], transpose_a=True)
    ws = (
        w1d_ref[:], w1s_ref[:], w1e_ref[:], b1_ref[:],
        w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:],
    )
    h1, h2, _, m1, m2 = _mlp_fwd(gdst, gsrc, ea_ref[:], ws, dtype)

    g_et = geout_ref[:].astype(jnp.float32)
    g_et += _mxu(oh_dl, gagg_ref[:].astype(dtype), transpose_a=True)
    if mask_impl == "reshape":
        g_et = (g_et * inw.reshape(eb, 1)).astype(dtype)
    elif mask_impl == "diag":
        g_et = _row_scale(g_et, inw, dtype).astype(dtype)
    else:
        g_et = g_et.astype(dtype)

    g_h2 = (_mxu(g_et, w3_ref[:], transpose_b=True) * m2).astype(dtype)
    g_h1 = (_mxu(g_h2, w2_ref[:], transpose_b=True) * m1).astype(dtype)
    g_gdst = _mxu(g_h1, w1d_ref[:], transpose_b=True).astype(dtype)
    g_gsrc = _mxu(g_h1, w1s_ref[:], transpose_b=True).astype(dtype)
    gea_ref[:] = _mxu(g_h1, w1e_ref[:], transpose_b=True).astype(gea_ref.dtype)

    @pl.when(_first_visit(bs_ref, b))
    def _():
        gxd_ref[:] = jnp.zeros_like(gxd_ref)
        gxs_ref[:] = jnp.zeros_like(gxs_ref)

    gxd_ref[:] += _mxu(oh_dl, g_gdst)
    for i in range(3):
        oh_s = _onehot_t(sl - i * w, w, eb, dtype)
        gxs_ref[0, pl.ds(i * w, w), :] += _mxu(oh_s, g_gsrc)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (gw1d_ref, gw1s_ref, gw1e_ref, gb1_ref, gw2_ref, gb2_ref,
                  gw3_ref, gb3_ref):
            r[:] = jnp.zeros_like(r)

    gw1d_ref[:] += _mxu(gdst.astype(dtype), g_h1, transpose_a=True)
    gw1s_ref[:] += _mxu(gsrc.astype(dtype), g_h1, transpose_a=True)
    gw1e_ref[:] += _mxu(ea_ref[:], g_h1, transpose_a=True)
    gb1_ref[:] += jnp.sum(g_h1.astype(jnp.float32), axis=0, keepdims=True)
    gw2_ref[:] += _mxu(h1, g_h2, transpose_a=True)
    gb2_ref[:] += jnp.sum(g_h2.astype(jnp.float32), axis=0, keepdims=True)
    gw3_ref[:] += _mxu(h2, g_et, transpose_a=True)
    gb3_ref[:] += jnp.sum(g_et.astype(jnp.float32), axis=0, keepdims=True)


def _common_specs_flat(w, f_ea, eb, shapes):
    """Flat-grid in_specs: index maps read the prefetched block→slab ids."""
    edge_idx2 = lambda b, bs: (b, 0)
    idx_tile = lambda b, bs: (b // 8, 0)
    const2 = lambda b, bs: (0, 0)
    return [
        pl.BlockSpec((eb, f_ea), edge_idx2),  # edge_attr
        pl.BlockSpec((8, eb), idx_tile),  # srcloc
        pl.BlockSpec((8, eb), idx_tile),  # dstloc
        pl.BlockSpec((8, eb), idx_tile),  # inwin
        pl.BlockSpec((w, shapes["fx"]), lambda b, bs: (bs[b], 0)),  # win s-1
        pl.BlockSpec((w, shapes["fx"]), lambda b, bs: (bs[b] + 1, 0)),  # win s
        pl.BlockSpec((w, shapes["fx"]), lambda b, bs: (bs[b] + 2, 0)),  # s+1
        pl.BlockSpec(shapes["w1d"], const2),
        pl.BlockSpec(shapes["w1s"], const2),
        pl.BlockSpec(shapes["w1e"], const2),
        pl.BlockSpec(shapes["b1"], const2),
        pl.BlockSpec(shapes["w2"], const2),
        pl.BlockSpec(shapes["b2"], const2),
        pl.BlockSpec(shapes["w3"], const2),
        pl.BlockSpec(shapes["b3"], const2),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_relational_flat(
    window: int,
    block_e: int,
    compute_dtype,
    interpret: bool | None,
    x: jax.Array,
    edge_attr: jax.Array,
    srcloc: jax.Array,
    dstloc: jax.Array,
    inwin: jax.Array,
    block_slab: jax.Array,
    weights: dict[str, jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """Flat-block variant of :func:`fused_relational` (fill ~0.97 layout).

    Blocks carry a scalar-prefetched ``block_slab [E_pad/EB] i32`` stream
    (``slab_layout.flat_slab_partition``): all blocks of a slab are
    consecutive, index maps and the aggregation window follow ``bs[b]``,
    and the accumulator zeroes on each slab's first block. Semantics are
    identical to the fixed-``cmax`` kernel at ~1.45x less edge padding.
    """
    out, _ = _fwd_impl_flat(
        window, block_e, compute_dtype, interpret,
        x, edge_attr, srcloc, dstloc, inwin, block_slab, weights,
    )
    return out


def _prep_flat(window, block_e, x, edge_attr, weights, compute_dtype):
    n, fx = x.shape
    e_pad, fe = edge_attr.shape
    s_slabs = -(-n // window)
    assert e_pad % block_e == 0, (e_pad, block_e)
    cd = compute_dtype
    xp = _pad_x(x.astype(cd), window, s_slabs)
    ea = edge_attr.astype(cd)
    wl = {k: v.astype(cd) for k, v in weights.items()}
    for k in ("b1", "b2", "b3"):
        wl[k] = wl[k].reshape(1, -1)
    shapes = {
        "fx": fx,
        "w1d": wl["w1d"].shape, "w1s": wl["w1s"].shape, "w1e": wl["w1e"].shape,
        "b1": wl["b1"].shape, "w2": wl["w2"].shape, "b2": wl["b2"].shape,
        "w3": wl["w3"].shape, "b3": wl["b3"].shape,
    }
    return n, fx, fe, e_pad, s_slabs, xp, ea, wl, shapes


def _fwd_impl_flat(window, block_e, compute_dtype, interpret,
                   x, edge_attr, srcloc, dstloc, inwin, block_slab, weights):
    interpret = _resolve_interpret(interpret)
    cd = jnp.dtype(compute_dtype)
    n, fx, fe, e_pad, s_slabs, xp, ea, wl, shapes = _prep_flat(
        window, block_e, x, edge_attr, weights, cd
    )
    fo = weights["w3"].shape[1]
    n_blocks = e_pad // block_e
    sl2 = _rows8(srcloc.reshape(-1, block_e))
    dl2 = _rows8(dstloc.reshape(-1, block_e))
    inw2 = _rows8(inwin.astype(jnp.float32).reshape(-1, block_e))
    kernel = functools.partial(
        _fwd_kernel_flat, w=window, dtype=cd, mask_impl=MASK_IMPL
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=_common_specs_flat(window, fe, block_e, shapes),
        out_specs=[
            pl.BlockSpec((block_e, fo), lambda b, bs: (b, 0)),
            pl.BlockSpec((window, fo), lambda b, bs: (bs[b], 0)),
        ],
    )
    eout, agg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, fo), x.dtype),
            jax.ShapeDtypeStruct((s_slabs * window, fo), jnp.float32),
        ],
        interpret=interpret,
    )(
        block_slab.astype(jnp.int32),
        ea, sl2, dl2, inw2, xp, xp, xp,
        wl["w1d"], wl["w1s"], wl["w1e"], wl["b1"],
        wl["w2"], wl["b2"], wl["w3"], wl["b3"],
    )
    return (
        (eout, agg[:n].astype(x.dtype)),
        (x, edge_attr, srcloc, dstloc, inwin, block_slab, weights),
    )


def _bwd_impl_flat(window, block_e, compute_dtype, interpret, res, cts):
    x, edge_attr, srcloc, dstloc, inwin, block_slab, weights = res
    g_eout, g_agg = cts
    interpret = _resolve_interpret(interpret)
    cd = jnp.dtype(compute_dtype)
    n, fx, fe, e_pad, s_slabs, xp, ea, wl, shapes = _prep_flat(
        window, block_e, x, edge_attr, weights, cd
    )
    fo = weights["w3"].shape[1]
    n_blocks = e_pad // block_e
    sl2 = _rows8(srcloc.reshape(-1, block_e))
    dl2 = _rows8(dstloc.reshape(-1, block_e))
    inw2 = _rows8(inwin.astype(jnp.float32).reshape(-1, block_e))
    gagg_p = jnp.pad(g_agg.astype(cd), ((0, s_slabs * window - n), (0, 0)))
    kernel = functools.partial(
        _bwd_kernel_flat, w=window, dtype=cd, mask_impl=MASK_IMPL
    )
    const2 = lambda b, bs: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=_common_specs_flat(window, fe, block_e, shapes)
        + [
            pl.BlockSpec((block_e, fo), lambda b, bs: (b, 0)),  # g_eout
            pl.BlockSpec((window, fo), lambda b, bs: (bs[b], 0)),  # g_agg
        ],
        out_specs=[
            pl.BlockSpec((block_e, fe), lambda b, bs: (b, 0)),  # g_edge_attr
            pl.BlockSpec((window, fx), lambda b, bs: (bs[b], 0)),  # g_x dst
            pl.BlockSpec((1, 3 * window, fx), lambda b, bs: (bs[b], 0, 0)),
            pl.BlockSpec(shapes["w1d"], const2),
            pl.BlockSpec(shapes["w1s"], const2),
            pl.BlockSpec(shapes["w1e"], const2),
            pl.BlockSpec(shapes["b1"], const2),
            pl.BlockSpec(shapes["w2"], const2),
            pl.BlockSpec(shapes["b2"], const2),
            pl.BlockSpec(shapes["w3"], const2),
            pl.BlockSpec(shapes["b3"], const2),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, fe), jnp.float32),
            jax.ShapeDtypeStruct((s_slabs * window, fx), jnp.float32),
            jax.ShapeDtypeStruct((s_slabs, 3 * window, fx), jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1d"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1s"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w1e"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b1"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w2"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b2"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["w3"], jnp.float32),
            jax.ShapeDtypeStruct(shapes["b3"], jnp.float32),
        ],
        interpret=interpret,
    )(
        block_slab.astype(jnp.int32),
        ea, sl2, dl2, inw2, xp, xp, xp,
        wl["w1d"], wl["w1s"], wl["w1e"], wl["b1"],
        wl["w2"], wl["b2"], wl["w3"], wl["b3"],
        g_eout.astype(cd), gagg_p,
    )
    (g_ea, gxd, gxs_parts, gw1d, gw1s, gw1e, gb1, gw2, gb2, gw3, gb3) = outs

    pieces = gxs_parts.reshape(s_slabs * 3, window, fx)
    keys = (
        jnp.arange(s_slabs)[:, None] + jnp.arange(3)[None, :]
    ).reshape(-1)
    gxp_src = jax.ops.segment_sum(pieces, keys, num_segments=s_slabs + 2)
    gxp_src = gxp_src.reshape((s_slabs + 2) * window, fx)
    g_x = gxd[:n] + gxp_src[window : window + n]

    g_weights = {
        "w1d": gw1d.astype(weights["w1d"].dtype),
        "w1s": gw1s.astype(weights["w1s"].dtype),
        "w1e": gw1e.astype(weights["w1e"].dtype),
        "b1": gb1[0].astype(weights["b1"].dtype),
        "w2": gw2.astype(weights["w2"].dtype),
        "b2": gb2[0].astype(weights["b2"].dtype),
        "w3": gw3.astype(weights["w3"].dtype),
        "b3": gb3[0].astype(weights["b3"].dtype),
    }
    return (
        g_x.astype(x.dtype),
        g_ea.astype(edge_attr.dtype),
        None,
        None,
        None,
        None,
        g_weights,
    )


fused_relational_flat.defvjp(_fwd_impl_flat, _bwd_impl_flat)


def fused_relational_flat_reference(
    x, edge_attr, srcloc, dstloc, inwin, block_slab, weights,
    *, window: int, block_e: int,
):
    """Plain-XLA reference of the flat kernel's exact semantics (tests)."""
    n = x.shape[0]
    s_slabs = -(-n // window)
    slab = jnp.repeat(block_slab, block_e)
    dst = jnp.clip(dstloc + slab * window, 0, n - 1)
    xp = _pad_x(x, window, s_slabs)
    gsrc = xp[srcloc + slab * window]
    gdst = x[dst]
    w1 = jnp.concatenate([weights["w1d"], weights["w1s"], weights["w1e"]], 0)
    m = jnp.concatenate([gdst, gsrc, edge_attr], axis=1)
    h1 = jax.nn.relu(m @ w1 + weights["b1"])
    h2 = jax.nn.relu(h1 @ weights["w2"] + weights["b2"])
    et = (h2 @ weights["w3"] + weights["b3"]) * inwin[:, None]
    agg = jax.ops.segment_sum(et, dst, num_segments=n)
    return et, agg
