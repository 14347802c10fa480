"""Round-2 TPU battery #1: fused relational kernel on hardware.

One claim, one process, clean exit (axon serializes claims; killed clients
wedge the chip ~25 min). Experiments (each isolated in try/except):

1. fused kernel fwd exactness vs XLA reference (f32 compute = HIGHEST
   precision path) on a locality-realistic graph;
2. fused kernel grad exactness (f32) for x / edge_attr / weights;
3. bf16 compute drift vs f32 reference (expected ~1e-2 rel);
4. kernel micro-timings: fwd and fwd+bwd at bench scale, W sweep;
5. head-to-head EC train step on the SAME local graph:
   xla-sorted vs fused, bf16 — the VERDICT #1 target (>=2x, <41 ms);
6. rg_k64 condensation re-validation (round-1 JVP fix, ROADMAP #6).

Usage: python scripts/tpu_battery_r2.py [exp ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import jax

if os.environ.get("BATTERY_CPU"):
    # the axon TPU plugin ignores JAX_PLATFORMS=cpu; force in-process
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from tpu_experiments import claim_or_exit, describe, report, sync, timeit

V5E_BF16_FLOPS = 197e12
SMOKE = bool(int(os.environ.get("BATTERY_SMOKE", "0")))


def local_graph(rng, n, e, locality, far_frac=0.02):
    """kNN-like graph: edges connect nearby node indices (spatially sorted
    hits), a small far fraction exercises the overflow path."""
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    src = np.clip(dst + rng.integers(-locality, locality, size=e), 0, n - 1)
    far = rng.random(e) < far_frac
    src = np.where(far, rng.integers(0, n, size=e), src).astype(np.int32)
    return src, dst


def build_layout(rng, n, e, w, eb, fx, fe, locality=None):
    from gnn_tracking_tpu.ops.pallas.slab_layout import default_spec, slab_partition

    if locality is None:
        locality = w
    src, dst = local_graph(rng, n, e, locality)
    valid = np.ones(e, dtype=bool)
    spec = default_spec(n, e, window=w, block_e=eb)
    part = slab_partition(src, dst, valid, n, spec)
    e_pad = len(part["perm"])
    take = np.maximum(part["perm"], 0)
    ea = np.where(
        part["perm"][:, None] >= 0,
        rng.normal(size=(e, fe)).astype(np.float32)[take],
        0,
    ).astype(np.float32)
    x = rng.normal(size=(n, fx)).astype(np.float32)
    meta = dict(
        sl=jnp.asarray(part["srcloc"]),
        dl=jnp.asarray(part["dstloc"]),
        inw=jnp.asarray(part["inwin"].astype(np.float32)),
    )
    stats = dict(
        e_pad=e_pad,
        overflow=int(part["n_overflow"]),
        fill=float(part["inwin"].mean()),
    )
    return jnp.asarray(x), jnp.asarray(ea), meta, stats


def make_weights(rng, fx, fe, h, fo):
    def w(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)

    return {
        "w1d": w(fx, h), "w1s": w(fx, h), "w1e": w(fe, h),
        "b1": w(h), "w2": w(h, h), "b2": w(h),
        "w3": w(h, fo), "b3": w(fo),
    }


def exp_exact():
    from gnn_tracking_tpu.ops.pallas.fused_relational import (
        fused_relational,
        fused_relational_reference,
    )

    rng = np.random.default_rng(0)
    n, e, w, eb = (1024, 8192, 128, 128) if SMOKE else (8192, 65536, 512, 512)
    fx = fe = 32
    h, fo = 128, 32
    x, ea, meta, stats = build_layout(rng, n, e, w, eb, fx, fe)
    ws = make_weights(rng, fx, fe, h, fo)
    report("layout_stats", **stats)

    et, agg = sync(
        fused_relational(w, eb, "float32", None, x, ea, meta["sl"], meta["dl"], meta["inw"], ws)
    )
    # precision-consistent: kernel f32 matmuls run HIGHEST; plain `@` in the
    # reference defaults to bf16-truncated MXU passes (battery #8 prec probe)
    with jax.default_matmul_precision("highest"):
        et_r, agg_r = sync(
            fused_relational_reference(x, ea, meta["sl"], meta["dl"], meta["inw"], ws, window=w, block_e=eb)
        )
    d_et = float(np.abs(np.asarray(et) - np.asarray(et_r)).max())
    rel = lambda a, b: float(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        / (np.abs(np.asarray(b)).max() + 1e-30)
    )
    report(
        "fused_fwd_exact_f32",
        max_abs_et=d_et, rel_et=rel(et, et_r), rel_agg=rel(agg, agg_r),
    )

    # grads (f32)
    def loss_k(x, ea, ws):
        et, agg = fused_relational(w, eb, "float32", None, x, ea, meta["sl"], meta["dl"], meta["inw"], ws)
        return jnp.sum(jnp.tanh(et)) + jnp.sum(jnp.sin(agg))

    def loss_r(x, ea, ws):
        et, agg = fused_relational_reference(x, ea, meta["sl"], meta["dl"], meta["inw"], ws, window=w, block_e=eb)
        et = et * jnp.asarray(meta["inw"])[:, None]  # ref already masks; keep identical
        return jnp.sum(jnp.tanh(et)) + jnp.sum(jnp.sin(agg))

    gk = sync(jax.grad(loss_k, argnums=(0, 1, 2))(x, ea, ws))
    with jax.default_matmul_precision("highest"):
        gr = sync(jax.grad(loss_r, argnums=(0, 1, 2))(x, ea, ws))
    rels = {
        "gx": rel(gk[0], gr[0]),
        "gea": rel(gk[1], gr[1]),
        **{f"g_{k}": rel(gk[2][k], gr[2][k]) for k in ws},
    }
    report("fused_grad_exact_f32", **{k: round(v, 8) for k, v in rels.items()})

    # bf16 drift
    et16, agg16 = sync(
        fused_relational(w, eb, "bfloat16", None, x, ea, meta["sl"], meta["dl"], meta["inw"], ws)
    )
    report("fused_fwd_bf16_drift", rel_et=rel(et16, et_r), rel_agg=rel(agg16, agg_r))


def exp_micro():
    from gnn_tracking_tpu.ops.pallas.fused_relational import fused_relational

    rng = np.random.default_rng(1)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    fx = fe = 32
    h, fo = 128, 32
    for w, eb in ([(128, 128)] if SMOKE else [(512, 512), (1024, 512), (256, 256)]):
        try:
            x, ea, meta, stats = build_layout(rng, n, e, w, eb, fx, fe)
            ws = make_weights(rng, fx, fe, h, fo)
            args = (x, ea, meta["sl"], meta["dl"], meta["inw"], ws)

            fwd = jax.jit(
                lambda *a: fused_relational(w, eb, "bfloat16", None, *a)[1].sum()
            )
            t_f = timeit(fwd, *a_cast(args), iters=2 if SMOKE else 20)

            grad = jax.jit(
                jax.grad(
                    lambda x, ea, ws: sum(
                        jnp.sum(o)
                        for o in fused_relational(
                            w, eb, "bfloat16", None, x, ea, meta["sl"], meta["dl"], meta["inw"], ws
                        )
                    ),
                    argnums=(0, 2),
                )
            )
            t_g = timeit(lambda x, ea, ws: grad(x, ea, ws), x, ea, ws, iters=2 if SMOKE else 20)
            e_pad = stats["e_pad"]
            # useful MLP FLOPs only (fwd): 2*E*(fan1*h + h*h + h*fo)
            fl = 2 * e_pad * ((2 * fx + fe) * h + h * h + h * fo)
            report(
                f"fused_micro_w{w}_eb{eb}",
                fwd_ms=t_f * 1e3, fwdbwd_ms=t_g * 1e3,
                edges_per_s_fwdbwd=e_pad / t_g,
                mlp_mfu_fwd=fl / t_f / V5E_BF16_FLOPS,
                **stats,
            )
        except Exception as ex:
            report(f"fused_micro_w{w}_eb{eb}", error=describe(ex)[:500])


def a_cast(args):
    return args


def _bench_ec(graph, extras, tag, segment_impl, fused_w=1024, fused_b=512):
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

    IDIM, HDIM, L = 32, 128, 6
    model = ECForGraphTCN(
        interaction_node_dim=IDIM, interaction_edge_dim=IDIM,
        hidden_dim=HDIM, L_ec=L,
        sorted_edges=segment_impl != "fused",
        segment_impl=segment_impl,
        fused_window=fused_w, fused_block=fused_b, fused_dtype="bfloat16",
    )
    g = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        graph,
    )
    params = model.init(jax.random.PRNGKey(0), g)
    params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, g):
        def loss_fn(p):
            w = model.apply(p, g)["W"].astype(jnp.float32)
            return binary_focal_loss(inpt=w, target=g.y.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    state = [params, opt_state]

    def once():
        state[0], state[1], loss = step(state[0], state[1], g)
        return loss

    t = timeit(once, iters=2 if SMOKE else 15)
    n_e = graph.edge_index.shape[1]
    # useful fwd FLOPs: L IN layers (relational MLP on E + object MLP on N)
    IN_E = 2 * n_e * ((3 * IDIM) * HDIM + HDIM * HDIM + HDIM * IDIM)
    IN_N = 2 * graph.x.shape[0] * ((2 * IDIM) * HDIM + HDIM * HDIM + HDIM * IDIM)
    fl_fwd = 6 * (IN_E + IN_N)
    report(
        tag, ms=t * 1e3, edges_per_s=n_e / t,
        mfu_3x_fwd=3 * fl_fwd / t / V5E_BF16_FLOPS,
    )
    return float(once())


def exp_ec_step():
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.ops.pallas.slab_layout import apply_slab_layout, default_spec

    rng = np.random.default_rng(2)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    x = rng.normal(size=(n, 14)).astype(np.float32)
    ea = rng.normal(size=(e, 4)).astype(np.float32)
    y = (rng.random(e) < 0.3).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=np.stack([src, dst]), edge_attr=ea, y=y
    )
    g_sorted = g.sort_edges_by_target()
    loss_x = _bench_ec(g_sorted, None, "ec_step_bf16_sorted_localgraph", "xla")
    # w must cover the graph's locality (1024) or the overflow list blows
    # its cap (battery #2: w=512 -> SlabLayoutError); sweep block_e instead
    for w, eb in ([(128, 128)] if SMOKE else [(1024, 512), (1024, 1024)]):
        try:
            spec = default_spec(n, e, window=w, block_e=eb)
            g_f = apply_slab_layout(g, spec)
            loss_f = _bench_ec(
                g_f, None, f"ec_step_bf16_fused_w{w}", "fused", fused_w=w, fused_b=eb
            )
            report(f"ec_fused_w{w}_loss_check", loss_xla=loss_x, loss_fused=loss_f)
        except Exception as ex:
            report(f"ec_step_bf16_fused_w{w}", error=describe(ex)[:500])


def exp_rg64():
    """Re-validate rg-condensation with k=64 pallas kNN (round-1 ROADMAP #6:
    the JVP root-cause fix in ops/knn.py was only k-sweep-compile-verified)."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.oc import CondensationLossRG
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.module import TCModule

    rng = np.random.default_rng(3)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    IDIM, HDIM, L = 32, 128, 6
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    pid = rng.integers(0, 2048, size=n)
    tcn_graph = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(pid[src] == pid[dst]) & (pid[src] > 0),
        particle_id=pid,
        pt=(2 * rng.random(2048))[pid],
        eta=(8 * (rng.random(2048) - 0.5))[pid],
        reconstructable=np.ones(n),
    )
    module = TCModule(
        model=GraphTCN(h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM, L_ec=L, L_hc=3),
        loss_fct=CondensationLossRG(max_n_objects=2048, max_num_neighbors=64),
        precision="f32",
    )
    module.setup_params(tcn_graph)

    t0 = time.perf_counter()
    total = float(module.training_step(tcn_graph)["total"])
    compile_s = time.perf_counter() - t0
    t = timeit(lambda: module.training_step(tcn_graph)["total"], iters=2 if SMOKE else 5)
    report(
        "rg_k64_revalidation",
        loss=total, ms=t * 1e3, compile_s=compile_s,
        finite=bool(np.isfinite(total)),
    )


def exp_knnbig():
    """Full-detector kNN: windowed/banded vs streaming brute force
    (VERDICT #2 target: exact at 262k x 8-dim in <150 ms, was 3,016 ms)."""
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_streaming
    from gnn_tracking_tpu.ops.pallas.windowed_topk import windowed_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    # clustered cloud: embeddings concentrate around tracks
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))

    d_w, i_w, unc = windowed_knn(x, k=8, radius=4, fallback_cap=8192)
    d_w, i_w = sync((d_w, i_w))
    t_w = timeit(
        lambda: windowed_knn(x, k=8, radius=4, fallback_cap=8192)[0],
        iters=2 if SMOKE else 10,
    )
    report("knn_windowed_262k", ms=t_w * 1e3, n_uncert=int(unc))

    if not SMOKE:
        d_s, i_s = sync(pairwise_topk_streaming(x, k=8))
        t_s = timeit(lambda: pairwise_topk_streaming(x, k=8)[0], iters=3)
        match = bool(
            np.allclose(
                np.sort(np.asarray(d_w), axis=1),
                np.sort(np.asarray(d_s), axis=1),
                rtol=1e-3, atol=1e-4,
            )
        )
        report("knn_brute_262k", ms=t_s * 1e3, windowed_match=match)

    # 300k-hit learned-GC forward+backward (hinge-style): embed, build graph,
    # differentiate through recomputed distances
    try:
        from gnn_tracking_tpu.graphs import EventGraph
        from gnn_tracking_tpu.models.graph_construction import GraphConstructionFCNN
        from gnn_tracking_tpu.ops.knn import knn_graph

        n2 = 8192 if SMOKE else 303104  # 296k rounded to block multiple
        x2 = jnp.asarray(rng.normal(size=(n2, 14)).astype(np.float32))
        g2 = EventGraph.from_arrays(
            x=np.asarray(x2),
            edge_index=np.zeros((2, 1), np.int32),
            edge_attr=np.zeros((1, 1), np.float32),
            y=np.zeros(1, np.float32),
        )
        model = GraphConstructionFCNN(in_dim=14, hidden_dim=512, out_dim=8, depth=5)
        params = model.init(jax.random.PRNGKey(0), g2)

        @jax.jit
        def gc_step(p):
            def loss_fn(p):
                h = model.apply(p, g2)["H"]
                ei, mask, dists = knn_graph(h, 8)
                return jnp.sum(jnp.where(mask, dists, 0.0))

            return jax.value_and_grad(loss_fn)(p)

        t0 = time.perf_counter()
        loss, grads = sync(gc_step(params))
        compile_s = time.perf_counter() - t0
        t = timeit(lambda: gc_step(params)[0], iters=2 if SMOKE else 5)
        report(
            "learned_gc_300k_step",
            ms=t * 1e3, compile_s=compile_s, loss=float(loss),
            finite=bool(np.isfinite(float(loss))),
        )
    except Exception as ex:
        report("learned_gc_300k_step", error=describe(ex)[:500])


def exp_cc():
    """CC inner loop: XLA neighbor-table CC vs the single-kernel Pallas CC
    (VMEM-resident labels; probes Mosaic's 1-D dynamic-gather), plus the
    batched DBSCAN scan (VERDICT #7 target: <30 ms/trial from 56)."""
    from gnn_tracking_tpu.ops.cc import connected_components_neighbors
    from gnn_tracking_tpu.postprocessing.fastrescanner import DBSCANFastRescan

    rng = np.random.default_rng(6)
    n, k = (1024, 8) if SMOKE else (16384, 64)
    # clustered points -> realistic DBSCAN neighbor structure
    centers = rng.normal(size=(n // 8, 4)).astype(np.float32)
    x = centers[rng.integers(0, n // 8, size=n)] + 0.03 * rng.normal(
        size=(n, 4)
    ).astype(np.float32)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k).fit(x)
    dd, ii = nn.kneighbors(x)
    # symmetrized mask within a radius
    idx = jnp.asarray(ii.astype(np.int32))
    mask = jnp.asarray(dd < 0.1)

    ref = connected_components_neighbors(idx, mask)
    sync(ref)
    t_x = timeit(lambda: connected_components_neighbors(idx, mask), iters=2 if SMOKE else 20)
    report("cc_xla_neighbors", ms=t_x * 1e3)

    try:
        from gnn_tracking_tpu.ops.pallas.cc_kernel import cc_neighbors_pallas

        got = sync(cc_neighbors_pallas(idx, mask))
        match = bool(np.array_equal(np.asarray(got), np.asarray(ref)))
        t_p = timeit(lambda: cc_neighbors_pallas(idx, mask), iters=2 if SMOKE else 20)
        report("cc_pallas_vmem", ms=t_p * 1e3, match=match)
    except Exception as ex:
        report("cc_pallas_vmem", error=describe(ex)[:500])

    # full batched DBSCAN scan
    try:
        rescan = DBSCANFastRescan(
            np.asarray(x), max_eps=0.5, max_num_neighbors=k
        )
        trials = [
            {"eps": e, "min_samples": 3} for e in np.linspace(0.02, 0.5, 12)
        ]
        labels = rescan.cluster_many(trials)
        np.asarray(labels)
        t0 = time.perf_counter()
        np.asarray(rescan.cluster_many(trials))
        t = time.perf_counter() - t0
        report("dbscan_batched_scan", ms_per_trial=t / len(trials) * 1e3)
    except Exception as ex:
        report("dbscan_batched_scan", error=describe(ex)[:500])


def exp_exact2():
    """Bisect the hardware-only fused-kernel error (battery #5: f32 fwd
    rel 0.006, gea rel 0.28 vs interpret-exact). Variants isolate the
    row-mask lowering ("none"/"reshape"/"diag") from the index row-select
    and gathers; bad-row statistics localize the corruption."""
    import functools

    from jax.experimental import pallas as pl

    import gnn_tracking_tpu.ops.pallas.fused_relational as FR

    # --- 0. _tile_row in isolation: copy each block's selected index row ---
    try:
        eb0, nb0, cmax0 = 128, 24, 3

        def rowsel_kernel(t_ref, o_ref, *, cmax):
            flat = pl.program_id(0) * cmax + pl.program_id(1)
            row = FR._tile_row(t_ref, flat)  # [1, eb]
            rsel = (
                jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0) == flat % 8
            )

            @pl.when(flat % 8 == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            o_ref[:] += jnp.where(rsel, jnp.broadcast_to(row, o_ref.shape), 0)

        tiles = np.arange(nb0 * eb0, dtype=np.int32).reshape(nb0, eb0)
        tiles_p = np.pad(tiles, ((0, (-nb0) % 8), (0, 0)))
        out = pl.pallas_call(
            functools.partial(rowsel_kernel, cmax=cmax0),
            grid=(nb0 // cmax0, cmax0),
            in_specs=[
                pl.BlockSpec((8, eb0), lambda s, c: ((s * cmax0 + c) // 8, 0))
            ],
            out_specs=pl.BlockSpec(
                (8, eb0), lambda s, c: ((s * cmax0 + c) // 8, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((nb0, eb0), jnp.int32),
            interpret=False,
        )(jnp.asarray(tiles_p))
        got = np.asarray(sync(out))
        n_bad = int((got != tiles).sum())
        report("exact2_tile_row", n_bad=n_bad,
               first_bad=np.argwhere(got != tiles)[:4].tolist())
    except Exception as ex:
        report("exact2_tile_row", error=describe(ex)[:400])

    rng = np.random.default_rng(0)
    n, e, w, eb = (1024, 8192, 128, 128) if SMOKE else (8192, 65536, 512, 512)
    fx = fe = 32
    h, fo = 128, 32
    x, ea, meta, stats = build_layout(rng, n, e, w, eb, fx, fe)
    ws = make_weights(rng, fx, fe, h, fo)
    ones = jnp.ones_like(meta["inw"])

    def xla_ref(inw_arr):
        from gnn_tracking_tpu.ops.pallas.fused_relational import (
            fused_relational_reference,
        )

        with jax.default_matmul_precision("highest"):
            return fused_relational_reference(
                x, ea, meta["sl"], meta["dl"], inw_arr, ws, window=w, block_e=eb
            )

    def stats_vs(tag, got, ref):
        got, ref = np.asarray(got, np.float64), np.asarray(ref, np.float64)
        err = np.abs(got - ref).max(axis=1)
        scale = np.abs(ref).max() + 1e-30
        bad = np.where(err > 1e-3 * scale)[0]
        out = {
            "rel": float(err.max() / scale),
            "n_bad_rows": int(len(bad)),
        }
        if len(bad):
            blocks = np.unique(bad // eb)
            out["bad_blocks"] = blocks[:12].tolist()
            out["bad_block_mod8"] = np.unique(blocks % 8).tolist()
            out["first_bad_rows_in_block"] = np.unique(bad % eb)[:8].tolist()
        report(tag, **out)

    for variant, inw_arr in (
        ("none", ones),
        ("reshape", meta["inw"]),
        ("diag", meta["inw"]),
    ):
        try:
            FR.MASK_IMPL = variant
            et, agg = sync(
                FR.fused_relational(
                    w, eb, "float32", None, x, ea,
                    meta["sl"], meta["dl"], inw_arr, ws,
                )
            )
            et_r, agg_r = sync(xla_ref(inw_arr))
            stats_vs(f"exact2_fwd_{variant}_et", et, et_r)
            stats_vs(f"exact2_fwd_{variant}_agg", agg, agg_r)

            def loss_k(x_, ea_, ws_):
                et_, agg_ = FR.fused_relational(
                    w, eb, "float32", None, x_, ea_,
                    meta["sl"], meta["dl"], inw_arr, ws_,
                )
                return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

            def loss_r(x_, ea_, ws_):
                et_, agg_ = xla_ref_d(x_, ea_, ws_)
                return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

            from gnn_tracking_tpu.ops.pallas.fused_relational import (
                fused_relational_reference,
            )

            def xla_ref_d(x_, ea_, ws_):
                return fused_relational_reference(
                    x_, ea_, meta["sl"], meta["dl"], inw_arr, ws_,
                    window=w, block_e=eb,
                )

            gk = sync(jax.grad(loss_k, argnums=(1,))(x, ea, ws))[0]
            with jax.default_matmul_precision("highest"):
                gr = sync(jax.grad(loss_r, argnums=(1,))(x, ea, ws))[0]
            stats_vs(f"exact2_gea_{variant}", gk, gr)
        except Exception as ex:
            report(f"exact2_{variant}", error=describe(ex)[:400])
    FR.MASK_IMPL = "diag"


def exp_prec():
    """Isolate the f32 'HIGHEST' discrepancy (exact2: every row off by
    ~bf16 scale even unmasked): single matmuls inside a minimal Pallas
    kernel vs XLA HIGHEST on identical f32 data."""
    import functools

    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    idx = jnp.asarray(
        np.sort(rng.integers(0, 512, size=512)).astype(np.int32)
    ).reshape(1, 512)
    xw = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))

    def k_plain(a_ref, b_ref, o_ref, *, prec):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    for name, prec in (
        ("highest", jax.lax.Precision.HIGHEST),
        ("default", None),
    ):
        try:
            out = pl.pallas_call(
                functools.partial(k_plain, prec=prec),
                out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
                interpret=False,
            )(a, b)
            ref = jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
            rel = float(
                jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30)
            )
            report(f"prec_plain_{name}", rel=float(sync(jnp.asarray(rel))))
        except Exception as ex:
            report(f"prec_plain_{name}", error=describe(ex)[:300])

    # transposed-contraction one-hot gather (the kernel's _gather pattern)
    def k_onehot(idx_ref, xw_ref, o_ref, *, prec):
        it = jax.lax.broadcasted_iota(jnp.int32, (512, 512), 0)
        oh = (it == idx_ref[:]).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, xw_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    for name, prec in (
        ("highest", jax.lax.Precision.HIGHEST),
        ("default", None),
    ):
        try:
            out = pl.pallas_call(
                functools.partial(k_onehot, prec=prec),
                out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
                interpret=False,
            )(idx, xw)
            ref = xw[idx[0]]
            rel = float(
                jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30)
            )
            report(f"prec_onehot_{name}", rel=float(sync(jnp.asarray(rel))))
        except Exception as ex:
            report(f"prec_onehot_{name}", error=describe(ex)[:300])


def exp_ivf():
    """IVF-certified exact kNN at full-detector scale (VERDICT #2 target:
    exact at 262k x 8 in <150 ms; replaces the banded kNN that could not
    certify clustered latent clouds)."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_streaming

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))

    t0 = time.perf_counter()
    d_i, i_i, unc = sync(ivf_knn(x, k=8))
    compile_s = time.perf_counter() - t0
    t_i = timeit(lambda: ivf_knn(x, k=8)[0], iters=2 if SMOKE else 10)
    report(
        "ivf_knn_262k", ms=t_i * 1e3, compile_s=compile_s, n_uncert=int(unc)
    )

    if not SMOKE:
        # precision-consistent exactness check: brute-force a random query
        # subset with the SAME HIGHEST-precision distance formula (the
        # streaming Pallas kernel runs at default MXU precision, whose ~1%
        # bf16 operand truncation fails any tight comparison)
        from gnn_tracking_tpu.ops.pallas.windowed_topk import _fallback_brute

        sub = jnp.asarray(rng.choice(n, size=4096, replace=False).astype(np.int32))
        fb_d, fb_i = sync(
            _fallback_brute(
                x[sub], x, jnp.ones((n,), bool), k=8, block_c=1024,
                loop=False, self_ids=sub, interpret=False,
            )
        )
        # compare in the SAME direct-difference formula ivf_knn reranks
        # with (the brute kernel's norm expansion carries ~1e-5 absolute
        # near-tie noise that would fail a tight comparison)
        xs = np.asarray(x, np.float64)
        subn = np.asarray(sub)

        def direct(ids):
            dd = ((xs[subn][:, None, :] - xs[ids]) ** 2).sum(-1)
            return np.sort(dd, axis=1)

        got = direct(np.asarray(i_i)[subn])
        ref = direct(np.asarray(fb_i))
        bad = (~np.isclose(got, ref, rtol=1e-4, atol=1e-5)).any(axis=1)
        report(
            "ivf_knn_262k_exact",
            match=bool(~bad.any()),
            frac_bad=float(bad.mean()),
            max_rel=float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)),
        )

    # uniform worst case: certification is weak, fallback carries exactness
    xu = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    du, _, uncu = sync(ivf_knn(xu, k=8))
    t_u = timeit(lambda: ivf_knn(xu, k=8)[0], iters=2 if SMOKE else 5)
    report("ivf_knn_262k_uniform", ms=t_u * 1e3, n_uncert=int(uncu))


def exp_ivf_decomp():
    """Phase decomposition of ivf_knn's 1520 ms at 262k (battery #8; target
    <150 ms): certify-off / lloyd-off / probe-width / slab-cap / group-size
    variants plus top_k and argsort microbenches to find the cost center."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 5

    variants = [
        ("full", {}),
        ("nocert", {"certify": False}),
        ("nocert_nolloyd", {"certify": False, "lloyd_iters": 0}),
        ("nocert_probe8", {"certify": False, "n_probe": 8}),
        ("nocert_groups128", {"certify": False, "group_cells": 128}),
        ("cap48", {"cell_cap": 48}),
        ("cap48_probe8", {"cell_cap": 48, "n_probe": 8}),
    ]
    for name, kw in variants:
        try:
            _, _, unc = sync(ivf_knn(x, k=8, **kw))
            t = timeit(lambda kw=kw: ivf_knn(x, k=8, **kw)[0], iters=iters)
            report(f"ivf_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivf_{name}", error=describe(ex)[:300])

    # microbenches shaped like the probe's inner ops
    try:
        rows, width = (512, 256) if SMOKE else (4096, 1536)
        reps = 2 if SMOKE else 192  # 192*4096 = 786k rows = the slab size
        tile = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))

        @jax.jit
        def topk_sweep(tile):
            def one(i, acc):
                neg, _ = jax.lax.top_k(-(tile + i), 16)
                return acc + neg[:, 0]

            return jax.lax.fori_loop(0, reps, one, jnp.zeros(rows))

        sync(topk_sweep(tile))
        t = timeit(lambda: topk_sweep(tile), iters=iters)
        report("ivf_micro_topk_786k_w1536", ms=t * 1e3)

        a = jnp.asarray(rng.integers(0, 8192, size=n).astype(np.int32))
        sortfn = jax.jit(jnp.argsort)
        sync(sortfn(a))
        t = timeit(lambda: sortfn(a), iters=iters)
        report("ivf_micro_argsort_262k", ms=t * 1e3)
    except Exception as ex:
        report("ivf_micro", error=describe(ex)[:300])


def exp_ivf_stages():
    """Stage attribution of the 2.73 s ivf_knn at 262k clustered (battery
    #11 decomp: cert+fallback 1.24 s, probe ~82 ms per probed cell, top_k
    and argsort micros CHEAP — so the cost centers are NOT where the code
    comments guessed). Variants isolate: probe scaling (T=1/4), the spill
    passes (extra_pass scans all 262k queries against the 8k extra set),
    certification alone vs the fallback cond (fallback=False reports
    n_viol = how many queries the triangle bound conservatively failed),
    and the uniform-cloud pathology."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 5

    variants = [
        # the new default (probe8 + ladder) end to end
        ("default", {}),
        # extra_pass costs ~429 ms and scales with the STATIC extra_cap
        # ([N, extra_cap] scan); a wider cell_cap shrinks the actual spill
        # so a smaller extra_cap can hold it. n_uncert explodes if
        # extra_cap is too small (spill_lost kills certification) — that's
        # the signal it didn't fit.
        ("cap128_extra2048", {"cell_cap": 128, "extra_cap": 2048}),
        ("cap128_extra4096", {"cell_cap": 128, "extra_cap": 4096}),
        ("extra4096", {"extra_cap": 4096}),
        ("extra2048", {"extra_cap": 2048}),
    ]
    for name, kw in variants:
        try:
            _, _, unc = sync(ivf_knn(x, k=8, **kw))
            t = timeit(lambda kw=kw: ivf_knn(x, k=8, **kw)[0], iters=iters)
            report(f"ivfstage_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivfstage_{name}", error=describe(ex)[:300])


def exp_probe_pallas():
    """Pallas IVF probe vs XLA probe on hardware: exactness (same neighbor
    sets as the XLA path AND as brute force) + end-to-end ivf_knn timing.
    Battery #13 put the XLA probe at ~44 ms per probed cell (gathers of
    3 KB slabs + materialized distance tiles); the kernel DMAs cell slabs
    via scalar-prefetched index maps and keeps the top-k in VMEM."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 5

    results = {}
    for impl in ("xla", "pallas"):
        try:
            d_, i_, unc = sync(ivf_knn(x, k=8, probe_impl=impl))
            t = timeit(lambda: ivf_knn(x, k=8, probe_impl=impl)[0], iters=iters)
            results[impl] = (np.asarray(d_), np.asarray(i_))
            report(f"probep_{impl}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"probep_{impl}", error=describe(ex)[:500])
    if len(results) == 2:
        d1, i1 = results["xla"]
        d2, i2 = results["pallas"]
        same = int(
            sum(set(a.tolist()) == set(b.tolist()) for a, b in zip(i1, i2))
        )
        report(
            "probep_match",
            same_idx_sets=same,
            n=n,
            max_abs_d=float(np.abs(np.sort(d1, 1) - np.sort(d2, 1)).max()),
        )
    # probe count scaling with the kernel (cheap probes -> can we afford
    # T=16 again for a better certify rate at negligible cost?)
    for t_probe in (16, 24):
        try:
            _, _, unc = sync(ivf_knn(x, k=8, probe_impl="pallas", n_probe=t_probe))
            t = timeit(
                lambda tp=t_probe: ivf_knn(x, k=8, probe_impl="pallas", n_probe=tp)[0],
                iters=iters,
            )
            report(f"probep_pallas_T{t_probe}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"probep_pallas_T{t_probe}", error=describe(ex)[:300])


def exp_decomp():
    """Decompose the fused-vs-sorted EC step gap (battery #5: 143 vs 81 ms):
    forward-only and L_ec=1 variants isolate per-layer cost from the head
    (encoders + W-MLP + loss) at E vs E_pad rows."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
    from gnn_tracking_tpu.ops.pallas.slab_layout import apply_slab_layout, default_spec

    rng = np.random.default_rng(2)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    g0 = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(rng.random(e) < 0.3).astype(np.float32),
    )
    w, eb = (128, 128) if SMOKE else (1024, 512)
    variants = {
        "sorted": g0.sort_edges_by_target(),
        "fused": apply_slab_layout(g0, default_spec(n, e, window=w, block_e=eb)),
    }
    for impl, g in variants.items():
        g = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, g)
        for L in (1, 6):
            model = ECForGraphTCN(
                interaction_node_dim=32, interaction_edge_dim=32,
                hidden_dim=128, L_ec=L,
                sorted_edges=impl == "sorted",
                segment_impl="xla" if impl == "sorted" else "fused",
                fused_window=w, fused_block=eb, fused_dtype="bfloat16",
            )
            params = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16),
                model.init(jax.random.PRNGKey(0), g),
            )

            fwd = jax.jit(lambda p, g: model.apply(p, g)["W"].sum())
            sync(fwd(params, g))
            t_f = timeit(lambda: fwd(params, g), iters=2 if SMOKE else 15)

            @jax.jit
            def fb(p, g):
                def loss_fn(p):
                    wg = model.apply(p, g)["W"].astype(jnp.float32)
                    return binary_focal_loss(
                        inpt=wg, target=g.y.astype(jnp.float32)
                    )

                loss, grads = jax.value_and_grad(loss_fn)(p)
                # consume the grads or XLA DCEs the whole backward
                gsum = sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(grads))
                return loss + 0.0 * gsum

            sync(fb(params, g))
            t_b = timeit(lambda: fb(params, g), iters=2 if SMOKE else 15)
            report(
                f"decomp_{impl}_L{L}",
                fwd_ms=t_f * 1e3, fwdbwd_ms=t_b * 1e3,
            )


def exp_tcn():
    """Full GraphTCN (EC + condensation) step: fused IN kernels vs sorted
    XLA, bf16, at bench scale (round-2 wrapper plumbing)."""
    import optax as _optax

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.oc import CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.ops.pallas.slab_layout import apply_slab_layout, default_spec
    from gnn_tracking_tpu.training.module import TCModule

    rng = np.random.default_rng(7)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    pid = rng.integers(0, 2048, size=n)
    g0 = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(pid[src] == pid[dst]) & (pid[src] > 0),
        particle_id=pid,
        pt=(2 * rng.random(2048))[pid],
        eta=(8 * (rng.random(2048) - 0.5))[pid],
        reconstructable=np.ones(n),
    )
    for tag, impl in (("sorted", "xla"), ("fused", "fused")):
        try:
            if impl == "fused":
                w, eb = (128, 128) if SMOKE else (1024, 512)
                g = apply_slab_layout(g0, default_spec(n, e, window=w, block_e=eb))
            else:
                g, w, eb = g0.sort_edges_by_target(), 1024, 512
            module = TCModule(
                model=GraphTCN(
                    h_dim=32, e_dim=32, h_outdim=8, hidden_dim=128,
                    L_ec=6, L_hc=3,
                    sorted_edges=impl == "xla",
                    segment_impl=impl,
                    fused_window=w, fused_block=eb,
                ),
                loss_fct=CondensationLossTiger(
                    max_n_objects=2048, object_block_size=256
                ),
                precision="bf16",
            )
            module.setup_params(g)
            sync(module.training_step(g)["total"])  # compile
            t = timeit(
                lambda: module.training_step(g)["total"],
                iters=2 if SMOKE else 10,
            )
            report(f"graphtcn_step_{tag}", ms=t * 1e3, events_per_s=1.0 / t)
        except Exception as ex:
            report(f"graphtcn_step_{tag}", error=describe(ex)[:500])


def build_flat_layout(rng, n, e, w, eb, fx, fe, locality=None):
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        default_spec,
        flat_blocks_cap,
        flat_slab_partition,
    )

    if locality is None:
        locality = w
    src, dst = local_graph(rng, n, e, locality)
    valid = np.ones(e, dtype=bool)
    spec = default_spec(n, e, window=w, block_e=eb)
    part = flat_slab_partition(
        src, dst, valid, n, spec, blocks_cap=flat_blocks_cap(n, e, spec)
    )
    e_pad = len(part["perm"])
    take = np.maximum(part["perm"], 0)
    ea = np.where(
        part["perm"][:, None] >= 0,
        rng.normal(size=(e, fe)).astype(np.float32)[take],
        0,
    ).astype(np.float32)
    x = rng.normal(size=(n, fx)).astype(np.float32)
    meta = dict(
        sl=jnp.asarray(part["srcloc"]),
        dl=jnp.asarray(part["dstloc"]),
        inw=jnp.asarray(part["inwin"].astype(np.float32)),
        bs=jnp.asarray(part["block_slab"]),
    )
    stats = dict(
        e_pad=e_pad,
        overflow=int(part["n_overflow"]),
        fill=float(part["inwin"].mean()),
    )
    return jnp.asarray(x), jnp.asarray(ea), meta, stats


def exp_flat():
    """Flat-block fused kernel on hardware: exactness (f32 + bf16 drift),
    raw kernel timing, and the head-to-head EC train step (fused_flat vs
    sorted XLA) — the VERDICT #1 target with fill 0.97 instead of 0.66."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.ops.pallas.fused_relational import (
        fused_relational_flat,
        fused_relational_flat_reference,
    )
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout,
        default_spec,
        flat_blocks_cap,
    )

    # --- exactness at mid scale (f32; report raw rel, the known Mosaic f32
    # matmul drift shows here too if present) ---
    rng = np.random.default_rng(11)
    n, e, w, eb = (1024, 8192, 128, 128) if SMOKE else (8192, 65536, 512, 512)
    fx = fe = 32
    h, fo = 128, 32
    x, ea, meta, stats = build_flat_layout(rng, n, e, w, eb, fx, fe)
    ws = make_weights(rng, fx, fe, h, fo)
    report("flat_layout", **stats)
    try:
        et, agg = sync(
            fused_relational_flat(
                w, eb, "float32", None, x, ea,
                meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws,
            )
        )
        # precision-consistent reference: the kernel's f32 matmuls run at
        # HIGHEST (exact per battery #8 prec probe); plain `@` in the XLA
        # reference defaults to bf16-truncated MXU passes (~0.3% rel), which
        # is what batteries #5/#6 actually measured as "kernel error".
        with jax.default_matmul_precision("highest"):
            et_r, agg_r = sync(
                fused_relational_flat_reference(
                    x, ea, meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws,
                    window=w, block_e=eb,
                )
            )
        scale = float(np.abs(np.asarray(et_r)).max()) + 1e-30
        report(
            "flat_exact_f32",
            et_rel=float(np.abs(np.asarray(et) - np.asarray(et_r)).max() / scale),
            agg_rel=float(
                np.abs(np.asarray(agg) - np.asarray(agg_r)).max()
                / (np.abs(np.asarray(agg_r)).max() + 1e-30)
            ),
        )

        def loss_k(x_, ea_, ws_):
            et_, agg_ = fused_relational_flat(
                w, eb, "float32", None, x_, ea_,
                meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
            )
            return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

        def loss_r(x_, ea_, ws_):
            et_, agg_ = fused_relational_flat_reference(
                x_, ea_, meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
                window=w, block_e=eb,
            )
            return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

        gk = sync(jax.grad(loss_k, argnums=(0, 1, 2))(x, ea, ws))
        with jax.default_matmul_precision("highest"):
            gr = sync(jax.grad(loss_r, argnums=(0, 1, 2))(x, ea, ws))
        rels = {}
        for name, a, b in (
            ("gx", gk[0], gr[0]),
            ("gea", gk[1], gr[1]),
            ("gw2", gk[2]["w2"], gr[2]["w2"]),
        ):
            rels[name + "_rel"] = float(
                np.abs(np.asarray(a) - np.asarray(b)).max()
                / (np.abs(np.asarray(b)).max() + 1e-30)
            )
        report("flat_exact_grads_f32", **rels)
    except Exception as ex:
        report("flat_exact_f32", error=describe(ex)[:500])

    # --- raw kernel timing at bench scale (bf16 fwd and fwd+bwd) ---
    rng = np.random.default_rng(12)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    for w2, eb2 in ([(128, 128)] if SMOKE else [(1024, 512), (512, 512)]):
        try:
            x2, ea2, m2, st2 = build_flat_layout(rng, n, e, w2, eb2, fx, fe)
            ws2 = make_weights(rng, fx, fe, h, fo)

            @jax.jit
            def fwd(x_, ea_, ws_, m=m2, w_=w2, eb_=eb2):
                return fused_relational_flat(
                    w_, eb_, "bfloat16", None, x_, ea_,
                    m["sl"], m["dl"], m["inw"], m["bs"], ws_,
                )[1]

            @jax.jit
            def fwdbwd(x_, ea_, ws_, m=m2, w_=w2, eb_=eb2):
                def lf(x__, ea__, ws__):
                    et_, agg_ = fused_relational_flat(
                        w_, eb_, "bfloat16", None, x__, ea__,
                        m["sl"], m["dl"], m["inw"], m["bs"], ws__,
                    )
                    return (
                        jnp.sum(et_.astype(jnp.float32))
                        + jnp.sum(agg_.astype(jnp.float32))
                    )

                return jax.grad(lf, argnums=(0, 1, 2))(x_, ea_, ws_)[0]

            sync(fwd(x2, ea2, ws2))
            t_f = timeit(lambda: fwd(x2, ea2, ws2), iters=2 if SMOKE else 20)
            sync(fwdbwd(x2, ea2, ws2))
            t_fb = timeit(lambda: fwdbwd(x2, ea2, ws2), iters=2 if SMOKE else 20)
            report(
                f"flat_kernel_w{w2}_eb{eb2}",
                fill=st2["fill"],
                fwd_ms=t_f * 1e3,
                fwdbwd_ms=t_fb * 1e3,
                edges_per_s_fwdbwd=e / t_fb,
            )
        except Exception as ex:
            report(f"flat_kernel_w{w2}_eb{eb2}", error=describe(ex)[:500])

    # --- head-to-head EC train step ---
    rng = np.random.default_rng(2)  # same graph as exp_ec_step
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    xg = rng.normal(size=(n, 14)).astype(np.float32)
    eag = rng.normal(size=(e, 4)).astype(np.float32)
    y = (rng.random(e) < 0.3).astype(np.float32)
    g = EventGraph.from_arrays(
        x=xg, edge_index=np.stack([src, dst]), edge_attr=eag, y=y
    )
    loss_x = _bench_ec(
        g.sort_edges_by_target(), None, "flat_ec_step_sorted", "xla"
    )
    for w3, eb3 in ([(128, 128)] if SMOKE else [(1024, 512), (1024, 1024)]):
        try:
            spec = default_spec(n, e, window=w3, block_e=eb3)
            g_f = apply_flat_slab_layout(
                g, spec, blocks_cap=flat_blocks_cap(n, e, spec)
            )
            loss_f = _bench_ec(
                g_f, None, f"flat_ec_step_w{w3}_eb{eb3}", "fused_flat",
                fused_w=w3, fused_b=eb3,
            )
            report(
                f"flat_ec_loss_check_w{w3}_eb{eb3}",
                loss_xla=loss_x, loss_flat=loss_f,
            )
        except Exception as ex:
            report(f"flat_ec_step_w{w3}_eb{eb3}", error=describe(ex)[:500])


def exp_flat_t():
    """Transposed (edges-on-lanes) flat fused kernel on hardware: f32
    exactness vs the precision-consistent reference, raw bf16 kernel timing
    at bench scale, and the head-to-head EC train step vs sorted XLA —
    tests the ~4.4x MXU tile-pass cycle model of fused_relational_t."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.ops.pallas.fused_relational import (
        fused_relational_flat_reference,
    )
    from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
        fused_relational_flat_t,
    )
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout,
        default_spec,
        flat_blocks_cap,
    )

    # --- f32 exactness at mid scale (fwd + grads) ---
    rng = np.random.default_rng(11)
    n, e, w, eb = (1024, 8192, 128, 128) if SMOKE else (8192, 65536, 512, 512)
    fx = fe = 32
    h, fo = 128, 32
    x, ea, meta, stats = build_flat_layout(rng, n, e, w, eb, fx, fe)
    ws = make_weights(rng, fx, fe, h, fo)
    try:
        et, agg = sync(
            fused_relational_flat_t(
                w, eb, "float32", None, x, ea,
                meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws,
            )
        )
        with jax.default_matmul_precision("highest"):
            et_r, agg_r = sync(
                fused_relational_flat_reference(
                    x, ea, meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws,
                    window=w, block_e=eb,
                )
            )
        scale = float(np.abs(np.asarray(et_r)).max()) + 1e-30
        report(
            "flatt_exact_f32",
            et_rel=float(np.abs(np.asarray(et) - np.asarray(et_r)).max() / scale),
            agg_rel=float(
                np.abs(np.asarray(agg) - np.asarray(agg_r)).max()
                / (np.abs(np.asarray(agg_r)).max() + 1e-30)
            ),
        )

        def loss_k(x_, ea_, ws_):
            et_, agg_ = fused_relational_flat_t(
                w, eb, "float32", None, x_, ea_,
                meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
            )
            return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

        def loss_r(x_, ea_, ws_):
            et_, agg_ = fused_relational_flat_reference(
                x_, ea_, meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
                window=w, block_e=eb,
            )
            return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

        gk = sync(jax.grad(loss_k, argnums=(0, 1, 2))(x, ea, ws))
        with jax.default_matmul_precision("highest"):
            gr = sync(jax.grad(loss_r, argnums=(0, 1, 2))(x, ea, ws))
        rels = {}
        for name, a, b in (
            ("gx", gk[0], gr[0]),
            ("gea", gk[1], gr[1]),
            ("gw2", gk[2]["w2"], gr[2]["w2"]),
        ):
            rels[name + "_rel"] = float(
                np.abs(np.asarray(a) - np.asarray(b)).max()
                / (np.abs(np.asarray(b)).max() + 1e-30)
            )
        report("flatt_exact_grads_f32", **rels)
    except Exception as ex:
        report("flatt_exact_f32", error=describe(ex)[:500])

    # --- raw kernel timing at bench scale (bf16) ---
    rng = np.random.default_rng(12)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    for w2, eb2 in ([(128, 128)] if SMOKE else [(1024, 512), (512, 512), (1024, 1024)]):
        try:
            x2, ea2, m2, st2 = build_flat_layout(rng, n, e, w2, eb2, fx, fe)
            ws2 = make_weights(rng, fx, fe, h, fo)

            @jax.jit
            def fwd(x_, ea_, ws_, m=m2, w_=w2, eb_=eb2):
                return fused_relational_flat_t(
                    w_, eb_, "bfloat16", None, x_, ea_,
                    m["sl"], m["dl"], m["inw"], m["bs"], ws_,
                )[1]

            @jax.jit
            def fwdbwd(x_, ea_, ws_, m=m2, w_=w2, eb_=eb2):
                def lf(x__, ea__, ws__):
                    et_, agg_ = fused_relational_flat_t(
                        w_, eb_, "bfloat16", None, x__, ea__,
                        m["sl"], m["dl"], m["inw"], m["bs"], ws__,
                    )
                    return (
                        jnp.sum(et_.astype(jnp.float32))
                        + jnp.sum(agg_.astype(jnp.float32))
                    )

                return jax.grad(lf, argnums=(0, 1, 2))(x_, ea_, ws_)[0]

            sync(fwd(x2, ea2, ws2))
            t_f = timeit(lambda: fwd(x2, ea2, ws2), iters=2 if SMOKE else 20)
            sync(fwdbwd(x2, ea2, ws2))
            t_fb = timeit(lambda: fwdbwd(x2, ea2, ws2), iters=2 if SMOKE else 20)
            report(
                f"flatt_kernel_w{w2}_eb{eb2}",
                fill=st2["fill"],
                fwd_ms=t_f * 1e3,
                fwdbwd_ms=t_fb * 1e3,
                edges_per_s_fwdbwd=e / t_fb,
            )
        except Exception as ex:
            report(f"flatt_kernel_w{w2}_eb{eb2}", error=describe(ex)[:500])

    # --- head-to-head EC train step ---
    rng = np.random.default_rng(2)  # same graph as exp_ec_step / exp_flat
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    xg = rng.normal(size=(n, 14)).astype(np.float32)
    eag = rng.normal(size=(e, 4)).astype(np.float32)
    y = (rng.random(e) < 0.3).astype(np.float32)
    g = EventGraph.from_arrays(
        x=xg, edge_index=np.stack([src, dst]), edge_attr=eag, y=y
    )
    loss_x = _bench_ec(
        g.sort_edges_by_target(), None, "flatt_ec_step_sorted", "xla"
    )
    for w3, eb3 in ([(128, 128)] if SMOKE else [(1024, 512), (1024, 1024)]):
        try:
            spec = default_spec(n, e, window=w3, block_e=eb3)
            g_f = apply_flat_slab_layout(
                g, spec, blocks_cap=flat_blocks_cap(n, e, spec)
            )
            loss_f = _bench_ec(
                g_f, None, f"flatt_ec_step_w{w3}_eb{eb3}", "fused_flat_t",
                fused_w=w3, fused_b=eb3,
            )
            report(
                f"flatt_ec_loss_check_w{w3}_eb{eb3}",
                loss_xla=loss_x, loss_flat_t=loss_f,
            )
        except Exception as ex:
            report(f"flatt_ec_step_w{w3}_eb{eb3}", error=describe(ex)[:500])

    # --- fwd-only decomposition (where does the step time live?) ---
    if not SMOKE:
        from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

        try:
            w4, eb4 = 1024, 512
            spec = default_spec(n, e, window=w4, block_e=eb4)
            g_f = apply_flat_slab_layout(
                g, spec, blocks_cap=flat_blocks_cap(n, e, spec)
            )
            g_f = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, g_f)
            for L in (1, 6):
                model = ECForGraphTCN(
                    interaction_node_dim=32, interaction_edge_dim=32,
                    hidden_dim=128, L_ec=L, sorted_edges=True,
                    segment_impl="fused_flat_t",
                    fused_window=w4, fused_block=eb4, fused_dtype="bfloat16",
                )
                params = jax.tree.map(
                    lambda v: v.astype(jnp.bfloat16),
                    model.init(jax.random.PRNGKey(0), g_f),
                )
                fwd = jax.jit(lambda p, g_: model.apply(p, g_)["W"].sum())
                sync(fwd(params, g_f))
                t_f = timeit(lambda: fwd(params, g_f), iters=15)
                report(f"flatt_decomp_L{L}", fwd_ms=t_f * 1e3)
        except Exception as ex:
            report("flatt_decomp", error=describe(ex)[:500])


def exp_rg_decomp():
    """Decompose the rg-condensation step (battery: 717 ms at f32): kNN
    alone on the latent, tiger-loss step (no kNN) at each precision, rg at
    bf16 — locates the 7x gap vs the tiger step (97.8 ms)."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.oc import CondensationLossRG, CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.ops.knn import knn_graph
    from gnn_tracking_tpu.training.module import TCModule

    rng = np.random.default_rng(3)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    IDIM, HDIM, L = 32, 128, 6
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    pid = rng.integers(0, 2048, size=n)
    g = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(pid[src] == pid[dst]) & (pid[src] > 0),
        particle_id=pid,
        pt=(2 * rng.random(2048))[pid],
        eta=(8 * (rng.random(2048) - 0.5))[pid],
        reconstructable=np.ones(n),
    )

    # (a) kNN alone at latent scale (fwd and fwd+bwd through distances)
    try:
        h = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

        @jax.jit
        def knn_only(h_):
            ei, mask, d = knn_graph(h_, k=64)
            return jnp.sum(jnp.where(mask, d, 0.0))

        sync(knn_only(h))
        t_k = timeit(lambda: knn_only(h), iters=2 if SMOKE else 5)

        g_k = jax.jit(jax.grad(knn_only))
        sync(g_k(h)[0, 0])
        t_kb = timeit(lambda: g_k(h)[0, 0], iters=2 if SMOKE else 5)
        report("rgdecomp_knn_only", fwd_ms=t_k * 1e3, fwdbwd_ms=t_kb * 1e3)
    except Exception as ex:
        report("rgdecomp_knn_only", error=describe(ex)[:500])

    # (b) full steps: tiger vs rg at f32 and bf16
    for prec in ("f32", "bf16"):
        for name, loss in (
            ("tiger", CondensationLossTiger(max_n_objects=2048, object_block_size=256)),
            ("rg", CondensationLossRG(max_n_objects=2048, max_num_neighbors=64)),
        ):
            try:
                module = TCModule(
                    model=GraphTCN(
                        h_dim=IDIM, e_dim=IDIM, h_outdim=8,
                        hidden_dim=HDIM, L_ec=L, L_hc=3,
                    ),
                    loss_fct=loss,
                    precision=prec,
                )
                module.setup_params(g)
                total = float(module.training_step(g)["total"])
                t = timeit(
                    lambda m=module: m.training_step(g)["total"],
                    iters=2 if SMOKE else 5,
                )
                report(
                    f"rgdecomp_{name}_{prec}",
                    ms=t * 1e3, loss=total, finite=bool(np.isfinite(total)),
                )
            except Exception as ex:
                report(f"rgdecomp_{name}_{prec}", error=describe(ex)[:500])


def exp_roofline():
    """Quantify how close the sorted-XLA EC step runs to hardware
    speed-of-light. XLA's post-optimization cost model (bytes accessed /
    flops per fused op, via Compiled.cost_analysis()) gives the memory
    and compute floors; the measured step time says which wall we're on
    and how far from it. This is the measurement behind the 'the step is
    HBM-bound, fused-kernel MXU wins can't beat the memory floor' claim
    (battery #5/#7/#9 head-to-heads)."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

    V5E_HBM_BYTES_S = 819e9
    rng = np.random.default_rng(2)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    g = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(rng.random(e) < 0.3).astype(np.float32),
    ).sort_edges_by_target()
    g = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )
    model = ECForGraphTCN(
        interaction_node_dim=32, interaction_edge_dim=32, hidden_dim=128,
        L_ec=6, sorted_edges=True, segment_impl="xla",
    )
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0), g)
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(params, opt_state, g):
        def loss_fn(p):
            w = model.apply(p, g)["W"].astype(jnp.float32)
            return binary_focal_loss(inpt=w, target=g.y.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fwd(params, g):
        return binary_focal_loss(
            inpt=model.apply(params, g)["W"].astype(jnp.float32),
            target=g.y.astype(jnp.float32),
        )

    def cost(entry):
        ca = entry.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    for tag, fn, args in (
        ("roofline_step", step, (params, opt_state, g)),
        ("roofline_fwd", fwd, (params, g)),
    ):
        try:
            compiled = jax.jit(fn).lower(*args).compile()
            fl, by = cost(compiled)
            state = list(args)

            if tag == "roofline_step":
                def once():
                    state[0], state[1], loss = compiled(state[0], state[1], state[2])
                    return loss
            else:
                def once():
                    return compiled(*state)

            t = timeit(once, iters=2 if SMOKE else 15)
            floor_hbm_ms = by / V5E_HBM_BYTES_S * 1e3
            floor_mxu_ms = fl / V5E_BF16_FLOPS * 1e3
            report(
                tag,
                ms=t * 1e3,
                xla_flops=fl,
                xla_bytes_gb=by / 1e9,
                floor_hbm_ms=floor_hbm_ms,
                floor_mxu_ms=floor_mxu_ms,
                hbm_frac_of_roofline=floor_hbm_ms / (t * 1e3),
                mxu_frac_of_roofline=floor_mxu_ms / (t * 1e3),
            )
        except Exception as ex:
            report(tag, error=describe(ex)[:500])


def exp_ec_diet():
    """Byte-diet variants of the sorted-XLA EC step. Battery #10 put the
    step at 53% of the HBM roofline with a 32 GB/step cost-model byte
    count — so the remaining lever is reducing bytes, not MXU tricks.
    Variants: per-layer remat (recompute IN intermediates in the backward
    instead of storing [E,H] activations), buffer donation (alias
    params/opt_state in place of fresh outputs), and both. Each reports
    measured ms + the XLA cost-model flops/bytes so the byte reduction is
    attributable."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

    V5E_HBM_BYTES_S = 819e9
    rng = np.random.default_rng(2)
    n, e = (2048, 16384) if SMOKE else (32768, 262144)
    src, dst = local_graph(rng, n, e, 128 if SMOKE else 1024)
    g = EventGraph.from_arrays(
        x=rng.normal(size=(n, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
        y=(rng.random(e) < 0.3).astype(np.float32),
    ).sort_edges_by_target()
    g = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )

    def cost(entry):
        ca = entry.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    for name, remat, donate in (
        ("base", False, False),
        ("remat", True, False),
        ("donate", False, True),
        ("remat_donate", True, True),
    ):
        try:
            model = ECForGraphTCN(
                interaction_node_dim=32, interaction_edge_dim=32,
                hidden_dim=128, L_ec=6, sorted_edges=True,
                segment_impl="xla", remat=remat,
            )
            params = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16),
                model.init(jax.random.PRNGKey(0), g),
            )
            tx = optax.adam(1e-3)
            opt_state = tx.init(params)

            def step(params, opt_state, g):
                def loss_fn(p):
                    w = model.apply(p, g)["W"].astype(jnp.float32)
                    return binary_focal_loss(
                        inpt=w, target=g.y.astype(jnp.float32)
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            jitted = (
                jax.jit(step, donate_argnums=(0, 1)) if donate else jax.jit(step)
            )
            compiled = jitted.lower(params, opt_state, g).compile()
            fl, by = cost(compiled)
            state = [params, opt_state]

            def once():
                state[0], state[1], loss = compiled(state[0], state[1], g)
                return loss

            t = timeit(once, iters=2 if SMOKE else 15)
            loss = float(once())
            floor_hbm_ms = by / V5E_HBM_BYTES_S * 1e3
            report(
                f"ecdiet_{name}",
                ms=t * 1e3,
                xla_bytes_gb=by / 1e9,
                floor_hbm_ms=floor_hbm_ms,
                hbm_frac_of_roofline=floor_hbm_ms / (t * 1e3),
                edges_per_s=e / t,
                loss=loss,
            )
        except Exception as ex:
            report(f"ecdiet_{name}", error=describe(ex)[:500])


def exp_flatt_grads():
    """Re-probe the flatt f32 grad exactness (battery #9: transient
    remote-compile HTTP 500 before the grad section ran)."""
    from gnn_tracking_tpu.ops.pallas.fused_relational import (
        fused_relational_flat_reference,
    )
    from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
        fused_relational_flat_t,
    )

    rng = np.random.default_rng(11)
    n, e, w, eb = (1024, 8192, 128, 128) if SMOKE else (8192, 65536, 512, 512)
    fx = fe = 32
    h, fo = 128, 32
    x, ea, meta, stats = build_flat_layout(rng, n, e, w, eb, fx, fe)
    ws = make_weights(rng, fx, fe, h, fo)

    def loss_k(x_, ea_, ws_):
        et_, agg_ = fused_relational_flat_t(
            w, eb, "float32", None, x_, ea_,
            meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
        )
        return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

    def loss_r(x_, ea_, ws_):
        et_, agg_ = fused_relational_flat_reference(
            x_, ea_, meta["sl"], meta["dl"], meta["inw"], meta["bs"], ws_,
            window=w, block_e=eb,
        )
        return jnp.sum(jnp.tanh(et_)) + jnp.sum(jnp.sin(agg_))

    try:
        gk = sync(jax.grad(loss_k, argnums=(0, 1, 2))(x, ea, ws))
        with jax.default_matmul_precision("highest"):
            gr = sync(jax.grad(loss_r, argnums=(0, 1, 2))(x, ea, ws))
        rels = {}
        for name, a, b in (
            ("gx", gk[0], gr[0]),
            ("gea", gk[1], gr[1]),
            ("gw2", gk[2]["w2"], gr[2]["w2"]),
        ):
            rels[name + "_rel"] = float(
                np.abs(np.asarray(a) - np.asarray(b)).max()
                / (np.abs(np.asarray(b)).max() + 1e-30)
            )
        report("flatt_exact_grads_f32_retry", **rels)
    except Exception as ex:
        report("flatt_exact_grads_f32_retry", error=describe(ex)[:500])


def exp_ivf_base():
    """Stage attribution of ivf_knn's remaining ~800 ms base at 262k
    (battery #16 left: probe ~37 ms, cert ~75 ms, extra_pass gated out —
    so assign/bucket/rerank must carry the rest). Times (a) sub-jitted
    stage functions mirroring the op's internals, (b) end-to-end variants:
    fast (DEFAULT-precision bf16 MXU) assignment — provably
    exactness-neutral, assignment is a clustering choice — and fewer
    Lloyd sweeps."""
    from gnn_tracking_tpu.ops.ivf_knn import _assign_blocks, _pdist2, ivf_knn
    from gnn_tracking_tpu.ops.pallas.windowed_topk import principal_axis

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 5
    n_cells = max(8, min(8192, n // 32))
    cell_cap = max(8, (3 * n) // n_cells)
    block_n = 4096

    # --- sub-stage jits -----------------------------------------------------
    @jax.jit
    def stage_order(xf):
        key = xf @ principal_axis(xf)
        return jnp.argsort(key)

    def make_quant(precision, sweeps):
        @jax.jit
        def stage_quant(xf, seeds):
            centroids = xf[seeds]

            def lloyd(c, _):
                a, _ = _assign_blocks(xf, c, block_n, precision=precision)
                sums = jax.ops.segment_sum(xf, a, num_segments=n_cells)
                cnts = jax.ops.segment_sum(
                    jnp.ones(xf.shape[0]), a, num_segments=n_cells
                )
                new = jnp.where(
                    cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None], c
                )
                return new, None

            centroids, _ = jax.lax.scan(lloyd, centroids, None, length=sweeps)
            a, _ = _assign_blocks(xf, centroids, block_n, precision=precision)
            return centroids, a

        return stage_quant

    @jax.jit
    def stage_bucket(xf, assign):
        order = jnp.argsort(assign)
        sa = assign[order]
        first = jnp.searchsorted(sa, jnp.arange(n_cells, dtype=sa.dtype))
        rank = jnp.arange(n, dtype=jnp.int32) - first[sa].astype(jnp.int32)
        in_bucket = rank < cell_cap
        slot = jnp.where(
            in_bucket, sa.astype(jnp.int32) * cell_cap + rank, n_cells * cell_cap
        )
        xb = jnp.full((n_cells * cell_cap, 8), 1e30, jnp.float32)
        xb = xb.at[slot].set(xf[order], mode="drop")
        ib = jnp.zeros((n_cells * cell_cap,), jnp.int32)
        ib = ib.at[slot].set(order.astype(jnp.int32), mode="drop")
        return xb, ib

    @jax.jit
    def stage_rerank(xf, dists, idx):
        diff = xf[:, None, :] - xf[idx]
        dr = jnp.sum(diff * diff, axis=-1)
        dr = jnp.where(jnp.isfinite(dists), dr, jnp.inf)
        neg, pos = jax.lax.top_k(-dr, 8)
        return -neg, jnp.take_along_axis(idx, pos, axis=1)

    import jax.lax as lax

    seeds = jnp.asarray(rng.permutation(n)[:n_cells].astype(np.int32))
    try:
        t = timeit(stage_order, x, iters=iters)
        report("ivfbase_order", ms=t * 1e3)
        for tag, prec, sweeps in (
            ("quant_high_l2", lax.Precision.HIGHEST, 2),
            ("quant_fast_l2", lax.Precision.DEFAULT, 2),
            ("quant_fast_l1", lax.Precision.DEFAULT, 1),
            ("quant_fast_l0", lax.Precision.DEFAULT, 0),
        ):
            f = make_quant(prec, sweeps)
            t = timeit(f, x, seeds, iters=iters)
            report(f"ivfbase_{tag}", ms=t * 1e3)
        _, assign = sync(make_quant(lax.Precision.DEFAULT, 2)(x, seeds))
        t = timeit(stage_bucket, x, assign, iters=iters)
        report("ivfbase_bucket", ms=t * 1e3)
        dd = jnp.abs(jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32)))
        ii = jnp.asarray(rng.integers(0, n, size=(n, 16)).astype(np.int32))
        t = timeit(stage_rerank, x, dd, ii, iters=iters)
        report("ivfbase_rerank", ms=t * 1e3)
    except Exception as ex:
        report("ivfbase_stages", error=describe(ex)[:400])

    # --- end-to-end variants -------------------------------------------------
    for name, kw in (
        ("fast_l2", {}),
        ("slow_assign", {"fast_assign": False}),
        ("fast_l1", {"lloyd_iters": 1}),
        ("fast_l0", {"lloyd_iters": 0}),
        ("fast_l1_T12", {"lloyd_iters": 1, "n_probe": 12}),
    ):
        try:
            d_, i_, unc = sync(ivf_knn(x, k=8, **kw))
            t = timeit(lambda kw=kw: ivf_knn(x, k=8, **kw)[0], iters=iters)
            report(f"ivfbase_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivfbase_{name}", error=describe(ex)[:300])

    # exactness spot-check of the new default vs brute force
    try:
        from gnn_tracking_tpu.ops.pallas.windowed_topk import _fallback_brute

        nm = jnp.ones((n,), bool)
        d_, i_, unc = sync(ivf_knn(x, k=8))
        sub = jnp.asarray(rng.permutation(n)[:4096].astype(np.int32))
        bd, bi = sync(
            _fallback_brute(
                x[sub], x, nm, k=8, block_c=1024, loop=False,
                self_ids=sub, interpret=False,
            )
        )
        diff = x[sub][:, None, :] - x[bi]
        bdr = jnp.sum(diff * diff, axis=-1)
        neg, pos = jax.lax.top_k(-bdr, 8)
        bi = jnp.take_along_axis(bi, pos, axis=1)
        same = int(
            sum(
                set(np.asarray(a).tolist()) == set(np.asarray(b).tolist())
                for a, b in zip(np.asarray(i_)[np.asarray(sub)], np.asarray(bi))
            )
        )
        # ties: index sets may legitimately differ at equal distance, so
        # the hard criterion is the sorted distance spectrum
        bd_sorted = np.sort(np.asarray(-neg), axis=1)
        id_sorted = np.sort(np.asarray(d_)[np.asarray(sub)], axis=1)
        max_dd = float(np.abs(bd_sorted - id_sorted).max())
        report(
            "ivfbase_exact", same_idx_sets=same, checked=4096,
            max_abs_ddist=max_dd, n_uncert=int(unc),
        )
    except Exception as ex:
        report("ivfbase_exact", error=describe(ex)[:400])


def exp_ivf_oracle():
    """Definitive exactness attribution with a host float64 numpy oracle.

    ``ivfbase_exact`` (battery #17) showed 191/4096 neighbor-set diffs
    (max spectrum diff 0.012) between default ivf_knn and the streaming
    brute kernel — but BOTH sides there carry f32/selection noise, so it
    cannot say which is wrong. Here the reference is an exact float64
    host computation (no MXU, no norm expansion), and each suspect factor
    (bf16 assignment, Pallas probe, widened candidate table) is toggled
    independently."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    xn = (centers[who] + 0.05 * rng.normal(size=(n, 8))).astype(np.float32)
    x = jnp.asarray(xn)

    # host float64 oracle: exact k-th smallest distance spectrum for a
    # fixed query subset (self excluded)
    q_sub = rng.permutation(n)[:2048].astype(np.int64)
    xs = xn.astype(np.float64)
    k = 8
    oracle = np.empty((len(q_sub), k))
    for a in range(0, len(q_sub), 256):
        qs = q_sub[a : a + 256]
        dd = ((xs[qs][:, None, :] - xs[None, :, :]) ** 2).sum(-1)
        dd[np.arange(len(qs)), qs] = np.inf
        oracle[a : a + 256] = np.sort(np.partition(dd, k, axis=1)[:, :k], 1)

    def check(name, **kw):
        try:
            d_, i_, unc = sync(ivf_knn(x, k=k, **kw))
            ii = np.asarray(i_)[q_sub]
            got = np.sort(((xs[q_sub][:, None, :] - xs[ii]) ** 2).sum(-1), 1)
            bad = (~np.isclose(got, oracle, rtol=1e-4, atol=1e-6)).any(1)
            report(
                f"ivforacle_{name}",
                n_uncert=int(unc),
                frac_bad=float(bad.mean()),
                n_bad=int(bad.sum()),
                max_abs=float(np.abs(got - oracle).max()),
            )
            return bad
        except Exception as ex:
            report(f"ivforacle_{name}", error=describe(ex)[:400])
            return None

    check("default", )
    check("high_assign", fast_assign=False)
    check("xla_probe_widecand", probe_impl="xla", cand_cap=144)
    check("xla_probe_narrowcand", probe_impl="xla")
    check("pallas_narrowcand", probe_impl="pallas", cand_cap=96)
    check("high_assign_xla_narrow", fast_assign=False, probe_impl="xla")

    # and the brute kernel itself vs the oracle (is the OLD check's
    # reference side the noisy one?)
    try:
        from gnn_tracking_tpu.ops.pallas.windowed_topk import _fallback_brute

        sub_j = jnp.asarray(q_sub.astype(np.int32))
        fb_d, fb_i = sync(
            _fallback_brute(
                x[sub_j], x, jnp.ones((n,), bool), k=k, block_c=1024,
                loop=False, self_ids=sub_j, interpret=False,
            )
        )
        ii = np.asarray(fb_i)
        got = np.sort(((xs[q_sub][:, None, :] - xs[ii]) ** 2).sum(-1), 1)
        bad = (~np.isclose(got, oracle, rtol=1e-4, atol=1e-6)).any(1)
        report(
            "ivforacle_brute_kernel",
            frac_bad=float(bad.mean()),
            n_bad=int(bad.sum()),
            max_abs=float(np.abs(got - oracle).max()),
        )
    except Exception as ex:
        report("ivforacle_brute_kernel", error=describe(ex)[:400])


def exp_ivf_base2():
    """Follow-up to ivfbase (battery #17: bucket 237 ms, rerank 140 ms are
    the base): attribute bucket time between the argsort and the scatter
    table builds, and time the two candidate fixes — gather-built tables
    (no scatters) and select-only rerank (valid whenever merge distances
    are already direct-formula exact, i.e. the Pallas-probe path with no
    extra pass)."""
    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    d = 8
    n_cells = max(8, min(8192, n // 32))
    cell_cap = max(8, (3 * n) // n_cells)
    cand_cap = cell_cap + cell_cap // 2
    centers = rng.normal(size=(n // 64, d)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, d)).astype(np.float32))
    assign = jnp.asarray(rng.integers(0, n_cells, size=n).astype(np.int32))
    iters = 2 if SMOKE else 10

    @jax.jit
    def stage_argsort(a):
        return jnp.argsort(a)

    @jax.jit
    def stage_bucket_scatter(xf, a):
        order = jnp.argsort(a)
        sa = a[order]
        first = jnp.searchsorted(sa, jnp.arange(n_cells, dtype=sa.dtype))
        rank = jnp.arange(n, dtype=jnp.int32) - first[sa].astype(jnp.int32)
        out = []
        for cap in (cell_cap, cand_cap):
            in_b = rank < cap
            slot = jnp.where(
                in_b, sa.astype(jnp.int32) * cap + rank, n_cells * cap
            )
            xb = jnp.full((n_cells * cap, d), 1e30, jnp.float32)
            xb = xb.at[slot].set(xf[order], mode="drop")
            ib = jnp.zeros((n_cells * cap,), jnp.int32)
            ib = ib.at[slot].set(order.astype(jnp.int32), mode="drop")
            vb = jnp.zeros((n_cells * cap,), bool).at[slot].set(in_b, mode="drop")
            out += [xb, ib, vb]
        return tuple(out)

    @jax.jit
    def stage_bucket_gather(xf, a):
        order = jnp.argsort(a).astype(jnp.int32)
        sa = a[order]
        first = jnp.searchsorted(sa, jnp.arange(n_cells, dtype=sa.dtype)).astype(
            jnp.int32
        )
        cnt = jnp.append(first, jnp.int32(n))[1:] - first
        out = []
        for cap in (cell_cap, cand_cap):
            r = jnp.arange(cap, dtype=jnp.int32)[None, :]
            pos = first[:, None] + r
            valid = r < cnt[:, None]
            take = order[jnp.clip(pos, 0, n - 1)]
            xb = jnp.where(valid[..., None], xf[take], 1e30).reshape(-1, d)
            ib = jnp.where(valid, take, 0).reshape(-1)
            out += [xb, ib, valid.reshape(-1)]
        return tuple(out)

    @jax.jit
    def stage_rerank_select(dists, idx):
        neg, pos = jax.lax.top_k(-dists, 8)
        return -neg, jnp.take_along_axis(idx, pos, axis=1)

    try:
        t = timeit(stage_argsort, assign, iters=iters)
        report("ivfbase2_argsort", ms=t * 1e3)
        t = timeit(stage_bucket_scatter, x, assign, iters=iters)
        report("ivfbase2_bucket_scatter_both", ms=t * 1e3)
        t = timeit(stage_bucket_gather, x, assign, iters=iters)
        report("ivfbase2_bucket_gather_both", ms=t * 1e3)
        # equivalence of the two bucket builds
        s = sync(stage_bucket_scatter(x, assign))
        g = sync(stage_bucket_gather(x, assign))
        ok = all(
            bool(jnp.all(jnp.where(sv[:, None] if a.ndim == 2 else sv, a, 0)
                         == jnp.where(sv[:, None] if b.ndim == 2 else sv, b, 0)))
            for a, b, sv in (
                (s[0], g[0], s[2]), (s[1], g[1], s[2]),
                (s[3], g[3], s[5]), (s[4], g[4], s[5]),
            )
        ) and bool(jnp.all(s[2] == g[2])) and bool(jnp.all(s[5] == g[5]))
        report("ivfbase2_bucket_match", ok=ok)
        dd = jnp.abs(jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32)))
        ii = jnp.asarray(rng.integers(0, n, size=(n, 16)).astype(np.int32))
        t = timeit(stage_rerank_select, dd, ii, iters=iters)
        report("ivfbase2_rerank_select", ms=t * 1e3)
    except Exception as ex:
        report("ivfbase2", error=describe(ex)[:400])


def exp_ivf_new():
    """Battery #19: end-to-end impact of the select-only rerank (Pallas
    probe distances are already direct-formula exact and sorted) and the
    gather-vs-scatter slab table builds, at 262k. Oracle-style exactness
    stamp on the winning config."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    xn = (centers[who] + 0.05 * rng.normal(size=(n, 8))).astype(np.float32)
    x = jnp.asarray(xn)
    iters = 2 if SMOKE else 8

    q_sub = rng.permutation(n)[:2048].astype(np.int64)
    xs = xn.astype(np.float64)
    k = 8
    oracle = np.empty((len(q_sub), k))
    for a in range(0, len(q_sub), 256):
        qs = q_sub[a : a + 256]
        dd = ((xs[qs][:, None, :] - xs[None, :, :]) ** 2).sum(-1)
        dd[np.arange(len(qs)), qs] = np.inf
        oracle[a : a + 256] = np.sort(np.partition(dd, k, axis=1)[:, :k], 1)

    for name, kw in (
        ("scatter", dict(bucket_impl="scatter")),
        ("gather", dict(bucket_impl="gather")),
    ):
        try:
            d_, i_, unc = sync(ivf_knn(x, k=k, **kw))
            t = timeit(lambda: ivf_knn(x, k=k, **kw)[0], iters=iters)
            ii = np.asarray(i_)[q_sub]
            got = np.sort(((xs[q_sub][:, None, :] - xs[ii]) ** 2).sum(-1), 1)
            bad = (~np.isclose(got, oracle, rtol=1e-4, atol=1e-6)).any(1)
            report(
                f"ivfnew_{name}",
                ms=t * 1e3,
                n_uncert=int(unc),
                frac_bad=float(bad.mean()),
                n_bad=int(bad.sum()),
            )
        except Exception as ex:
            report(f"ivfnew_{name}", error=describe(ex)[:400])


def exp_cc_lanes():
    """Battery #19b: trials-on-lanes batched DBSCAN scan vs the vmapped
    formulation (ROADMAP #3 target <30 ms/trial; vmap measured 31.9 ms)."""
    from gnn_tracking_tpu.postprocessing.fastrescanner import DBSCANFastRescan

    rng = np.random.default_rng(5)
    n = 2048 if SMOKE else 16384
    centers = rng.normal(size=(n // 8, 4)).astype(np.float32)
    x = centers[rng.integers(0, n // 8, size=n)] + 0.03 * rng.normal(
        size=(n, 4)
    ).astype(np.float32)
    rescan = DBSCANFastRescan(x, max_eps=0.5, max_num_neighbors=64)
    trials = [{"eps": e, "min_samples": 3} for e in np.linspace(0.02, 0.5, 12)]
    iters = 1 if SMOKE else 5
    outs = {}
    for impl in ("lanes", "vmap"):
        try:
            outs[impl] = rescan.cluster_many(trials, impl=impl)  # compile
            t0 = time.perf_counter()
            for _ in range(iters):
                out = rescan.cluster_many(trials, impl=impl)
            dt = (time.perf_counter() - t0) / iters
            report(
                f"cclanes_{impl}",
                ms_per_trial=dt / len(trials) * 1e3,
                total_ms=dt * 1e3,
            )
        except Exception as ex:
            report(f"cclanes_{impl}", error=describe(ex)[:400])
    if len(outs) == 2:
        report("cclanes_match", ok=bool(np.array_equal(outs["lanes"], outs["vmap"])))


def exp_ivf_glue():
    """Battery #20: cumulative stage toggles for the ~500 ms of 262k
    ivf_knn time unattributed by ivfbase (order 20 + quant 32 + bucket
    184-scatter + probe ~40 + cert ~75 + rerank 0 ≈ 350 of ~900). Also
    times the centroid-neighbor table (cdist [C,C] + top_k T) and the
    cell-radius reduction standalone."""
    from gnn_tracking_tpu.ops.ivf_knn import _pdist2, ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 8
    n_cells = max(8, min(8192, n // 32))

    for name, kw in (
        ("probe_only", dict(certify=False, fallback=False, spill_passes=False)),
        ("plus_spill", dict(certify=False, fallback=False)),
        ("plus_cert", dict(fallback=False)),
        ("full", {}),
        ("full_scatter", dict(bucket_impl="scatter")),
        # battery #20 found plus_spill - probe_only = 535 ms: n_resid > 0
        # on this cloud, so the extra_pass + full-rerank conds FIRE. Sweep
        # the candidate width until the table swallows every residual
        # (signature: the ~500 ms cliff disappears)
        ("cand192", dict(cand_cap=192)),
        ("cand256", dict(cand_cap=256)),
        ("cap128", dict(cell_cap=128)),
        ("cap128_cand256", dict(cell_cap=128, cand_cap=256)),
    ):
        try:
            _, _, unc = sync(ivf_knn(x, k=8, **kw))
            t = timeit(lambda kw=kw: ivf_knn(x, k=8, **kw)[0], iters=iters)
            report(f"ivfglue_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivfglue_{name}", error=describe(ex)[:300])

    # standalone: centroid-neighbor table and radius reduction
    c = jnp.asarray(rng.normal(size=(n_cells, 8)).astype(np.float32))
    assign = jnp.asarray(rng.integers(0, n_cells, size=n).astype(np.int32))

    @jax.jit
    def nbr_table(c):
        cdist = _pdist2(c, c)
        _, nbr = jax.lax.top_k(-cdist, 8)
        return nbr

    @jax.jit
    def radius(xf, c, a):
        d = jnp.sqrt(jnp.maximum(jnp.sum((xf - c[a]) ** 2, axis=1), 0.0))
        return jax.ops.segment_max(d, a, num_segments=n_cells)

    try:
        t = timeit(nbr_table, c, iters=iters)
        report("ivfglue_nbr_table", ms=t * 1e3)
        t = timeit(radius, x, c, assign, iters=iters)
        report("ivfglue_radius", ms=t * 1e3)
    except Exception as ex:
        report("ivfglue_aux", error=describe(ex)[:300])


EXPS = {
    "ivfglue": exp_ivf_glue,
    "cclanes": exp_cc_lanes,
    "ivfnew": exp_ivf_new,
    "ivforacle": exp_ivf_oracle,
    "ivfbase2": exp_ivf_base2,
    "ivfbase": exp_ivf_base,
    "roofline": exp_roofline,
    "ecdiet": exp_ec_diet,
    "flattg": exp_flatt_grads,
    "flat": exp_flat,
    "flatt": exp_flat_t,
    "rgdec": exp_rg_decomp,
    "exact": exp_exact,
    "exact2": exp_exact2,
    "micro": exp_micro,
    "ec": exp_ec_step,
    "rg64": exp_rg64,
    "knnbig": exp_knnbig,
    "cc": exp_cc,
    "ivf": exp_ivf,
    "ivfdec": exp_ivf_decomp,
    "ivfstage": exp_ivf_stages,
    "probep": exp_probe_pallas,
    "tcn": exp_tcn,
    "decomp": exp_decomp,
    "prec": exp_prec,
}


def main():
    claim_or_exit()
    names = sys.argv[1:] or list(EXPS)
    for name in names:
        try:
            EXPS[name]()
        except Exception as e:
            report(name, error=describe(e)[:600])
    report("battery_done", ok=True)


if __name__ == "__main__":
    main()
