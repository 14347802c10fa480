"""Round-3 TPU battery: EC-step anatomy (VERDICT #1 groundwork).

Battery #9/#10/#12 established: sorted-XLA EC step 73.8 ms / 32.1 GB (53%
of the 819 GB/s HBM roofline), fwd 23.7 ms / 13.2 GB (68%); per-layer fused
kernels beat XLA 2x raw but TIE at step level; remat/donation are dead
ends. What was never measured is WHERE inside the step the bytes/time live:
per-IN-layer marginals, the W head, the loss/adam intercept, and the
per-piece cost (gather / relational MLP / scatter / object MLP) of a single
layer including its backward. This battery measures exactly that, so the
cross-layer-fusion design (VERDICT round-2 item #1) attacks the real
hot spot instead of a guess.

Experiments:
- anatomy: one sorted-XLA IN layer at bench scale, cumulative pieces
  (gathers -> +relational MLP -> +segment-sum -> +object MLP), fwd and
  fwd+bwd, each with XLA cost-model bytes;
- lsweep:  full EC step at L in {1,3,6} (+ no-intermediate-embeddings arm)
  fwd / step ms + bytes -> per-layer marginal and intercept;
- tbound:  transposed-kernel config sweep (w,eb) + boundary-transpose
  micro at bench scale (the flatt integration overhead).

Usage: python scripts/tpu_battery_r3.py [exp ...]   (default: all)
BATTERY_SMOKE=1 BATTERY_CPU=1 for the CPU sanity pass.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import jax

if os.environ.get("BATTERY_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from tpu_experiments import claim_or_exit, describe, report, sync, timeit
from tpu_battery_r2 import local_graph, make_weights, build_flat_layout

V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9
SMOKE = bool(int(os.environ.get("BATTERY_SMOKE", "0")))

N, E = (2048, 16384) if SMOKE else (32768, 262144)
IDIM, HDIM, L_FULL = 32, 128, 6
ITERS = 2 if SMOKE else 15


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _timed(tag, fn, *args, iters=ITERS):
    """Compile fn(*args), report ms + XLA cost-model flops/bytes."""
    compiled = jax.jit(fn).lower(*args).compile()
    fl, by = _cost(compiled)
    sync(compiled(*args))
    t = timeit(lambda: compiled(*args), iters=iters)
    report(
        tag, ms=t * 1e3, xla_bytes_gb=by / 1e9,
        hbm_floor_ms=by / V5E_HBM_BYTES_S * 1e3,
        mxu_floor_ms=fl / V5E_BF16_FLOPS * 1e3,
    )
    return t


def _bench_graph(rng_seed=2):
    from gnn_tracking_tpu.graphs import EventGraph

    rng = np.random.default_rng(rng_seed)
    src, dst = local_graph(rng, N, E, 128 if SMOKE else 1024)
    g = EventGraph.from_arrays(
        x=rng.normal(size=(N, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
        y=(rng.random(E) < 0.3).astype(np.float32),
    ).sort_edges_by_target()
    return jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )


def exp_anatomy():
    """Cumulative piece timings of ONE sorted-XLA interaction layer at
    bench scale (same ops as models/interaction_network.py), fwd and
    fwd+bwd (grads wrt x, e, weights), with XLA cost-model bytes."""
    from gnn_tracking_tpu.ops.segment import (
        masked_segment_sum,
        sorted_take,
        take_sorted_by,
    )

    g = _bench_graph()
    src, dst = g.edge_index[0], g.edge_index[1]
    extras = g.extras
    rng = np.random.default_rng(5)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(N, IDIM)), dt)
    e = jnp.asarray(rng.normal(size=(E, IDIM)), dt)

    def mk(shape):
        fan = shape[0]
        return jnp.asarray(rng.normal(size=shape) / np.sqrt(fan), dt)

    ws = {
        "w1": mk((3 * IDIM, HDIM)), "b1": jnp.zeros((HDIM,), dt),
        "w2": mk((HDIM, HDIM)), "b2": jnp.zeros((HDIM,), dt),
        "w3": mk((HDIM, IDIM)), "b3": jnp.zeros((IDIM,), dt),
        "o1": mk((2 * IDIM, HDIM)), "ob1": jnp.zeros((HDIM,), dt),
        "o2": mk((HDIM, HDIM)), "ob2": jnp.zeros((HDIM,), dt),
        "o3": mk((HDIM, IDIM)), "ob3": jnp.zeros((IDIM,), dt),
    }

    def gathers(x_, e_, ws_):
        xd = sorted_take(x_, dst)
        xs = take_sorted_by(x_, src, extras["src_perm"], extras["src_sorted"])
        return jnp.concatenate([xd, xs, e_], axis=1)

    def relational(x_, e_, ws_):
        m = gathers(x_, e_, ws_)
        h1 = jax.nn.relu(m @ ws_["w1"] + ws_["b1"])
        h2 = jax.nn.relu(h1 @ ws_["w2"] + ws_["b2"])
        return h2 @ ws_["w3"] + ws_["b3"]

    def scattered(x_, e_, ws_):
        et = relational(x_, e_, ws_)
        agg = masked_segment_sum(et, dst, N, None, indices_are_sorted=True)
        return et, agg

    def full_layer(x_, e_, ws_):
        et, agg = scattered(x_, e_, ws_)
        m = jnp.concatenate([x_, agg], axis=1)
        h1 = jax.nn.relu(m @ ws_["o1"] + ws_["ob1"])
        h2 = jax.nn.relu(h1 @ ws_["o2"] + ws_["ob2"])
        return et, h2 @ ws_["o3"] + ws_["ob3"]

    # full-rank TRACED cotangents (built from the e_ argument): plain
    # .sum() gives constant (ones) cotangents that XLA constant-folds; a
    # rank-1 or captured-constant weight lets it rewrite the backward
    # scatter away. Neither measures the real gather backward.
    pieces = [
        ("gathers", lambda x_, e_, w_: (
            gathers(x_, e_, w_)
            * jnp.concatenate([e_, e_, e_], axis=1)
        ).astype(jnp.float32).sum()),
        ("relational", lambda x_, e_, w_: relational(x_, e_, w_).astype(jnp.float32).sum()),
        ("scattered", lambda x_, e_, w_: sum(
            v.astype(jnp.float32).sum() for v in scattered(x_, e_, w_))),
        ("full_layer", lambda x_, e_, w_: sum(
            v.astype(jnp.float32).sum() for v in full_layer(x_, e_, w_))),
    ]
    for name, fn in pieces:
        try:
            _timed(f"anatomy_fwd_{name}", fn, x, e, ws)
            _timed(
                f"anatomy_fb_{name}",
                lambda x_, e_, w_, fn=fn: jax.grad(fn, argnums=(0, 1, 2))(x_, e_, w_),
                x, e, ws,
            )
        except Exception as ex:
            report(f"anatomy_{name}", error=describe(ex)[:400])

    # unsorted-scatter control: how much does the sorted promise save?
    try:
        def unsorted_gather(x_, e_, w_):
            return ((x_[dst] + x_[src]) * e_).astype(jnp.float32).sum()

        _timed("anatomy_fb_unsorted_gathers",
               lambda x_, e_, w_: jax.grad(unsorted_gather)(x_, e_, w_), x, e, ws)

        def sorted_gathers_w(x_, e_, w_):
            xd = sorted_take(x_, dst)
            xs = take_sorted_by(
                x_, src, extras["src_perm"], extras["src_sorted"]
            )
            return ((xd + xs) * e_).astype(jnp.float32).sum()

        _timed("anatomy_fb_sorted_gathers",
               lambda x_, e_, w_: jax.grad(sorted_gathers_w)(x_, e_, w_), x, e, ws)
    except Exception as ex:
        report("anatomy_unsorted", error=describe(ex)[:400])


def exp_lsweep():
    """Full EC train step at L in {1, 3, 6}: fwd / step ms + bytes ->
    per-layer marginal cost and the encoders+W+loss+adam intercept; plus
    the no-intermediate-edge-embeddings arm isolating the W head's width."""
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN

    g = _bench_graph()

    def run(L, collect, tag):
        model = ECForGraphTCN(
            interaction_node_dim=IDIM, interaction_edge_dim=IDIM,
            hidden_dim=HDIM, L_ec=L, sorted_edges=True, segment_impl="xla",
            use_intermediate_edge_embeddings=collect,
        )
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0), g)
        )
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def fwd(p, g_):
            return binary_focal_loss(
                inpt=model.apply(p, g_)["W"].astype(jnp.float32),
                target=g_.y.astype(jnp.float32),
            )

        def step(p, o, g_):
            loss, grads = jax.value_and_grad(fwd)(p, g_)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        try:
            _timed(f"lsweep_fwd_{tag}", fwd, params, g)
            compiled = jax.jit(step).lower(params, opt_state, g).compile()
            fl, by = _cost(compiled)
            state = [params, opt_state]

            def once():
                state[0], state[1], loss = compiled(state[0], state[1], g)
                return loss

            sync(once())
            t = timeit(once, iters=ITERS)
            report(
                f"lsweep_step_{tag}", ms=t * 1e3, xla_bytes_gb=by / 1e9,
                hbm_floor_ms=by / V5E_HBM_BYTES_S * 1e3,
                edges_per_s=E / t,
            )
        except Exception as ex:
            report(f"lsweep_{tag}", error=describe(ex)[:400])

    for L in (1, 3, 6):
        run(L, True, f"L{L}")
    run(6, False, "L6_noembeds")


def exp_tbound():
    """Transposed fused kernel (w, eb) sweep + boundary-transpose micro:
    what does flatt integration actually pay per layer boundary?"""
    from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
        fused_relational_flat_t,
    )

    rng = np.random.default_rng(12)
    fx = fe = IDIM
    h, fo = HDIM, IDIM
    configs = [(128, 128)] if SMOKE else [
        (512, 512), (512, 1024), (1024, 512), (1024, 1024),
        (512, 2048), (1024, 2048),
    ]
    for w2, eb2 in configs:
        try:
            x2, ea2, m2, st2 = build_flat_layout(rng, N, E, w2, eb2, fx, fe)
            ws2 = make_weights(rng, fx, fe, h, fo)

            def fwd(x_, ea_, ws_, m=m2, w_=w2, eb_=eb2):
                return fused_relational_flat_t(
                    w_, eb_, "bfloat16", None, x_, ea_,
                    m["sl"], m["dl"], m["inw"], m["bs"], ws_,
                )[1].astype(jnp.float32).sum()

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

            t_f = _timed(f"tbound_kernel_fwd_w{w2}_eb{eb2}", fwd, x2, ea2, ws2)
            t_fb = _timed(f"tbound_kernel_fb_w{w2}_eb{eb2}", fwdbwd, x2, ea2, ws2)
            report(
                f"tbound_kernel_w{w2}_eb{eb2}", fill=st2["fill"],
                fwd_ms=t_f * 1e3, fwdbwd_ms=t_fb * 1e3,
            )
        except Exception as ex:
            report(f"tbound_kernel_w{w2}_eb{eb2}", error=describe(ex)[:400])

    # boundary transposes: what one layer boundary pays in flatt mode
    try:
        e_pad = int(np.ceil(E * 1.13 / 512) * 512)
        a = jnp.asarray(
            np.random.default_rng(0).normal(size=(e_pad, IDIM)), jnp.bfloat16
        )
        at = jnp.asarray(np.asarray(a).T.copy(), jnp.bfloat16)
        _timed("tbound_transpose_EF_to_FE", lambda v: v.T.astype(jnp.float32).sum(), a)
        _timed("tbound_transpose_FE_to_EF", lambda v: v.T.astype(jnp.float32).sum(), at)
        def roundtrip6(v):
            out = jnp.float32(0.0)
            for i in range(6):
                v = (v + jnp.bfloat16(i + 1)).T  # force 6 real relayouts
                out += v.astype(jnp.float32).sum()
            return out

        _timed("tbound_transpose_roundtrip6", roundtrip6, a)
    except Exception as ex:
        report("tbound_transpose", error=describe(ex)[:400])


def exp_stackstep():
    """THE decisive head-to-head: full EC train step at bench scale,
    sorted-XLA vs per-layer fused (flat_t) vs the cross-layer stack
    (fused_stack_t), plus fwd-only splits and a (w, eb) sweep for the
    stack. Target (VERDICT #1): step <= 50 ms / >= 5.2 M edges/s."""
    import optax

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout,
        default_spec,
        flat_blocks_cap,
    )

    rng = np.random.default_rng(7)
    src, dst = local_graph(rng, N, E, 128 if SMOKE else 1024)
    base = EventGraph.from_arrays(
        x=rng.normal(size=(N, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
        y=(rng.random(E) < 0.3).astype(np.float32),
    )

    def to_bf16(g):
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32
            else v,
            g,
        )

    def run(tag, impl, w, eb, sorted_edges):
        g = base
        if impl.startswith("fused"):
            spec = default_spec(N, E, window=w, block_e=eb)
            g = apply_flat_slab_layout(g, spec, blocks_cap=flat_blocks_cap(N, E, spec))
        elif sorted_edges:
            g = g.sort_edges_by_target()
        g = to_bf16(g)
        model = ECForGraphTCN(
            interaction_node_dim=IDIM, interaction_edge_dim=IDIM,
            hidden_dim=HDIM, L_ec=L_FULL, sorted_edges=sorted_edges,
            segment_impl=impl, fused_window=w, fused_block=eb,
            fused_dtype="bfloat16",
        )
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0), g)
        )
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def fwd(p, g_):
            return binary_focal_loss(
                inpt=model.apply(p, g_)["W"].astype(jnp.float32),
                target=g_.y.astype(jnp.float32),
            )

        def step(p, o, g_):
            loss, grads = jax.value_and_grad(fwd)(p, g_)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        _timed(f"stackstep_fwd_{tag}", fwd, params, g)
        compiled = jax.jit(step).lower(params, opt_state, g).compile()
        fl, by = _cost(compiled)
        state = [params, opt_state]

        def once():
            state[0], state[1], loss = compiled(state[0], state[1], g)
            return loss

        loss0 = float(sync(once()))
        t = timeit(once, iters=ITERS)
        report(
            f"stackstep_step_{tag}", ms=t * 1e3, xla_bytes_gb=by / 1e9,
            hbm_floor_ms=by / V5E_HBM_BYTES_S * 1e3,
            edges_per_s=E / t, loss=loss0,
        )

    # graph locality is 1024 -> slab windows below 1024 overflow the
    # flat layout's overflow_cap (first hardware run: SlabLayoutError)
    cfgs = [("sorted", "xla", 0, 0, True)]
    if not SMOKE:
        cfgs += [("flat_t_w1024_eb512", "fused_flat_t", 1024, 512, False)]
    cfgs += (
        [("stack_w128_eb128", "fused_stack_t", 128, 128, False)]
        if SMOKE
        else [
            ("stack_w1024_eb512", "fused_stack_t", 1024, 512, False),
            ("stack_w1024_eb1024", "fused_stack_t", 1024, 1024, False),
            ("stack_w1024_eb2048", "fused_stack_t", 1024, 2048, False),
        ]
    )
    for tag, impl, w, eb, sorted_edges in cfgs:
        try:
            run(tag, impl, w, eb, sorted_edges)
        except Exception as ex:
            report(f"stackstep_{tag}", error=describe(ex)[:400])


def exp_stackfix():
    """Isolate the stack-bwd remote-compile HTTP 500 (first hardware run):
    compile+time the tt op's fwd+bwd alone at bench scale with
    relu_edge False/True, bf16 and f32."""
    from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
        fused_relational_layer_tt,
    )

    rng = np.random.default_rng(12)
    fx = fe = IDIM
    h, fo = HDIM, IDIM
    w2, eb2 = (128, 128) if SMOKE else (1024, 512)
    x2, ea2, m2, st2 = build_flat_layout(rng, N, E, w2, eb2, fx, fe)
    ws2 = make_weights(rng, fx, fe, h, fo)
    fe8 = fe + (-fe) % 8
    eat = jnp.pad(ea2.T, ((0, fe8 - fe), (0, 0)))

    # order matters: a crashed compile helper can poison subsequent
    # compiles for a window, so probe the arm we most need (the new
    # gdst/gsrc-only save backward) FIRST on a fresh helper
    for cd in ("bfloat16",):
        for relu, save in ((False, True), (True, False), (False, False), (True, True)):
            tag = f"relu{int(relu)}_save{int(save)}_{cd}"
            try:
                def fb(x_, eat_, ws_, relu=relu, cd=cd, save=save):
                    def lf(x__, eat__, ws__):
                        et, agg = fused_relational_layer_tt(
                            w2, eb2, cd, None, relu, save, x__, eat__,
                            m2["sl"], m2["dl"], m2["inw"], m2["bs"], ws__,
                        )
                        return (
                            jnp.sum(et.astype(jnp.float32))
                            + jnp.sum(agg.astype(jnp.float32))
                        )

                    return jax.grad(lf, argnums=(0, 1, 2))(x_, eat_, ws_)[0]

                t = _timed(f"stackfix_fb_{tag}", fb, x2, eat, ws2)
            except Exception as ex:
                report(f"stackfix_{tag}", error=describe(ex)[:400])


def exp_ivfglue():
    """VERDICT #2 groundwork: attribute the ~400 ms of unexplained 'glue'
    in the 262k exact kNN (battery #20 accounted ~350-450 of ~850 ms).
    (a) cumulative e2e toggles; (b) isolated micros of every glue piece
    #20 did not time (nbr top_k over the [C, C] centroid table, cell-radius
    segment max, bucket order/rank build, spill/resid nonzero scans,
    slot-map scatter-back, per-pass merged top_k)."""
    from gnn_tracking_tpu.ops.ivf_knn import _assign_blocks, _pdist2, ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    d = 8
    centers = rng.normal(size=(n // 64, d)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = jnp.asarray(centers[who] + 0.05 * rng.normal(size=(n, d)).astype(np.float32))
    iters = 2 if SMOKE else 5
    k = 8

    variants = [
        ("full", {}),
        ("nofb", {"fallback": False}),
        ("nocert", {"fallback": False, "certify": False}),
        ("nospill", {"fallback": False, "certify": False, "spill_passes": False}),
        ("nospill_cand96", {
            "fallback": False, "certify": False, "spill_passes": False,
            "cand_cap": 96,
        }),
        ("probe16", {"fallback": False, "certify": False, "n_probe": 16}),
    ]
    for name, kwv in variants:
        try:
            _, _, unc = sync(ivf_knn(x, k=k, **kwv))
            t = timeit(lambda kwv=kwv: ivf_knn(x, k=k, **kwv)[0], iters=iters)
            report(f"ivfglue_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivfglue_{name}", error=describe(ex)[:300])

    # ---- isolated glue micros at the ivf_knn-internal shapes ----
    n_cells = max(8, min(8192, n // 32))
    cell_cap = max(8, (3 * n) // n_cells)
    kw = k + 8
    extra_cap = min(8192, n)
    cents = jnp.asarray(rng.normal(size=(n_cells, d)).astype(np.float32))
    assign = jnp.asarray(rng.integers(0, n_cells, size=n).astype(np.int32))
    flags = jnp.asarray(rng.random(n) < 0.01)
    dkw = jnp.asarray(rng.random((n, kw)).astype(np.float32))
    ikw = jnp.asarray(rng.integers(0, n, size=(n, kw)).astype(np.int32))
    # every operand rides as a jit ARGUMENT (captured constants get
    # constant-folded at compile time and time as no-ops)
    micros = [
        ("nbr_topk_CC", lambda c: jax.lax.top_k(-_pdist2(c, c), 8)[1],
         (cents,)),
        ("rad_segmax", lambda xx, a, c: jax.ops.segment_max(
            jnp.sqrt(jnp.sum((xx - c[a]) ** 2, axis=1)),
            a, num_segments=n_cells), (x, assign, cents)),
        ("order_argsort", lambda a: jnp.argsort(a), (assign,)),
        ("rank_searchsorted", lambda a: jnp.searchsorted(
            jnp.sort(a), jnp.arange(n_cells, dtype=jnp.int32)), (assign,)),
        ("nonzero_scan_x2", lambda f: (
            jnp.nonzero(f, size=extra_cap, fill_value=0)[0],
            jnp.nonzero(~f, size=extra_cap, fill_value=0)[0]), (flags,)),
        ("slotmap_scatter_gather", lambda dk, ik: jnp.take(
            dk,
            jnp.minimum(
                jnp.full((n,), n, jnp.int32).at[ik[:, 0]].set(
                    jnp.arange(n, dtype=jnp.int32), mode="drop"),
                n - 1),
            axis=0), (dkw, ikw)),
        ("merge_topk_2kw", lambda dk: jax.lax.top_k(
            -jnp.concatenate([dk, dk], axis=1), kw), (dkw,)),
        ("final_assign", lambda xx, c: _assign_blocks(xx, c, 4096)[0],
         (x, cents)),
    ]
    for name, fn, args in micros:
        try:
            jfn = jax.jit(fn)
            sync(jfn(*args))
            t = timeit(lambda: jfn(*args), iters=iters)
            report(f"ivfglue_micro_{name}", ms=t * 1e3)
        except Exception as ex:
            report(f"ivfglue_micro_{name}", error=describe(ex)[:300])


def exp_topk():
    """pairwise_topk (Pallas running merge) vs _hier_block_topk (per-chunk
    XLA TopK + merge TopK) at bench scale — the rg-loss/serving hot spot
    (round-3 battery: rg_graph 232 ms at N=32k/k=32, byte floor 0.26 ms).
    Run with GNN_TRACKING_KNN_SMALL_IMPL=hier so the downstream rg-loss and
    serving arms in the same process pick up the new impl."""
    from gnn_tracking_tpu.ops.knn import _hier_block_topk
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk

    rng = np.random.default_rng(9)
    n = 2048 if SMOKE else 32768
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    iters = 2 if SMOKE else 10
    ref = {}
    for k in (8, 32, 64, 256):
        if k > n:
            continue
        try:
            d_h, i_h = sync(_hier_block_topk(
                x, k, node_mask=None, batch=None, loop=False
            ))
            t = timeit(
                lambda k=k: _hier_block_topk(
                    x, k, node_mask=None, batch=None, loop=False
                )[0],
                iters=iters,
            )
            report(f"topk_hier_k{k}", ms=t * 1e3)
            ref[k] = (np.asarray(d_h), np.asarray(i_h))
        except Exception as ex:
            report(f"topk_hier_k{k}", error=describe(ex)[:300])
        try:
            d_p, i_p = sync(pairwise_topk(x, k=k, loop=False))
            t = timeit(lambda k=k: pairwise_topk(x, k=k, loop=False)[0],
                       iters=iters)
            report(f"topk_pallas_k{k}", ms=t * 1e3)
            if k in ref:
                dh, ih = ref[k]
                same = sum(
                    set(a.tolist()) == set(b.tolist())
                    for a, b in zip(np.asarray(i_p), ih)
                )
                report(
                    f"topk_match_k{k}", same_rows=int(same), n=n,
                    max_dd=float(np.max(np.abs(np.asarray(d_p) - dh))),
                )
        except Exception as ex:
            report(f"topk_pallas_k{k}", error=describe(ex)[:300])


def exp_membw():
    """Honest achievable-bandwidth roofline (VERDICT #1 closure, arm B).

    The 819 GB/s HBM figure assumes pure streaming; the EC step is
    gather/scatter-dominated (battery #21 anatomy), and those patterns have
    a LOWER hardware ceiling. Measure, at bench scale with the real edge
    index distribution: (1) streaming triad, (2) sorted/unsorted row
    gather, (3) sorted/unsorted segment-sum scatter — each as a scan of R
    repeats inside one jit so per-call dispatch noise vanishes. The step's
    achieved GB/s is then compared against the ceiling of its dominant
    pattern instead of the streaming number."""
    from gnn_tracking_tpu.ops.segment import masked_segment_sum, sorted_take

    g = _bench_graph()
    dst = g.edge_index[1]
    rng = np.random.default_rng(7)
    dt = jnp.bfloat16
    R = 2 if SMOKE else 16
    H = 128
    x = jnp.asarray(rng.normal(size=(N, H)), dt)
    ed = jnp.asarray(rng.normal(size=(E, H)), dt)
    unsorted_idx = jnp.asarray(rng.integers(0, N, size=(R, E)), jnp.int32)
    sorted_idx = jnp.sort(unsorted_idx, axis=1)
    dst_idx = jnp.broadcast_to(dst, (R, E))
    scales = jnp.asarray(rng.normal(size=(R, 1, 1)), dt)

    def bw(tag, fn, *args, nominal_bytes):
        compiled = jax.jit(fn).lower(*args).compile()
        _, xla_by = _cost(compiled)
        sync(compiled(*args))
        t = timeit(lambda: compiled(*args), iters=ITERS)
        report(
            tag, ms=t * 1e3,
            gb_s=nominal_bytes / t / 1e9,
            xla_gb_s=xla_by / t / 1e9,
            xla_bytes_gb=xla_by / 1e9,
        )

    # 1) streaming triad: acc = acc * c + v over [E, H] bf16, R steps
    def triad(acc, v):
        def body(a, c):
            return a * c + v, None
        return jax.lax.scan(body, acc, scales)[0]

    bw("membw_stream_triad", triad, ed, ed * 0 + 1,
       nominal_bytes=R * 3 * E * H * 2)

    # 2) row gather into an [E, H] accumulator (source table 8.4 MB —
    #    VMEM-resident for a perfect kernel, so the ceiling is write-bound)
    def gath(acc, x_, idx):
        def body(a, i):
            return a + jnp.take(x_, i, axis=0), None
        return jax.lax.scan(body, acc, idx)[0]

    def gath_sorted(acc, x_, idx):
        def body(a, i):
            return a + sorted_take(x_, i), None
        return jax.lax.scan(body, acc, idx)[0]

    # nominal: acc read+write + gathered rows produced (E*H*2 each)
    nb = R * 3 * E * H * 2
    bw("membw_gather_unsorted", gath, jnp.zeros_like(ed), x, unsorted_idx,
       nominal_bytes=nb)
    bw("membw_gather_sorted", gath, jnp.zeros_like(ed), x, sorted_idx,
       nominal_bytes=nb)
    bw("membw_gather_sorted_hint", gath_sorted, jnp.zeros_like(ed), x,
       sorted_idx, nominal_bytes=nb)

    # 3) segment-sum scatter: [E, H] edges -> [N, H] nodes, R steps
    def scat(acc, e_, idx, hint):
        def body(a, i):
            return a + masked_segment_sum(
                e_, i, N, None, indices_are_sorted=hint
            ), None
        return jax.lax.scan(body, acc, idx)[0]

    accn = jnp.zeros((N, H), dt)
    # nominal: edge reads dominate (E*H*2) + acc read/write (N*H*2*2)
    nbs = R * (E * H * 2 + 2 * N * H * 2)
    bw("membw_scatter_sorted",
       lambda a, e_, i: scat(a, e_, i, True), accn, ed, dst_idx,
       nominal_bytes=nbs)
    bw("membw_scatter_unsorted",
       lambda a, e_, i: scat(a, e_, i, False), accn, ed, unsorted_idx,
       nominal_bytes=nbs)

    # 4) control: the same gather at f32 (is the ceiling dtype-limited?)
    bw("membw_gather_sorted_f32",
       gath, jnp.zeros((E, H), jnp.float32), x.astype(jnp.float32),
       sorted_idx, nominal_bytes=2 * nb)


def exp_tcstep():
    """VERDICT #7: roofline decomposition of the full GraphTCN/condensation
    train step (110 ms, 9.08 ev/s in BENCH_r02) and the rg-condensation
    loss (717 ms at k=64, ROADMAP #5): L_hc marginals, loss-only fwd+bwd,
    radius-graph share, and the fused-stack arm for both stacks."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.losses.oc import CondensationLossRG, CondensationLossTiger
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.ops.knn import radius_graph
    from gnn_tracking_tpu.training.module import TCModule
    from gnn_tracking_tpu.ops.pallas.slab_layout import (
        apply_flat_slab_layout, default_spec, flat_blocks_cap,
    )

    rng = np.random.default_rng(6)
    n_parts = 2048
    src, dst = local_graph(rng, N, E, 128 if SMOKE else 1024)
    pid = rng.integers(0, n_parts, size=N)
    base = EventGraph.from_arrays(
        x=rng.normal(size=(N, 14)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_attr=rng.normal(size=(E, 4)).astype(np.float32),
        y=((pid[src] == pid[dst]) & (pid[src] > 0)).astype(np.float32),
        particle_id=pid,
        pt=(2 * rng.random(n_parts))[pid].astype(np.float32),
        eta=(8 * (rng.random(n_parts) - 0.5))[pid].astype(np.float32),
        reconstructable=np.ones(N, np.float32),
    )

    def tc_step(tag, l_hc, impl, g):
        module = TCModule(
            model=GraphTCN(
                h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
                L_ec=L_FULL, L_hc=l_hc,
                sorted_edges=(impl == "xla"), segment_impl=impl,
                fused_window=1024, fused_block=512,
            ),
            loss_fct=CondensationLossTiger(
                max_n_objects=n_parts, object_block_size=256
            ),
            precision="bf16",
        )
        module.setup_params(g)
        l0 = float(sync(module.training_step(g)["total"]))
        t = timeit(lambda: module.training_step(g)["total"], iters=ITERS)
        report(f"tcstep_{tag}", ms=t * 1e3, events_per_s=1.0 / t, loss=l0)

    variants = [
        ("xla_Lhc3", 3, "xla", base.sort_edges_by_target()),
        ("xla_Lhc1", 1, "xla", base.sort_edges_by_target()),
        ("xla_Lhc0", 0, "xla", base.sort_edges_by_target()),
    ]
    spec = default_spec(N, E, window=1024, block_e=512)
    gflat = apply_flat_slab_layout(base, spec, blocks_cap=flat_blocks_cap(N, E, spec))
    variants += [("stack_Lhc3", 3, "fused_stack_t", gflat)]
    for tag, l_hc, impl, g in variants:
        try:
            tc_step(tag, l_hc, impl, g)
        except Exception as ex:
            report(f"tcstep_{tag}", error=describe(ex)[:400])

    # loss-only fwd+bwd on a fixed latent (isolates the oc loss from the model)
    h0 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    beta0 = jnp.asarray(rng.random(N).astype(np.float32))
    largs = dict(
        particle_id=base.particle_id,
        reconstructable=base.reconstructable,
        pt=base.pt, eta=base.eta,
    )

    def loss_probe(tag, fct):
        def f(h, b):
            out = fct(beta=b, x=h, **largs)
            return sum(
                v * out.weight_dct[k] for k, v in out.loss_dct.items()
            )

        try:
            _timed(f"tcstep_loss_{tag}_fwd", f, h0, beta0)
            _timed(
                f"tcstep_loss_{tag}_fb",
                lambda h, b: jax.grad(f, argnums=(0, 1))(h, b), h0, beta0,
            )
        except Exception as ex:
            report(f"tcstep_loss_{tag}", error=describe(ex)[:400])

    loss_probe("tiger", CondensationLossTiger(
        max_n_objects=n_parts, object_block_size=256))
    for cap in (32, 64):
        loss_probe(f"rg_k{cap}", CondensationLossRG(max_num_neighbors=cap))

    # radius-graph share of the rg loss
    for cap in (32, 64):
        try:
            _timed(
                f"tcstep_rg_graph_k{cap}",
                lambda h, cap=cap: radius_graph(
                    h, 1.0, max_num_neighbors=cap, loop=False
                )[0],
                h0,
            )
        except Exception as ex:
            report(f"tcstep_rg_graph_k{cap}", error=describe(ex)[:300])


def exp_serving():
    """VERDICT #6 validation: the overhauled bench serving pipeline
    (pid-structured condensed latent, stage split) on hardware ahead of
    the round-end bench run."""
    import bench

    try:
        out = bench.extra_serving()
        report("serving", **{k: round(float(v), 3) for k, v in out.items()})
    except Exception as ex:
        report("serving", error=describe(ex)[:400])


def exp_ivfnew():
    """Post-ladder ivf e2e re-measure (extra-pass rungs + sorted merges):
    target <=400 ms exact at 262k clustered."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    x = jnp.asarray(
        centers[rng.integers(0, n // 64, size=n)]
        + 0.05 * rng.normal(size=(n, 8)).astype(np.float32)
    )
    iters = 2 if SMOKE else 8
    for name, kwv in [("full", {}), ("nofb", {"fallback": False})]:
        try:
            d_, i_, unc = sync(ivf_knn(x, k=8, **kwv))
            t = timeit(lambda kwv=kwv: ivf_knn(x, k=8, **kwv)[0], iters=iters)
            report(f"ivfnew_{name}", ms=t * 1e3, n_uncert=int(unc))
        except Exception as ex:
            report(f"ivfnew_{name}", error=describe(ex)[:300])
    # exactness spot check vs float64 host oracle on a query subset
    try:
        d_i, i_i, unc = sync(ivf_knn(x, k=8))
        xs = np.asarray(x, np.float64)
        qs = np.linspace(0, n - 1, 512).astype(int)
        bad = 0
        for q in qs:
            dd = ((xs[q] - xs) ** 2).sum(1)
            dd[q] = np.inf
            ref = set(np.argsort(dd)[:8].tolist())
            got = set(np.asarray(i_i[q]).tolist())
            if ref != got:
                # distance-spectrum comparison tolerates near-ties
                rd = np.sort(dd[np.fromiter(ref, int)])
                gd = np.sort(dd[np.fromiter(got, int)])
                if not np.allclose(rd, gd, rtol=1e-4, atol=1e-7):
                    bad += 1
        report("ivfnew_exact", n_uncert=int(unc), bad_of_512=bad)
    except Exception as ex:
        report("ivfnew_exact", error=describe(ex)[:300])


def exp_topk2():
    """Survivor-filtered Pallas kernel (pairwise_topk_filter) vs the k-round
    running-merge kernel at bench scale, plus exactness cross-check. The
    battery-#23 numbers to beat: pallas k8 76 ms / k32 240 / k64 448."""
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import (
        pairwise_topk,
        pairwise_topk_filter,
    )

    rng = np.random.default_rng(9)
    n = 2048 if SMOKE else 32768
    iters = 2 if SMOKE else 10
    # random cloud AND a clustered (condensed-latent-like) cloud: the filter
    # kernel's iteration count is data-dependent
    clouds = {"rand": rng.normal(size=(n, 8)).astype(np.float32)}
    centers = rng.normal(size=(n // 16, 8)).astype(np.float32) * 10
    clouds["clust"] = (
        centers[rng.integers(0, n // 16, size=n)]
        + 0.05 * rng.normal(size=(n, 8)).astype(np.float32)
    ).astype(np.float32)
    for tag, xh in clouds.items():
        x = jnp.asarray(xh)
        for k in (8, 32, 64):
            try:
                d_f, i_f = sync(pairwise_topk_filter(x, k=k, loop=False))
                t = timeit(
                    lambda k=k: pairwise_topk_filter(x, k=k, loop=False)[0],
                    iters=iters,
                )
                report(f"topk2_filter_{tag}_k{k}", ms=t * 1e3)
                d_p, i_p = sync(pairwise_topk(x, k=k, loop=False))
                same = sum(
                    set(a.tolist()) == set(b.tolist())
                    for a, b in zip(np.asarray(i_f), np.asarray(i_p))
                )
                report(
                    f"topk2_match_{tag}_k{k}", same_rows=int(same), n=n,
                    max_dd=float(
                        np.max(
                            np.abs(
                                np.sort(np.asarray(d_p), axis=1)
                                - np.asarray(d_f)
                            )
                        )
                    ),
                )
            except Exception as ex:
                report(f"topk2_filter_{tag}_k{k}", error=describe(ex)[:400])


def exp_membw2():
    """Honest gather-bandwidth measurement, take 2. Battery #23's membw used
    a lax.scan of R gathers whose carried [E, H] accumulator forces an HBM
    round-trip per iteration AND may serialize against the gather — the
    measured 3.5 GB/s is the scan artifact, not the gather ceiling (in-model
    gathers run ~10 GB/s per anatomy). Here: ONE gather per jit (output
    donated to nothing, iters dispatches), an unrolled x4 variant, and the
    same for segment-sum."""
    from gnn_tracking_tpu.ops.segment import masked_segment_sum, sorted_take

    g = _bench_graph()
    dst = g.edge_index[1]
    rng = np.random.default_rng(7)
    H = 128
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    ed = jnp.asarray(rng.normal(size=(E, H)), jnp.bfloat16)
    uns = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    srt = jnp.sort(uns)

    def one(tag, fn, *args, nominal_bytes):
        compiled = jax.jit(fn).lower(*args).compile()
        _, xla_by = _cost(compiled)
        sync(compiled(*args))
        t = timeit(lambda: compiled(*args), iters=ITERS)
        report(tag, ms=t * 1e3, gb_s=nominal_bytes / t / 1e9,
               xla_gb_s=xla_by / t / 1e9)

    nb1 = E * H * 2 * 2  # rows out + acc-free: read gathered + write out
    one("membw2_gather_unsorted", lambda i: jnp.take(x, i, axis=0), uns,
        nominal_bytes=nb1)
    one("membw2_gather_sorted", lambda i: jnp.take(x, i, axis=0), srt,
        nominal_bytes=nb1)
    one("membw2_gather_sorted_hint", lambda i: sorted_take(x, i), srt,
        nominal_bytes=nb1)
    one("membw2_gather_h32",
        lambda i: jnp.take(x[:, :32], i, axis=0), srt,
        nominal_bytes=E * 32 * 2 * 2)

    def unroll4(i):
        o = jnp.take(x, i, axis=0)
        for s in (1, 2, 3):
            o = o + jnp.take(x, i + s, axis=0)
        return o

    one("membw2_gather_x4", unroll4,
        jnp.minimum(srt, N - 4), nominal_bytes=4 * E * H * 2 + E * H * 2)

    one("membw2_segsum_sorted",
        lambda e_: masked_segment_sum(e_, dst, N, None,
                                      indices_are_sorted=True),
        ed, nominal_bytes=E * H * 2 + N * H * 2)
    one("membw2_copy_control", lambda e_: e_ * 2.0 + 1.0, ed,
        nominal_bytes=2 * E * H * 2)


def exp_membw3():
    """Honest gather bandwidth, take 3. Battery #24's membw2 was
    TRANSFER-bound, not HBM-bound: on the axon-tunneled chip every jit
    output ships to host at ~0.45 GB/s (copy control: 67 MB out / 138 ms;
    gather_h32: 16.8 MB / 38 ms; segsum: 8.4 MB / 19 ms — all ≈
    output_bytes/0.45e9). Here every op is SINK-SCALARIZED (…sum() inside
    the jit, f32 scalar out) so the measurement sees only device time.
    A trivial-scalar arm calibrates per-dispatch overhead."""
    from gnn_tracking_tpu.ops.segment import masked_segment_sum, sorted_take

    g = _bench_graph()
    dst = g.edge_index[1]
    rng = np.random.default_rng(7)
    H = 128
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    ed = jnp.asarray(rng.normal(size=(E, H)), jnp.bfloat16)
    uns = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    srt = jnp.sort(uns)
    tiny = jnp.ones((8,), jnp.float32)

    def one(tag, fn, *args, nominal_bytes):
        compiled = jax.jit(fn).lower(*args).compile()
        sync(compiled(*args))
        t = timeit(lambda: compiled(*args), iters=ITERS)
        report(tag, ms=t * 1e3, gb_s=nominal_bytes / t / 1e9)

    one("membw3_dispatch_floor", lambda a: (a * 2.0).sum(), tiny,
        nominal_bytes=32)
    one("membw3_copy_control",
        lambda e_: (e_ * 2.0 + 1.0).astype(jnp.float32).sum(), ed,
        nominal_bytes=E * H * 2)
    one("membw3_gather_unsorted",
        lambda i: jnp.take(x, i, axis=0).astype(jnp.float32).sum(), uns,
        nominal_bytes=E * H * 2)
    one("membw3_gather_sorted",
        lambda i: jnp.take(x, i, axis=0).astype(jnp.float32).sum(), srt,
        nominal_bytes=E * H * 2)
    one("membw3_gather_sorted_hint",
        lambda i: sorted_take(x, i).astype(jnp.float32).sum(), srt,
        nominal_bytes=E * H * 2)
    one("membw3_gather_h32",
        lambda i: jnp.take(x[:, :32], i, axis=0).astype(jnp.float32).sum(),
        srt, nominal_bytes=E * 32 * 2)

    def unroll4(i):
        o = jnp.take(x, i, axis=0)
        for s in (1, 2, 3):
            o = o + jnp.take(x, i + s, axis=0)
        return o.astype(jnp.float32).sum()

    one("membw3_gather_x4", unroll4, jnp.minimum(srt, N - 4),
        nominal_bytes=4 * E * H * 2)
    one("membw3_segsum_sorted",
        lambda e_: masked_segment_sum(
            e_, dst, N, None, indices_are_sorted=True
        ).astype(jnp.float32).sum(),
        ed, nominal_bytes=E * H * 2 + N * H * 2)


def exp_radius():
    """Fixed-τ radius mode of the filter kernel vs k-then-mask, on a
    condensed (serving-like) latent, sink-scalarized; plus the
    radius_graph e2e (new default dispatch) and the rg-condensation loss
    whose graph build was ~90% of 472 ms in battery #23."""
    from gnn_tracking_tpu.losses.oc import CondensationLossRG
    from gnn_tracking_tpu.ops.knn import radius_graph
    from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk_filter

    rng = np.random.default_rng(9)
    n_tracks = 2048
    pid = rng.integers(0, n_tracks, size=N)
    centers = rng.normal(size=(n_tracks, 8)).astype(np.float32)
    h = jnp.asarray(
        centers[pid] + 0.02 * rng.normal(size=(N, 8)).astype(np.float32)
    )
    eps = 0.3
    for k in (32, 64):
        d_t, i_t = sync(pairwise_topk_filter(h, k=k, loop=False))
        d_r, i_r = sync(
            pairwise_topk_filter(h, k=k, loop=False, radius2=eps * eps)
        )
        # exactness: radius-mode must equal topk-then-mask
        dt = np.sort(np.asarray(d_t), axis=1)
        keep = dt <= eps * eps
        dtm = np.where(keep, dt, np.inf)
        drm = np.asarray(d_r)
        ok = bool(
            np.allclose(
                np.where(np.isinf(drm), 1e30, drm),
                np.where(np.isinf(dtm), 1e30, dtm),
                rtol=1e-3, atol=1e-5,
            )
        )
        t_topk = timeit(
            lambda k=k: pairwise_topk_filter(h, k=k, loop=False)[0].sum(),
            iters=ITERS,
        )
        t_rad = timeit(
            lambda k=k: pairwise_topk_filter(
                h, k=k, loop=False, radius2=eps * eps
            )[0].sum(),
            iters=ITERS,
        )
        report(
            f"radius_k{k}", topk_ms=t_topk * 1e3, radius_ms=t_rad * 1e3,
            exact_match=ok,
        )
        t_e2e = timeit(
            lambda k=k: radius_graph(
                h, eps, max_num_neighbors=k, loop=False
            )[2].sum(),
            iters=ITERS,
        )
        report(f"radius_graph_e2e_k{k}", ms=t_e2e * 1e3)

    # rg condensation loss fwd+bwd (graph build inside, new radius default)
    beta0 = jnp.asarray(rng.random(N).astype(np.float32))
    largs = dict(
        particle_id=jnp.asarray(pid.astype(np.int32)),
        reconstructable=jnp.ones((N,), jnp.float32),
        pt=jnp.asarray((2 * rng.random(N)).astype(np.float32)),
        eta=jnp.asarray((8 * (rng.random(N) - 0.5)).astype(np.float32)),
    )
    for cap in (32, 64):
        fct = CondensationLossRG(max_num_neighbors=cap)

        def f(hh, bb):
            out = fct(beta=bb, x=hh, **largs)
            return sum(v * out.weight_dct[k] for k, v in out.loss_dct.items())

        try:
            _timed(f"radius_rgloss_k{cap}_fwd", f, h, beta0)
            _timed(
                f"radius_rgloss_k{cap}_fb",
                lambda hh, bb: jax.grad(f, argnums=(0, 1))(hh, bb), h, beta0,
            )
        except Exception as ex:
            report(f"radius_rgloss_k{cap}", error=describe(ex)[:400])


def exp_ivfcfg():
    """Find an exact sub-400 ms 262k kNN config: battery #24 ivfglue showed
    the spill passes cost ~550 ms and nospill_cand96 runs 187 ms (uncertified).
    Grid: spill off × cand_cap × {certify, fallback} on, sink-scalarized,
    with host-oracle exactness on the winner."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    x = jnp.asarray(
        centers[rng.integers(0, n // 64, size=n)]
        + 0.05 * rng.normal(size=(n, 8)).astype(np.float32)
    )
    iters = 2 if SMOKE else 6
    arms = [
        ("default", {}),
        ("ns_c96", {"spill_passes": False, "cand_cap": 96}),
        ("ns_c144", {"spill_passes": False}),
        ("ns_c96_nofb", {"spill_passes": False, "cand_cap": 96,
                         "fallback": False}),
        ("probe_c96", {"spill_passes": "probe", "cand_cap": 96}),
    ]
    best = None
    for name, kwv in arms:
        try:
            _, _, unc = sync(ivf_knn(x, k=8, **kwv))
            t = timeit(
                lambda kwv=kwv: ivf_knn(x, k=8, **kwv)[0].sum(), iters=iters
            )
            report(f"ivfcfg_{name}", ms=t * 1e3, n_uncert=int(unc))
            if int(unc) == 0 and (best is None or t < best[1]):
                best = (name, t, kwv)
        except Exception as ex:
            report(f"ivfcfg_{name}", error=describe(ex)[:300])
    if best is not None:
        name, t, kwv = best
        d_i, i_i, unc = sync(ivf_knn(x, k=8, **kwv))
        xs = np.asarray(x, np.float64)
        qs = np.linspace(0, n - 1, 512).astype(int)
        bad = 0
        for q in qs:
            dd = ((xs[q] - xs) ** 2).sum(1)
            dd[q] = np.inf
            ref = set(np.argsort(dd)[:8].tolist())
            got = set(np.asarray(i_i[q]).tolist())
            if ref != got:
                rd = np.sort(dd[np.fromiter(ref, int)])
                gd = np.sort(dd[np.fromiter(got, int)])
                if not np.allclose(rd, gd, rtol=1e-4, atol=1e-7):
                    bad += 1
        report("ivfcfg_best", arm=name, ms=t * 1e3, bad_of_512=bad,
               n_uncert=int(unc))


def exp_servefwd():
    """Serving-forward attribution: battery #25 measured the GraphTCN
    forward at ~114-141 ms while the EC fwd is 23.5 ms and each HC layer
    ~4 ms — where do the other ~75 ms go? Arms: EC alone, full GraphTCN,
    GraphTCN pieces via L_hc sweep, f32 vs bf16, sorted vs not."""
    from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN

    g = _bench_graph()

    def arm(tag, model, graph):
        try:
            params = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16),
                model.init(jax.random.PRNGKey(0), graph),
            )
            fn = jax.jit(
                lambda p, g_: sum(
                    v.astype(jnp.float32).sum()
                    for k, v in model.apply(p, g_).items()
                    if k in ("W", "H", "B") and v is not None
                )
            ).lower(params, graph).compile()
            sync(fn(params, graph))
            report(tag, ms=timeit(lambda: fn(params, graph), iters=ITERS) * 1e3)
        except Exception as ex:
            report(tag, error=describe(ex)[:300])

    arm("servefwd_ec_only", ECForGraphTCN(
        interaction_node_dim=IDIM, interaction_edge_dim=IDIM,
        hidden_dim=HDIM, L_ec=L_FULL, sorted_edges=True), g)
    for lhc in (0, 1, 3):
        arm(f"servefwd_gtcn_Lhc{lhc}", GraphTCN(
            h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
            L_ec=L_FULL, L_hc=lhc, sorted_edges=True), g)
    arm("servefwd_gtcn_unsorted", GraphTCN(
        h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
        L_ec=L_FULL, L_hc=3, sorted_edges=False), g)
    arm("servefwd_gtcn_maskorphan", GraphTCN(
        h_dim=IDIM, e_dim=IDIM, h_outdim=8, hidden_dim=HDIM,
        L_ec=L_FULL, L_hc=3, sorted_edges=True, mask_orphan_nodes=True), g)


def exp_servefwd2():
    """Reconcile servefwd (GraphTCN fwd 33.8 ms sorted bf16) with the
    serving bench's 113-141 ms forward stage: rebuild extra_serving's
    exact model/graph and time the same compiled forward with the battery
    harness; also split pred.predict into pipelined vs synced-per-event."""
    import time as _time_mod

    import bench
    from flax import linen as nn

    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.inference import TrackingPredictor
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.restore import BoundModel

    rng = np.random.default_rng(7)
    x, edge_index, edge_attr, _ = bench.make_arrays(7)
    n_tracks = 2048
    pid = rng.integers(0, n_tracks, size=bench.N_NODES)
    centers = rng.normal(size=(n_tracks, 8)).astype(np.float32)
    latent_centers = (
        centers[pid] + 0.02 * rng.normal(size=(bench.N_NODES, 8))
    ).astype(np.float32)
    g = EventGraph.from_arrays(
        x=x, edge_index=edge_index, edge_attr=edge_attr,
        y=(pid[edge_index[0]] == pid[edge_index[1]]) & (pid[edge_index[0]] > 0),
        particle_id=pid,
        extras={"serving_centers": latent_centers},
    )

    class _CondensedGraphTCN(nn.Module):
        tcn: nn.Module

        @nn.compact
        def __call__(self, data, exchange=None):
            out = self.tcn(data, exchange=exchange)
            out["H"] = (
                data.extras["serving_centers"].astype(jnp.float32)
                + 0.02 * out["H"].astype(jnp.float32)
            )
            return out

    model = _CondensedGraphTCN(
        tcn=GraphTCN(
            h_dim=bench.INTERACTION_DIM, e_dim=bench.INTERACTION_DIM,
            h_outdim=8, hidden_dim=bench.HIDDEN_DIM, L_ec=bench.L_EC,
            L_hc=3, sorted_edges=True,
        )
    )
    params = model.init(jax.random.PRNGKey(0), g)["params"]

    def _cast(v):
        return (
            v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32
            else v
        )

    g_b = jax.tree.map(_cast, g.sort_edges_by_target())
    params_b = jax.tree.map(_cast, {"params": params})
    fwd = jax.jit(lambda v, g_: model.apply(v, g_)["H"].astype(jnp.float32))
    h = sync(fwd(params_b, g_b))
    # battery harness: sink-scalarized
    fwd_s = jax.jit(
        lambda v, g_: model.apply(v, g_)["H"].astype(jnp.float32).sum()
    )
    sync(fwd_s(params_b, g_b))
    report("servefwd2_fwd_sink", ms=timeit(
        lambda: fwd_s(params_b, g_b), iters=ITERS) * 1e3)
    # bench harness replica: full [N, 8] f32 output, 5 unsynced iters
    fwd(params_b, g_b)
    t0 = _time_mod.perf_counter()
    for _ in range(5):
        out = fwd(params_b, g_b)
    jax.block_until_ready(out)
    report("servefwd2_fwd_benchstyle",
           ms=(_time_mod.perf_counter() - t0) / 5 * 1e3)

    pred = TrackingPredictor(
        BoundModel(model, params), eps=0.3, min_samples=1,
        max_num_neighbors=64, sort_edges=True, precision="bf16",
    )
    out = pred.predict(g)
    t0 = _time_mod.perf_counter()
    for _ in range(5):
        out = pred.predict(g)
    report("servefwd2_predict_synced",
           ms=(_time_mod.perf_counter() - t0) / 5 * 1e3,
           n_tracks=float(out["labels"].max() + 1))
    # device-only predict (no numpy conversion of outputs): _dispatch
    # queues the compiled pipeline; block once at the end
    pending = pred._dispatch(g)
    jax.block_until_ready(pending[0])
    t0 = _time_mod.perf_counter()
    for _ in range(5):
        pending = pred._dispatch(g)
    jax.block_until_ready(pending[0])
    report("servefwd2_predict_device",
           ms=(_time_mod.perf_counter() - t0) / 5 * 1e3)


def exp_dbattr():
    """Serving DBSCAN stage attribution (battery #25: DBSCAN is now the
    largest serving stage at 104 of 301 ms). Pieces at serving scale
    (pid-structured latent, 2048 tracks, cap 64): degree/core, neighbor-CC
    label propagation, compact_labels, full dbscan_from_graph."""
    from gnn_tracking_tpu.ops.cc import (
        compact_labels,
        connected_components_neighbors,
    )
    from gnn_tracking_tpu.ops.dbscan import dbscan_from_graph
    from gnn_tracking_tpu.ops.knn import radius_graph

    rng = np.random.default_rng(7)
    n = 2048 if SMOKE else 32768
    n_tracks = n // 16
    pid = rng.integers(0, n_tracks, size=n)
    centers = rng.normal(size=(n_tracks, 8)).astype(np.float32)
    h = jnp.asarray(
        centers[pid] + 0.02 * rng.normal(size=(n, 8)).astype(np.float32)
    )
    eps, cap = 0.3, 64
    ei, em, d = sync(radius_graph(h, eps, max_num_neighbors=cap, loop=False))
    report("dbattr_radius", ms=timeit(
        lambda: radius_graph(h, eps, max_num_neighbors=cap, loop=False)[2].sum(),
        iters=ITERS) * 1e3)

    src2d = ei[0].reshape(n, cap)
    within2d = (em & (d <= eps)).reshape(n, cap)

    def deg_core(w2d):
        deg = jnp.sum(w2d, axis=1)
        return (deg + 1 >= 1).sum()

    cdc = jax.jit(deg_core).lower(within2d).compile()
    sync(cdc(within2d))
    report("dbattr_degcore", ms=timeit(lambda: cdc(within2d), iters=ITERS) * 1e3)

    ccc = jax.jit(
        lambda s, w: connected_components_neighbors(s, w).astype(jnp.float32).sum()
    ).lower(src2d, within2d).compile()
    sync(ccc(src2d, within2d))
    report("dbattr_cc", ms=timeit(lambda: ccc(src2d, within2d), iters=ITERS) * 1e3)

    comp = sync(connected_components_neighbors(src2d, within2d))
    ccl = jax.jit(
        lambda c: compact_labels(c, valid=jnp.ones((n,), bool), noise_value=-1).max()
    ).lower(comp).compile()
    sync(ccl(comp))
    report("dbattr_compact", ms=timeit(lambda: ccl(comp), iters=ITERS) * 1e3)

    cdb = jax.jit(
        lambda ei_, d_, em_: dbscan_from_graph(
            ei_, d_, n, eps=eps, min_samples=1, edge_mask=em_,
            neighbor_cap=cap,
        ).max()
    ).lower(ei, d, em).compile()
    sync(cdb(ei, d, em))
    report("dbattr_full", ms=timeit(lambda: cdb(ei, d, em), iters=ITERS) * 1e3)


def exp_fdattr():
    """Attribution of the 3.25 s/step full-detector datum (BASELINE
    config 5; naive scale-up of the 92.7 ms bench TC step predicts
    0.76 s). Arms at the REAL fd event (267k hits / 2.14M edges, bf16):
    plain fwd, plain fwd+bwd (remat on/off), edge-BCE-only step, the
    sharded condensation loss alone, and the full sharded trainer step."""
    import optax

    from train_fulldetector import full_detector_event
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.sharded_tc import (
        partition_condensation,
        sharded_condensation_loss,
    )
    from gnn_tracking_tpu.parallel.halo import partition_event

    n_tracks = 512 if SMOKE else 16384
    g = full_detector_event(0, n_tracks=n_tracks).sort_edges_by_target()
    gb = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )
    iters = 2 if SMOKE else 5
    for remat in (True, False):
        model = GraphTCN(
            h_dim=32, e_dim=32, h_outdim=8, hidden_dim=128,
            L_ec=6, L_hc=3, sorted_edges=True, remat=remat,
        )
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16),
            model.init(jax.random.PRNGKey(0), gb),
        )
        tag = "remat" if remat else "noremat"
        try:
            fwd = lambda p, g_: sum(
                v.astype(jnp.float32).sum()
                for k, v in model.apply(p, g_).items()
                if k in ("W", "H", "B")
            )
            c = jax.jit(fwd).lower(params, gb).compile()
            sync(c(params, gb))
            report(f"fdattr_fwd_{tag}",
                   ms=timeit(lambda: c(params, gb), iters=iters) * 1e3)
            fb = jax.jit(jax.grad(fwd)).lower(params, gb).compile()
            sync(jax.tree.leaves(fb(params, gb))[0])
            report(f"fdattr_fb_{tag}",
                   ms=timeit(lambda: fb(params, gb), iters=iters) * 1e3)
        except Exception as ex:
            report(f"fdattr_{tag}", error=describe(ex)[:300])
        if not remat:
            continue
        # edge-BCE-only adam step (isolates model + optimizer, no TC loss)
        try:
            tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
            opt_state = tx.init(params)

            def step(p, s, g_):
                def loss(p):
                    w = model.apply(p, g_)["W"].astype(jnp.float32)
                    return binary_focal_loss(
                        inpt=w, target=g_.y.astype(jnp.float32)
                    )

                l, gr = jax.value_and_grad(loss)(p)
                up, s = tx.update(gr, s, p)
                return optax.apply_updates(p, up), s, l

            cs = jax.jit(step).lower(params, opt_state, gb).compile()
            p2, s2, l = cs(params, opt_state, gb)
            sync(l)
            report("fdattr_edgestep_remat",
                   ms=timeit(lambda: cs(params, opt_state, gb), iters=iters) * 1e3)
        except Exception as ex:
            report("fdattr_edgestep", error=describe(ex)[:300])

    # sharded condensation loss alone (1-shard partition, fwd+bwd)
    try:
        sg = partition_event(g, 1, sort_edges=True)
        cd = partition_condensation(
            g, sg, max_n_objects=512, subsample_seed=1000
        )
        h0 = jnp.asarray(
            np.random.default_rng(0).normal(size=(sg.x.shape[1], 8)),
            jnp.float32,
        )
        beta0 = jnp.asarray(
            np.random.default_rng(1).random(sg.x.shape[1]), jnp.float32
        )
        cd1 = jax.tree.map(lambda v: v[0] if hasattr(v, "shape") and v.ndim and v.shape[0] == 1 else v, cd)

        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        mesh1 = Mesh(np.array(jax.devices()[:1]), ("graph",))

        def tc_loss(h, b):
            def body(h_, b_):
                out = sharded_condensation_loss(
                    b_, h_, cd1, q_min=0.01, max_n_objects=512,
                    axis_name="graph",
                )
                return sum(v for v in out.values())

            return shard_map(
                body, mesh=mesh1, in_specs=(P("graph"), P("graph")),
                out_specs=P(),
            )(h, b)

        cl = jax.jit(jax.grad(tc_loss, argnums=(0, 1))).lower(h0, beta0).compile()
        sync(cl(h0, beta0)[0])
        report("fdattr_tcloss_fb",
               ms=timeit(lambda: cl(h0, beta0), iters=iters) * 1e3)
    except Exception as ex:
        report("fdattr_tcloss", error=describe(ex)[:300])


def exp_fdattr2():
    """fd attribution take 2: battery #26's parts (sum-sink fwd+bwd
    1.75 s + TC loss 0.12 s) undershoot the 3.25-3.58 s trainer step.
    Suspect: constant (ones) cotangents in the sum-sink arms let XLA
    simplify the real backward. Arm: REAL composite loss (edge focal +
    sharded TC with axis_name=None) fwd+bwd wrt params at fd scale."""
    from train_fulldetector import full_detector_event
    from gnn_tracking_tpu.losses.ec import binary_focal_loss
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.parallel.halo import partition_event
    from gnn_tracking_tpu.parallel.sharded_tc import (
        partition_condensation,
        sharded_condensation_loss,
    )

    n_tracks = 512 if SMOKE else 16384
    g = full_detector_event(0, n_tracks=n_tracks).sort_edges_by_target()
    sg = partition_event(g, 1, sort_edges=True)
    cd = partition_condensation(g, sg, max_n_objects=512, subsample_seed=1000)
    cd1 = jax.tree.map(
        lambda v: v[0] if hasattr(v, "shape") and v.ndim and v.shape[0] == 1 else v,
        cd,
    )
    gb = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        g,
    )
    iters = 2 if SMOKE else 5
    model = GraphTCN(
        h_dim=32, e_dim=32, h_outdim=8, hidden_dim=128,
        L_ec=6, L_hc=3, sorted_edges=True, remat=True,
    )
    params = model.init(jax.random.PRNGKey(0), gb)

    def real_loss(p):
        out = model.apply(p, gb)
        w = out["W"].astype(jnp.float32)
        h = out["H"].astype(jnp.float32)
        b = out["B"].astype(jnp.float32)
        l_edge = binary_focal_loss(inpt=w, target=gb.y.astype(jnp.float32))
        tc = sharded_condensation_loss(
            b, h, cd1, q_min=0.01, max_n_objects=512, axis_name=None
        )
        return l_edge + sum(tc.values())

    try:
        c = jax.jit(real_loss).lower(params).compile()
        sync(c(params))
        report("fdattr2_realloss_fwd",
               ms=timeit(lambda: c(params), iters=iters) * 1e3)
        cg = jax.jit(jax.grad(real_loss)).lower(params).compile()
        sync(jax.tree.leaves(cg(params))[0])
        report("fdattr2_realloss_fb",
               ms=timeit(lambda: cg(params), iters=iters) * 1e3)
    except Exception as ex:
        report("fdattr2", error=describe(ex)[:400])


def exp_vmapserve():
    """predict_batch smoke on hardware: the fixed-τ filter radius kernel
    (round-4 dispatch fix) now runs under vmap inside _predict_batch_fn —
    pallas_call batching on TPU is exactly the thing CPU tests can't
    cover. Small shapes; correctness vs per-event predict."""
    from gnn_tracking_tpu.graphs import EventGraph
    from gnn_tracking_tpu.inference import TrackingPredictor
    from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
    from gnn_tracking_tpu.training.restore import BoundModel

    rng = np.random.default_rng(11)
    n, e = 2048, 8192
    graphs = []
    for s in range(3):
        x = rng.normal(size=(n, 14)).astype(np.float32)
        dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
        src = np.clip(dst + rng.integers(-64, 64, size=e), 0, n - 1).astype(np.int32)
        graphs.append(EventGraph.from_arrays(
            x=x, edge_index=np.stack([src, dst]),
            edge_attr=rng.normal(size=(e, 4)).astype(np.float32),
            y=(rng.random(e) < 0.3).astype(np.float32),
        ))
    model = GraphTCN(h_dim=8, e_dim=8, h_outdim=4, hidden_dim=16,
                     L_ec=1, L_hc=1)
    params = model.init(jax.random.PRNGKey(0), graphs[0])["params"]
    pred = TrackingPredictor(BoundModel(model, params), eps=0.3,
                             max_num_neighbors=32)
    try:
        singles = [pred.predict(g)["labels"] for g in graphs]
        batched = pred.predict_batch(graphs)
        same = all(
            (np.asarray(b["labels"]) == np.asarray(s)).all()
            for b, s in zip(batched, singles)
        )
        report("vmapserve", ok=True, labels_match=bool(same))
    except Exception as ex:
        report("vmapserve", ok=False, error=describe(ex)[:400])


def exp_ivfcfg2():
    """262k kNN after the spill-probe ladder (round-4): bucketing stats
    (n_spill/n_resid — do the expensive passes even trigger at bench
    scale?), the laddered default, and SOUND config arms (spill passes
    stay ON; battery #25 smoke showed spill_passes=False returns
    certified-but-wrong rows). Target: <=400 ms certified-exact."""
    from gnn_tracking_tpu.ops.ivf_knn import ivf_knn

    rng = np.random.default_rng(4)
    n = 4096 if SMOKE else 262144
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    x = jnp.asarray(
        centers[rng.integers(0, n // 64, size=n)]
        + 0.05 * rng.normal(size=(n, 8)).astype(np.float32)
    )
    iters = 2 if SMOKE else 6
    d_s, i_s, unc_s, st = sync(ivf_knn(x, k=8, return_stats=True))
    report("ivfcfg2_stats", **{k: int(v) for k, v in st.items()},
           n_uncert=int(unc_s))
    arms = [
        ("ladder_default", {}),
        ("cand192", {"cand_cap": 192}),
        ("cand256", {"cand_cap": 256}),
        ("cells24", {"n_cells": max(8, min(8192, n // 24))}),
        ("probe12", {"n_probe": 12}),
    ]
    best = None
    for name, kwv in arms:
        try:
            _, _, unc = sync(ivf_knn(x, k=8, **kwv))
            t = timeit(
                lambda kwv=kwv: ivf_knn(x, k=8, **kwv)[0].sum(), iters=iters
            )
            report(f"ivfcfg2_{name}", ms=t * 1e3, n_uncert=int(unc))
            if int(unc) == 0 and (best is None or t < best[1]):
                best = (name, t, kwv)
        except Exception as ex:
            report(f"ivfcfg2_{name}", error=describe(ex)[:300])
    if best is not None:
        name, t, kwv = best
        d_i, i_i, unc = sync(ivf_knn(x, k=8, **kwv))
        xs = np.asarray(x, np.float64)
        qs = np.linspace(0, n - 1, 512).astype(int)
        bad = 0
        for q in qs:
            dd = ((xs[q] - xs) ** 2).sum(1)
            dd[q] = np.inf
            ref = set(np.argsort(dd)[:8].tolist())
            got = set(np.asarray(i_i[q]).tolist())
            if ref != got:
                rd = np.sort(dd[np.fromiter(ref, int)])
                gd = np.sort(dd[np.fromiter(got, int)])
                if not np.allclose(rd, gd, rtol=1e-4, atol=1e-7):
                    bad += 1
        report("ivfcfg2_best", arm=name, ms=t * 1e3, bad_of_512=bad,
               n_uncert=int(unc))


EXPS = {
    "anatomy": exp_anatomy,
    "ivfcfg2": exp_ivfcfg2,
    "vmapserve": exp_vmapserve,
    "fdattr": exp_fdattr,
    "fdattr2": exp_fdattr2,
    "dbattr": exp_dbattr,
    "servefwd": exp_servefwd,
    "servefwd2": exp_servefwd2,
    "membw3": exp_membw3,
    "radius": exp_radius,
    "ivfcfg": exp_ivfcfg,
    "topk2": exp_topk2,
    "membw2": exp_membw2,
    "lsweep": exp_lsweep,
    "tbound": exp_tbound,
    "stackstep": exp_stackstep,
    "stackfix": exp_stackfix,
    "topk": exp_topk,
    "membw": exp_membw,
    "tcstep": exp_tcstep,
    "serving": exp_serving,
    "ivfnew": exp_ivfnew,
    "ivfglue": exp_ivfglue,
}


def main():
    if not os.environ.get("BATTERY_CPU"):
        claim_or_exit()
    names = sys.argv[1:] or list(EXPS)
    print("devices:", jax.devices(), flush=True)
    for name in names:
        try:
            EXPS[name]()
        except Exception as e:  # noqa: BLE001
            report(name, fatal=describe(e)[:600])
    report("battery_done", ok=True)


if __name__ == "__main__":
    main()
