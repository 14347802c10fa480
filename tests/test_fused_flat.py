"""Flat-block fused relational kernel vs plain-XLA reference (interpret).

Covers the variable-blocks-per-slab layout (`flat_slab_partition`, fill
~0.97 vs 0.66 for the fixed-``cmax`` layout) and the scalar-prefetched
kernel `fused_relational_flat`. Mirrors tests/test_fused_relational.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tracking_tpu.ops.pallas.fused_relational import (
    fused_relational_flat,
    fused_relational_flat_reference,
)
from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
    fused_relational_flat_t,
)

FLAT_OPS = {"flat": fused_relational_flat, "flat_t": fused_relational_flat_t}
from gnn_tracking_tpu.ops.pallas.slab_layout import (
    SlabLayoutSpec,
    SlabLayoutError,
    flat_blocks_cap,
    flat_slab_partition,
)

W, EB = 64, 32


def _local_graph(rng, n, e, locality=40):
    dst = rng.integers(0, n, size=e)
    src = np.clip(dst + rng.integers(-locality, locality, size=e), 0, n - 1)
    far = rng.random(e) < 0.03
    src = np.where(far, rng.integers(0, n, size=e), src)
    valid = rng.random(e) < 0.95
    return src.astype(np.int32), dst.astype(np.int32), valid


def _weights(rng, fx, fe, h, fo):
    def w(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)

    return {
        "w1d": w(fx, h), "w1s": w(fx, h), "w1e": w(fe, h),
        "b1": w(h), "w2": w(h, h), "b2": w(h),
        "w3": w(h, fo), "b3": w(fo),
    }


def _setup(n=300, e=2000, fx=8, fe=8, h=16, fo=8, seed=0, blocks_cap=None):
    rng = np.random.default_rng(seed)
    src, dst, valid = _local_graph(rng, n, e)
    spec = SlabLayoutSpec(window=W, block_e=EB, cmax=0, overflow_cap=e)
    part = flat_slab_partition(src, dst, valid, n, spec, blocks_cap=blocks_cap)
    x = jnp.asarray(rng.normal(size=(n, fx)).astype(np.float32))
    e_pad = len(part["perm"])
    take = np.maximum(part["perm"], 0)
    ea_orig = rng.normal(size=(e, fe)).astype(np.float32)
    ea = jnp.asarray(np.where(part["perm"][:, None] >= 0, ea_orig[take], 0))
    weights = _weights(rng, fx, fe, h, fo)
    meta = (
        jnp.asarray(part["srcloc"]),
        jnp.asarray(part["dstloc"]),
        jnp.asarray(part["inwin"].astype(np.float32)),
        jnp.asarray(part["block_slab"]),
    )
    assert e_pad % EB == 0
    return x, ea, meta, weights, part, (src, dst, valid)


@pytest.mark.parametrize("op", ["flat", "flat_t"])
def test_flat_forward_matches_reference(op):
    x, ea, (sl, dl, inw, bs), weights, part, _ = _setup()
    et, agg = FLAT_OPS[op](
        W, EB, "float32", True, x, ea, sl, dl, inw, bs, weights
    )
    et_ref, agg_ref = fused_relational_flat_reference(
        x, ea, sl, dl, inw, bs, weights, window=W, block_e=EB
    )
    np.testing.assert_allclose(np.asarray(et), np.asarray(et_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(agg), np.asarray(agg_ref), rtol=1e-4, atol=1e-4
    )
    assert np.abs(np.asarray(et)[~part["inwin"]]).max() == 0.0


def test_flat_forward_in_window_semantics():
    """In-window slots reproduce gather->MLP->mask on the real (src, dst)."""
    x, ea, (sl, dl, inw, bs), weights, part, (src, dst, valid) = _setup()
    et, agg = fused_relational_flat(
        W, EB, "float32", True, x, ea, sl, dl, inw, bs, weights
    )
    perm = part["perm"]
    rows = np.nonzero(part["inwin"])[0]
    orig = perm[rows]
    w1 = jnp.concatenate([weights["w1d"], weights["w1s"], weights["w1e"]], 0)
    m = jnp.concatenate([x[dst[orig]], x[src[orig]], ea[rows]], axis=1)
    h1 = jax.nn.relu(m @ w1 + weights["b1"])
    h2 = jax.nn.relu(h1 @ weights["w2"] + weights["b2"])
    want = h2 @ weights["w3"] + weights["b3"]
    np.testing.assert_allclose(
        np.asarray(et)[rows], np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("op", ["flat", "flat_t"])
def test_flat_gradients_match_reference(op):
    x, ea, (sl, dl, inw, bs), weights, part, _ = _setup()
    cot_e = jnp.asarray(
        np.random.default_rng(7).normal(size=(ea.shape[0], weights["w3"].shape[1]))
    ).astype(jnp.float32)

    def loss_k(x, ea, weights):
        et, agg = FLAT_OPS[op](
            W, EB, "float32", True, x, ea, sl, dl, inw, bs, weights
        )
        return jnp.sum(et * cot_e) + jnp.sum(jnp.sin(agg))

    def loss_r(x, ea, weights):
        et, agg = fused_relational_flat_reference(
            x, ea, sl, dl, inw, bs, weights, window=W, block_e=EB
        )
        return jnp.sum(et * cot_e) + jnp.sum(jnp.sin(agg))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, ea, weights)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, ea, weights)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_flat_partition_invariants():
    rng = np.random.default_rng(3)
    n, e = 500, 4000
    src, dst, valid = _local_graph(rng, n, e)
    spec = SlabLayoutSpec(window=W, block_e=EB, cmax=0, overflow_cap=e)
    part = flat_slab_partition(src, dst, valid, n, spec)
    perm = part["perm"]
    # every valid edge appears exactly once
    vids = np.nonzero(valid)[0]
    placed = perm[perm >= 0]
    assert sorted(placed.tolist()) == sorted(vids.tolist())
    # block_slab is non-decreasing and covers every slab at least once
    bs = part["block_slab"]
    s_slabs = -(-n // W)
    assert (np.diff(bs) >= 0).all()
    assert set(bs.tolist()) == set(range(s_slabs))
    # in-window slots: dst in the block's slab, src in its 3W window
    slot_slab = np.repeat(bs, EB)
    rows = part["inwin"]
    assert (dst[perm[rows]] // W == slot_slab[rows]).all()
    assert (part["srcloc"][rows] >= 0).all() and (part["srcloc"][rows] < 3 * W).all()
    # fill beats the fixed layout's 1/1.5
    assert rows.mean() > 0.75
    # overflow slots listed exactly once, matching the non-in-window placed
    of = part["of_pos"][part["of_mask"]]
    assert len(np.unique(of)) == len(of)
    assert set(of.tolist()) == set(np.nonzero((perm >= 0) & ~rows)[0].tolist())


def test_flat_blocks_cap_pads_and_rejects():
    rng = np.random.default_rng(4)
    n, e = 500, 4000
    src, dst, valid = _local_graph(rng, n, e)
    spec = SlabLayoutSpec(window=W, block_e=EB, cmax=0, overflow_cap=e)
    base = flat_slab_partition(src, dst, valid, n, spec)
    n_blocks = len(base["block_slab"])
    cap = flat_blocks_cap(n, int(valid.sum()), spec)
    assert cap >= n_blocks
    padded = flat_slab_partition(src, dst, valid, n, spec, blocks_cap=cap)
    assert len(padded["block_slab"]) == cap
    # padding blocks land on the last slab; placed set is unchanged
    assert (padded["block_slab"][n_blocks:] == -(-n // W) - 1).all()
    vids = set(np.nonzero(valid)[0].tolist())
    assert set(padded["perm"][padded["perm"] >= 0].tolist()) == vids
    with pytest.raises(SlabLayoutError):
        flat_slab_partition(src, dst, valid, n, spec, blocks_cap=n_blocks - 1)


def test_flat_kernel_with_blocks_cap():
    """The padded (bucketed) block list computes identically."""
    x, ea, (sl, dl, inw, bs), weights, part, _ = _setup(blocks_cap=80)
    et, agg = fused_relational_flat(
        W, EB, "float32", True, x, ea, sl, dl, inw, bs, weights
    )
    et_ref, agg_ref = fused_relational_flat_reference(
        x, ea, sl, dl, inw, bs, weights, window=W, block_e=EB
    )
    np.testing.assert_allclose(np.asarray(et), np.asarray(et_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(agg), np.asarray(agg_ref), rtol=1e-4, atol=1e-4
    )


def _pad8(f):
    return f + (-f) % 8


@pytest.mark.parametrize("save_acts", [False, True])
def test_layer_tt_matches_flat_t(save_acts):
    """The transposed-IO stack building block == the natural-IO op, for
    plain and relu_edge inputs, forward and full gradients, with and
    without saved-activation backward."""
    from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
        fused_relational_layer_tt,
    )

    x, ea, meta, ws, part, _ = _setup(seed=4)
    fe, fo = ea.shape[1], ws["w3"].shape[1]
    ea = ea - 0.3  # make relu non-trivial
    eat = jnp.pad(ea.T, ((0, _pad8(fe) - fe), (0, 0)))

    et_ref, agg_ref = fused_relational_flat_t(
        W, EB, "float32", None, x, ea, *meta, ws
    )
    et_t, agg_t = fused_relational_layer_tt(
        W, EB, "float32", None, False, save_acts, x, eat, *meta, ws
    )
    np.testing.assert_allclose(
        np.asarray(et_t[:fo].T), np.asarray(et_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(agg_t), np.asarray(agg_ref), rtol=1e-5, atol=1e-5
    )
    # padded output rows must be exactly zero (the next layer consumes them)
    assert np.all(np.asarray(et_t[fo:]) == 0.0)

    # relu_edge: in-kernel activation == pre-activated natural input
    et_a, agg_a = fused_relational_layer_tt(
        W, EB, "float32", None, True, save_acts, x, eat, *meta, ws
    )
    et_b, agg_b = fused_relational_flat_t(
        W, EB, "float32", None, x, jnp.maximum(ea, 0), *meta, ws
    )
    np.testing.assert_allclose(
        np.asarray(et_a[:fo].T), np.asarray(et_b), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(agg_a), np.asarray(agg_b), rtol=1e-5, atol=1e-5
    )

    def loss_tt(x_, eat_, ws_):
        et, agg = fused_relational_layer_tt(
            W, EB, "float32", None, True, save_acts, x_, eat_, *meta, ws_
        )
        return jnp.sum(jnp.sin(et)) + jnp.sum(jnp.cos(agg))

    def loss_ref(x_, ea_, ws_):
        et, agg = fused_relational_flat_t(
            W, EB, "float32", None, x_, jnp.maximum(ea_, 0), *meta, ws_
        )
        etp = jnp.pad(et.T, ((0, _pad8(fo) - fo), (0, 0)))
        return jnp.sum(jnp.sin(etp)) + jnp.sum(jnp.cos(agg))

    g_tt = jax.grad(loss_tt, argnums=(0, 1, 2))(x, eat, ws)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ea, ws)
    np.testing.assert_allclose(
        np.asarray(g_tt[0]), np.asarray(g_ref[0]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_tt[1][:fe].T), np.asarray(g_ref[1]), rtol=2e-4, atol=2e-4
    )
    for k in ws:
        np.testing.assert_allclose(
            np.asarray(g_tt[2][k]), np.asarray(g_ref[2][k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )
