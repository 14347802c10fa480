"""IVF-certified exact kNN vs brute force (ops/ivf_knn.py).

The clustered cloud mirrors a learned condensation latent (the case that
defeats the banded/windowed kNN); exactness must hold with n_uncert == 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tracking_tpu.ops.ivf_knn import ivf_knn
from gnn_tracking_tpu.ops.knn import knn_graph


def _brute(x, k, mask=None, loop=False):
    # same f32 norm-expansion formula as the IVF path, so fp rounding
    # cancels and any mismatch is an algorithmic miss, not noise
    x = np.asarray(x, np.float32)
    sq = (x * x).sum(-1)
    d = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d = np.maximum(d, 0.0)
    if not loop:
        np.fill_diagonal(d, np.inf)
    if mask is not None:
        d[:, ~mask] = np.inf
        d[~mask, :] = np.inf
    sd = np.sort(d, axis=1)[:, :k]
    return sd


def _check(x, k, mask=None, **kw):
    dists, idx, n_uncert = ivf_knn(
        jnp.asarray(x), k=k,
        node_mask=None if mask is None else jnp.asarray(mask), **kw
    )
    assert int(n_uncert) == 0
    ref = _brute(x, k, mask)
    got = np.sort(np.asarray(dists), axis=1)
    rows = np.ones(len(x), bool) if mask is None else mask
    finite = np.isfinite(ref[rows])
    # f32 norm-expansion noise scales with ||x||^2; near-ties inside that
    # band are legitimately implementation-order dependent
    scale = float(np.max((np.asarray(x, np.float64) ** 2).sum(-1)))
    atol = max(1e-5, 64 * np.finfo(np.float32).eps * scale)
    np.testing.assert_allclose(
        got[rows][finite], ref[rows][finite], rtol=1e-4, atol=atol
    )
    # returned indices reproduce the distances
    xr = np.asarray(x, np.float64)
    d_from_idx = ((xr[:, None, :] - xr[np.asarray(idx)]) ** 2).sum(-1)
    ok = np.isfinite(np.asarray(dists)) & rows[:, None]
    np.testing.assert_allclose(
        d_from_idx[ok], np.asarray(dists)[ok], rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("probe_impl", ["xla", "pallas"])
def test_clustered_latent(seed, probe_impl):
    rng = np.random.default_rng(seed)
    n = 4096
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = centers[who] + 0.05 * rng.normal(size=(n, 8)).astype(np.float32)
    _check(x, 8, n_cells=64, cell_cap=192, n_probe=8, fallback_cap=1024,
           probe_impl=probe_impl)


@pytest.mark.parametrize(
    "test", ["duplicates", "spill"]
)
def test_pallas_probe_matches_xla_probe(test):
    """The Pallas probe (ops/pallas/ivf_probe.py) must reproduce the XLA
    probe's neighbor SETS exactly (ties may permute within a row) on the
    awkward cases: exact duplicates and bucket overflow."""
    rng = np.random.default_rng(6)
    if test == "duplicates":
        x = rng.normal(size=(1024, 3)).astype(np.float32)
        x[100:110] = x[50:60]
        kw = dict(n_cells=16, cell_cap=256, n_probe=6, fallback_cap=1024)
    else:
        x = 0.01 * rng.normal(size=(2048, 4)).astype(np.float32)
        x[:64] += 0.5
        kw = dict(n_cells=16, cell_cap=64, n_probe=4, extra_cap=2048,
                  fallback_cap=2048)
    d1, i1, u1 = ivf_knn(jnp.asarray(x), k=4, probe_impl="xla", **kw)
    d2, i2, u2 = ivf_knn(jnp.asarray(x), k=4, probe_impl="pallas", **kw)
    assert int(u1) == 0 and int(u2) == 0
    np.testing.assert_allclose(
        np.sort(np.asarray(d1), 1), np.sort(np.asarray(d2), 1),
        rtol=1e-5, atol=1e-6,
    )


def test_uniform():
    # uniform low-d clouds certify poorly (cell radius ~ cell spacing, so
    # the triangle bound is weak) — exactness then rides the fallback pass,
    # which must cover every uncertified query
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2048, 4)).astype(np.float32)
    _check(x, 4, n_cells=32, cell_cap=192, n_probe=16, fallback_cap=2048)


def test_masked_and_duplicates():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1024, 3)).astype(np.float32)
    x[100:110] = x[50:60]  # exact duplicates
    mask = rng.random(1024) > 0.2
    _check(x, 4, mask=mask, n_cells=16, cell_cap=256, n_probe=6,
           fallback_cap=1024)


@pytest.mark.parametrize(
    "probe_impl,cand_cap",
    [("xla", None), ("xla", 96), ("pallas", None), ("pallas", 64)],
)
def test_spill_overflow_goes_to_extra_set(probe_impl, cand_cap):
    # one giant cluster overflows its cell; exactness must survive via the
    # widened candidate table and/or the extra set (cand_cap=cell_cap for
    # xla/None disables the widening; pallas/None widens to 1.5x)
    rng = np.random.default_rng(4)
    x = 0.01 * rng.normal(size=(2048, 4)).astype(np.float32)
    x[:64] += 0.5  # a far small cluster
    _check(x, 4, n_cells=16, cell_cap=64, n_probe=4, extra_cap=2048,
           fallback_cap=2048, probe_impl=probe_impl, cand_cap=cand_cap)


@pytest.mark.parametrize("probe_impl", ["xla", "pallas"])
def test_wide_cand_table_no_duplicate_neighbors(probe_impl):
    """Regression (round-2 battery #17/#18): with a widened candidate table
    (cand_cap > cell_cap), points with rank in [cell_cap, cand_cap) sit in
    their cell's candidate slab — putting them in the extra set TOO made
    the concat+top_k merges return the same neighbor twice, silently
    evicting a true neighbor (certification cannot catch it: the k-th
    distance only shrinks). Clustered data with cells forced over cap,
    checked against a float64 oracle + explicit duplicate-id assertion."""
    k = 8
    rng = np.random.default_rng(30)
    n = 2048
    centers = rng.normal(size=(n // 64, 8)).astype(np.float32)
    who = rng.integers(0, n // 64, size=n)
    x = (centers[who] + 0.05 * rng.normal(size=(n, 8))).astype(np.float32)
    xs = x.astype(np.float64)
    dd = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(dd, np.inf)
    oracle = np.sort(np.partition(dd, k, axis=1)[:, :k], 1)
    for cell_cap, cand_cap in ((48, 72), (24, 36)):
        d_, i_, unc = ivf_knn(
            jnp.asarray(x), k=k, n_cells=64, cell_cap=cell_cap,
            cand_cap=cand_cap, probe_impl=probe_impl,
        )
        assert int(unc) == 0
        ii = np.asarray(i_)
        got = np.sort(((xs[:, None, :] - xs[ii]) ** 2).sum(-1), 1)
        np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-6)
        # every returned row must be k DISTINCT neighbors
        n_distinct = min(len(set(row.tolist())) for row in ii)
        assert n_distinct == k


@pytest.mark.parametrize("probe_impl", ["xla", "pallas"])
def test_gather_bucket_build_matches_scatter(probe_impl):
    """The gather-formulated slab tables (bucket_impl="gather") must produce
    the same kNN as the scatter build — including spilled cells, masked
    nodes, and the widened candidate table."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(32, 8)).astype(np.float32)
    who = rng.integers(0, 32, size=2048)
    x = centers[who] + 0.05 * rng.normal(size=(2048, 8)).astype(np.float32)
    x[:80] += 3.0  # overflow one region -> spill path
    mask = rng.random(2048) > 0.1
    kw = dict(
        n_cells=32, cell_cap=64, cand_cap=96, n_probe=6, extra_cap=2048,
        fallback_cap=2048, probe_impl=probe_impl,
    )
    outs = {}
    for impl in ("scatter", "gather"):
        d_, i_, unc = ivf_knn(
            jnp.asarray(x), k=6, node_mask=jnp.asarray(mask),
            bucket_impl=impl, **kw,
        )
        assert int(unc) == 0
        outs[impl] = (np.asarray(d_), np.asarray(i_))
        _check(x, 6, mask=mask, bucket_impl=impl, **kw)
    np.testing.assert_array_equal(outs["scatter"][1], outs["gather"][1])
    np.testing.assert_allclose(outs["scatter"][0], outs["gather"][0])


def test_fast_assign_is_exactness_neutral():
    # assignment precision is a clustering choice: rad/probe/certification
    # all derive from the realized assignment, so DEFAULT-precision (bf16
    # MXU) assignment must still yield the exact kNN spectrum
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(32, 8)).astype(np.float32)
    who = rng.integers(0, 32, size=2048)
    x = centers[who] + 0.05 * rng.normal(size=(2048, 8)).astype(np.float32)
    kw = dict(n_cells=32, cell_cap=192, n_probe=8, fallback_cap=1024)
    for fast in (True, False):
        _check(x, 8, fast_assign=fast, **kw)


def test_matches_knn_graph_convention():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(512, 4)).astype(np.float32)
    ei, mask, dists = knn_graph(jnp.asarray(x), 4)
    d_ref = np.sort(_brute(x, 4), axis=1)
    got, _, nu = ivf_knn(jnp.asarray(x), k=4, n_cells=8, cell_cap=192,
                         n_probe=4, fallback_cap=512)
    assert int(nu) == 0
    np.testing.assert_allclose(
        np.sort(np.asarray(got), 1), d_ref, rtol=1e-4, atol=1e-5
    )


def test_merge_sorted_pairs_matches_topk():
    """Two-pointer sorted merge == top_k over the concatenation (the op it
    replaced on the hardware-hot path), including inf padding and ragged
    pointer exhaustion."""
    import numpy as np
    import jax.numpy as jnp
    from gnn_tracking_tpu.ops.ivf_knn import _merge_sorted_pairs

    rng = np.random.default_rng(0)
    for trial in range(5):
        n, ka, kb, ko = 64, 16, 16, 16
        da = np.sort(rng.random((n, ka)), axis=1)
        db = np.sort(rng.random((n, kb)), axis=1)
        # inject inf tails (missing neighbors)
        da[rng.random((n, ka)) < 0.2] = np.inf
        db[rng.random((n, kb)) < 0.2] = np.inf
        da = np.sort(da, axis=1)
        db = np.sort(db, axis=1)
        ia = rng.integers(0, 1000, size=(n, ka))
        ib = rng.integers(1000, 2000, size=(n, kb))
        dm, im = _merge_sorted_pairs(
            jnp.asarray(da), jnp.asarray(ia), jnp.asarray(db), jnp.asarray(ib), ko
        )
        ref_d = np.sort(np.concatenate([da, db], axis=1), axis=1)[:, :ko]
        np.testing.assert_array_equal(np.asarray(dm), ref_d)
        # indices: every finite merged entry's distance must match the id's
        # source distance
        src = np.concatenate([da, db], axis=1)
        src_ids = np.concatenate([ia, ib], axis=1)
        for r in range(0, n, 17):
            for c in range(ko):
                if np.isfinite(dm[r, c]):
                    j = np.where(src_ids[r] == np.asarray(im)[r, c])[0]
                    assert np.any(np.isclose(src[r, j], np.asarray(dm)[r, c]))
