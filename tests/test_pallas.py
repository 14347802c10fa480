"""Pallas kernel tests (interpret mode on CPU; numerics checked against the
XLA reference implementation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gnn_tracking_tpu.ops.knn import _blocked_neighbor_topk
from gnn_tracking_tpu.ops.pallas.pairwise_topk import pairwise_topk


@pytest.mark.parametrize("n,k", [(100, 4), (300, 8)])
def test_pairwise_topk_matches_xla(n, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    d_ref, i_ref = _blocked_neighbor_topk(
        x, k, node_mask=None, batch=None, loop=False, block_size=128
    )
    d_pl, i_pl = pairwise_topk(x, k=k, block_q=64, block_c=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_ref, dtype=np.float32), rtol=1e-4, atol=1e-4
    )
    # index sets must match per row (order may differ on ties)
    for a, b in zip(np.asarray(i_pl), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_pairwise_topk_masked():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(60, 4)).astype(np.float32)
    mask = np.arange(60) < 40
    d_pl, i_pl = pairwise_topk(
        jnp.asarray(x), k=3, node_mask=jnp.asarray(mask), block_q=32, block_c=32,
        interpret=True,
    )
    d_ref, i_ref = pairwise_topk(
        jnp.asarray(x[:40]), k=3, block_q=32, block_c=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d_pl)[:40], np.asarray(d_ref), rtol=1e-5)
    assert not np.isfinite(np.asarray(d_pl)[40:]).any()
