"""Sharded condensation loss must match the single-device tiger loss exactly
on a virtual graph mesh — the full-detector context-parallel training story."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from pytest import approx

from gnn_tracking_tpu.losses.oc import condensation_loss
from gnn_tracking_tpu.parallel.halo import partition_event
from gnn_tracking_tpu.parallel.sharded_tc import (
    make_sharded_condensation,
    partition_condensation,
)
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask

from .test_training import make_graph

N_SHARDS = 4
K = 16


@pytest.fixture(scope="module")
def setup():
    g = make_graph(0)
    rng = np.random.default_rng(1)
    beta = jnp.asarray(rng.uniform(0.01, 0.99, size=g.num_nodes))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 3)))
    sg = partition_event(g, N_SHARDS)
    cd = partition_condensation(g, sg, max_n_objects=K)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    return g, sg, cd, mesh, beta, x


def _shard_nodes(sg, arr):
    gi = np.asarray(sg.global_index)
    sm = np.asarray(sg.node_mask)
    out = np.zeros(gi.shape + np.asarray(arr).shape[1:], dtype=np.asarray(arr).dtype)
    out[sm] = np.asarray(arr)[gi[sm]]
    return jnp.asarray(out)


def test_sharded_condensation_matches_tiger(setup):
    g, sg, cd, mesh, beta, x = setup
    mask = get_good_node_mask(g)
    ref, _ = condensation_loss(
        beta=beta,
        x=x,
        object_id=g.particle_id,
        object_mask=mask,
        node_mask=g.node_mask,
        q_min=0.01,
        max_n_objects=K,
    )
    loss_fn = make_sharded_condensation(mesh, max_n_objects=K)
    got = loss_fn(_shard_nodes(sg, beta), _shard_nodes(sg, x), cd)
    for key in ref:
        assert float(got[key]) == approx(float(ref[key]), rel=1e-9), key


def test_sharded_condensation_grads_match(setup):
    g, sg, cd, mesh, beta, x = setup
    mask = get_good_node_mask(g)
    loss_fn = make_sharded_condensation(mesh, max_n_objects=K)

    def total_sharded(beta_s, x_s):
        out = loss_fn(beta_s, x_s, cd)
        return out["attractive"] + out["repulsive"] + out["coward"] + out["noise"]

    def total_ref(beta_f, x_f):
        out, _ = condensation_loss(
            beta=beta_f,
            x=x_f,
            object_id=g.particle_id,
            object_mask=mask,
            node_mask=g.node_mask,
            q_min=0.01,
            max_n_objects=K,
        )
        return out["attractive"] + out["repulsive"] + out["coward"] + out["noise"]

    gb_s, gx_s = jax.grad(total_sharded, argnums=(0, 1))(
        _shard_nodes(sg, beta), _shard_nodes(sg, x)
    )
    gb_f, gx_f = jax.grad(total_ref, argnums=(0, 1))(beta, x)
    # map sharded grads back to global order and compare
    gi = np.asarray(sg.global_index)
    sm = np.asarray(sg.node_mask)
    gb_back = np.zeros_like(np.asarray(gb_f))
    gx_back = np.zeros_like(np.asarray(gx_f))
    gb_back[gi[sm]] = np.asarray(gb_s)[sm]
    gx_back[gi[sm]] = np.asarray(gx_s)[sm]
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(gb_back[nm], np.asarray(gb_f)[nm], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(gx_back[nm], np.asarray(gx_f)[nm], rtol=1e-6, atol=1e-9)


def test_partition_condensation_subsample():
    """With more good particles than max_n_objects, subsample_seed keeps a
    deterministic random subset as objects (the reference sample_pids
    analog, oc.py:410-415); without it the strict assert fires."""
    from gnn_tracking_tpu.parallel.sharded_tc import partition_condensation

    g = make_graph(3)
    sg = partition_event(g, N_SHARDS)
    n_good_pids = len(
        np.unique(np.asarray(g.particle_id)[np.asarray(get_good_node_mask(g))])
    )
    k = max(n_good_pids // 2, 1)

    with pytest.raises(AssertionError):
        partition_condensation(g, sg, max_n_objects=k)

    cd = partition_condensation(g, sg, max_n_objects=k, subsample_seed=0)
    assert int(cd.n_objects) == k
    # determinism
    cd2 = partition_condensation(g, sg, max_n_objects=k, subsample_seed=0)
    np.testing.assert_array_equal(np.asarray(cd.obj_col), np.asarray(cd2.obj_col))
    # every member hit's column is a valid object slot; non-members are -1
    col = np.asarray(cd.obj_col)
    assert col.max() < k
    # object hits attract; hit count of interest matches the good-mask count
    assert int(cd.n_hits_oi) == int(np.asarray(cd.object_mask).sum())
    # the loss still evaluates finitely on the subsampled tables
    beta = jnp.full(col.shape, 0.5)
    x = jnp.zeros(col.shape + (3,))
    from gnn_tracking_tpu.parallel.sharded_tc import make_sharded_condensation

    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    loss_fn = make_sharded_condensation(mesh, max_n_objects=k)
    out = loss_fn(beta, x + 0.1 * jax.random.normal(jax.random.PRNGKey(0), x.shape), cd)
    assert all(np.isfinite(float(v)) for v in out.values())
