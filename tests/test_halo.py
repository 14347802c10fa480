"""Intra-event graph-partition (context-parallel analog) correctness tests:
the sharded message-passing stack must reproduce the single-device result
bit-for-bit on an 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
from gnn_tracking_tpu.parallel.halo import (
    make_sharded_apply,
    partition_event,
    unpartition_nodes,
)

from .test_models import make_graph

N_SHARDS = 4
N_LAYERS = 3
DIM = 8


@pytest.fixture(scope="module")
def setup():
    g = make_graph(0)
    # bring features to a common dim for stacked INs
    g = g.replace(
        x=g.x[:, :DIM],
        edge_attr=jnp.pad(g.edge_attr, ((0, 0), (0, DIM - g.edge_attr.shape[1]))),
    )
    modules = [
        InteractionNetwork(node_outdim=DIM, edge_outdim=DIM, node_hidden_dim=16, edge_hidden_dim=16)
        for _ in range(N_LAYERS)
    ]
    params = [
        m.init(jax.random.PRNGKey(i), g.x, g.edge_index, g.edge_attr)["params"]
        for i, m in enumerate(modules)
    ]
    return g, modules, params


def reference_forward(g, modules, params):
    x, e = g.x, g.edge_attr
    for m, p in zip(modules, params):
        x, e = m.apply({"params": p}, x, g.edge_index, e, g.edge_mask)
    return x


def test_sharded_matches_single_device(setup):
    g, modules, params = setup
    x_ref = reference_forward(g, modules, params)

    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))

    in_module = modules[0]

    def layer_fn(p, x_ext, edge_index, edge_attr, edge_mask, n_local):
        x_new, e_new = in_module.apply(
            {"params": p}, x_ext, edge_index, edge_attr, edge_mask
        )
        return x_new[:n_local], e_new

    run = make_sharded_apply(mesh, sg.n_local, layer_fn, N_LAYERS)
    x_shards, _ = run(params, sg)
    x_out = unpartition_nodes(x_shards, sg, g.num_nodes)

    node_mask = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        np.asarray(x_out)[node_mask], np.asarray(x_ref)[node_mask], rtol=1e-6, atol=1e-6
    )


def test_partition_roundtrip(setup):
    g, _, _ = setup
    sg = partition_event(g, N_SHARDS)
    # every valid global node appears exactly once
    gi = np.asarray(sg.global_index)[np.asarray(sg.node_mask)]
    assert sorted(gi.tolist()) == sorted(
        np.where(np.asarray(g.node_mask))[0].tolist()
    )
    # unpartition returns the original features
    x_back = unpartition_nodes(sg.x, sg, g.num_nodes)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(np.asarray(x_back)[nm], np.asarray(g.x)[nm])
    # all edges preserved
    assert int(np.asarray(sg.edge_mask).sum()) == int(np.asarray(g.edge_mask).sum())


def test_a2a_halo_matches_all_gather(setup):
    g, modules, params = setup
    x_ref = reference_forward(g, modules, params)
    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    in_module = modules[0]

    def layer_fn(p, x_ext, edge_index, edge_attr, edge_mask, n_local):
        x_new, e_new = in_module.apply(
            {"params": p}, x_ext, edge_index, edge_attr, edge_mask
        )
        return x_new[:n_local], e_new

    run = make_sharded_apply(mesh, sg.n_local, layer_fn, N_LAYERS, halo_impl="all_to_all")
    x_shards, _ = run(params, sg)
    x_out = unpartition_nodes(x_shards, sg, g.num_nodes)
    node_mask = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        np.asarray(x_out)[node_mask], np.asarray(x_ref)[node_mask], rtol=1e-6, atol=1e-6
    )


def test_sharded_gradients_match(setup):
    """Gradients through the shard_map halo stack equal single-device grads —
    prerequisite for intra-event-parallel training."""
    g, modules, params = setup
    sg = partition_event(g, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    in_module = modules[0]

    def layer_fn(p, x_ext, edge_index, edge_attr, edge_mask, n_local):
        x_new, e_new = in_module.apply(
            {"params": p}, x_ext, edge_index, edge_attr, edge_mask
        )
        return x_new[:n_local], e_new

    run = make_sharded_apply(mesh, sg.n_local, layer_fn, N_LAYERS, halo_impl="all_to_all")
    node_mask = np.asarray(g.node_mask)

    def loss_sharded(params):
        x_shards, _ = run(params, sg)
        x_out = unpartition_nodes(x_shards, sg, g.num_nodes)
        return (jnp.where(jnp.asarray(node_mask)[:, None], x_out, 0) ** 2).sum()

    def loss_ref(params):
        x, e = g.x, g.edge_attr
        for m, p in zip(modules, params):
            x, e = m.apply({"params": p}, x, g.edge_index, e, g.edge_mask)
        return (jnp.where(jnp.asarray(node_mask)[:, None], x, 0) ** 2).sum()

    g_sh = jax.grad(loss_sharded)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sh), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_ring_halo_matches_a2a_and_allgather():
    """Neighbor-ppermute halo fetch is exact when the partition's ring
    distance is within max_dist (phi-contiguous shards -> distance 1)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from gnn_tracking_tpu.parallel.halo import (
        gather_halo,
        gather_halo_a2a,
        gather_halo_ring,
        partition_event,
        ring_halo_distance,
    )
    from tests.test_learning import synthetic_event

    g = synthetic_event(3)
    n_shards = 4
    sg = partition_event(g, n_shards)
    dist = ring_halo_distance(sg)
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("graph",))
    x_feat = jnp.asarray(np.asarray(sg.x), dtype=jnp.float32)

    def run(fetch, **kw):
        def body(sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            return fetch(sg_l.x, sg_l, "graph", **kw)[None]

        spec = jax.tree.map(lambda _: P("graph"), sg)
        return np.asarray(
            jax.jit(
                shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=P("graph"))
            )(sg)
        )

    ref = run(gather_halo)
    a2a = run(gather_halo_a2a)
    ring = run(gather_halo_ring, max_dist=max(dist, 1))
    np.testing.assert_array_equal(a2a, ref)
    np.testing.assert_array_equal(ring, ref)


def test_ring_halo_insufficient_distance_drops_rows():
    """max_dist below the partition's true ring distance must NOT silently
    equal the exact fetch (guards the exactness precondition)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from gnn_tracking_tpu.parallel.halo import (
        gather_halo,
        gather_halo_ring,
        partition_event,
        ring_halo_distance,
    )

    from gnn_tracking_tpu.graphs import EventGraph

    rng = np.random.default_rng(7)
    n = 64
    # random (non-phi-local) edges force halo sources from far shards
    ei = rng.integers(0, n, size=(2, 400))
    g = EventGraph.from_arrays(
        x=rng.normal(size=(n, 5)).astype(np.float32),
        edge_index=ei,
        edge_attr=rng.normal(size=(400, 3)).astype(np.float32),
        y=np.zeros(400),
    )
    sg = partition_event(g, 4, sort_key=rng.permutation(n).astype(float))
    dist = ring_halo_distance(sg)
    assert dist == 2  # P=4: farthest ring distance

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))

    def run(fetch, **kw):
        def body(sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            return fetch(sg_l.x, sg_l, "graph", **kw)[None]

        spec = jax.tree.map(lambda _: P("graph"), sg)
        return np.asarray(
            jax.jit(
                shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=P("graph"))
            )(sg)
        )

    ref = run(gather_halo)
    full = run(gather_halo_ring, max_dist=2)
    np.testing.assert_array_equal(full, ref)
    short = run(gather_halo_ring, max_dist=1)
    assert not np.array_equal(short, ref)
