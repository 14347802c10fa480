"""End-to-end intra-event-parallel training: sharded message passing (halo
exchange) + sharded condensation loss + optimizer step on a virtual graph
mesh, verified against the identical single-device computation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
from gnn_tracking_tpu.models.mlp import MLP
from gnn_tracking_tpu.losses.oc import condensation_loss
from gnn_tracking_tpu.parallel.halo import (
    gather_halo_a2a,
    partition_event,
    unpartition_nodes,
)
from gnn_tracking_tpu.parallel.sharded_tc import (
    ShardedCondensationData,
    partition_condensation,
    sharded_condensation_loss,
)
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask

from .test_training import make_graph

N_SHARDS = 4
K = 16
DIM = 8
N_LAYERS = 2


@pytest.fixture(scope="module")
def setup():
    g = make_graph(0)
    g = g.replace(
        x=g.x[:, :DIM],
        edge_attr=jnp.pad(g.edge_attr, ((0, 0), (0, DIM - g.edge_attr.shape[1]))),
    )
    sg = partition_event(g, N_SHARDS)
    cd = partition_condensation(g, sg, max_n_objects=K)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("graph",))
    in_mods = [
        InteractionNetwork(node_outdim=DIM, edge_outdim=DIM, node_hidden_dim=16, edge_hidden_dim=16)
        for _ in range(N_LAYERS)
    ]
    beta_head = MLP(output_size=1, hidden_dim=16, L=2)
    params = {
        "layers": [
            m.init(jax.random.PRNGKey(i), g.x, g.edge_index, g.edge_attr)["params"]
            for i, m in enumerate(in_mods)
        ],
        "beta": beta_head.init(jax.random.PRNGKey(99), g.x)["params"],
    }
    return g, sg, cd, mesh, in_mods, beta_head, params


def _model_local(in_mods, beta_head, params, sg_local, n_local, axis_name="graph"):
    x = sg_local.x
    e = sg_local.edge_attr
    for m, p in zip(in_mods, params["layers"]):
        x_ext = gather_halo_a2a(x, sg_local, axis_name)
        x, e = m.apply({"params": p}, x_ext, sg_local.edge_index, e, sg_local.edge_mask)
        x = x[:n_local]
    beta = jax.nn.sigmoid(
        beta_head.apply({"params": params["beta"]}, x)
    ).squeeze(-1)
    beta = 1e-6 + (1 - 2e-6) * beta
    return x, beta


def _reference_loss(g, in_mods, beta_head, params):
    x, e = g.x, g.edge_attr
    for m, p in zip(in_mods, params["layers"]):
        x, e = m.apply({"params": p}, x, g.edge_index, e, g.edge_mask)
    beta = jax.nn.sigmoid(beta_head.apply({"params": params["beta"]}, x)).squeeze(-1)
    beta = 1e-6 + (1 - 2e-6) * beta
    losses, _ = condensation_loss(
        beta=beta,
        x=x,
        object_id=g.particle_id,
        object_mask=get_good_node_mask(g),
        node_mask=g.node_mask,
        q_min=0.01,
        max_n_objects=K,
    )
    return losses["attractive"] + losses["repulsive"] + losses["coward"] + losses["noise"]


def test_full_sharded_train_step_matches(setup):
    g, sg, cd, mesh, in_mods, beta_head, params = setup
    from jax import shard_map

    spec_s, spec_r = P("graph"), P()
    cd_specs = ShardedCondensationData(
        obj_col=spec_s, object_mask=spec_s, node_mask=spec_s, is_noise=spec_s,
        global_index=spec_s, obj_valid=spec_r, n_objects=spec_r, n_hits=spec_r,
        n_hits_oi=spec_r,
    )
    n_local = sg.n_local

    def sharded_loss(params, sg_in, cd_in):
        def body(params, sg_blk, cd_blk):
            sg_local = jax.tree.map(lambda v: v[0], sg_blk)
            cd_local = ShardedCondensationData(
                obj_col=cd_blk.obj_col[0],
                object_mask=cd_blk.object_mask[0],
                node_mask=cd_blk.node_mask[0],
                is_noise=cd_blk.is_noise[0],
                global_index=cd_blk.global_index[0],
                obj_valid=cd_blk.obj_valid,
                n_objects=cd_blk.n_objects,
                n_hits=cd_blk.n_hits,
                n_hits_oi=cd_blk.n_hits_oi,
            )
            x, beta = _model_local(in_mods, beta_head, params, sg_local, n_local)
            losses = sharded_condensation_loss(
                beta, x, cd_local, q_min=0.01, max_n_objects=K
            )
            return (
                losses["attractive"] + losses["repulsive"] + losses["coward"] + losses["noise"]
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: spec_r, params),
                jax.tree.map(lambda _: spec_s, sg_in),
                cd_specs,
            ),
            out_specs=spec_r,
        )(params, sg_in, cd_in)

    loss_sharded, grads_sharded = jax.jit(
        jax.value_and_grad(sharded_loss)
    )(params, sg, cd)
    loss_ref, grads_ref = jax.jit(
        jax.value_and_grad(lambda p: _reference_loss(g, in_mods, beta_head, p))
    )(params)

    assert float(loss_sharded) == pytest.approx(float(loss_ref), rel=1e-8)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_sharded), jax.tree_util.tree_leaves(grads_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-8)

    # one optimizer step runs end to end
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads_sharded, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.isfinite(float(sharded_loss(new_params, sg, cd)))
