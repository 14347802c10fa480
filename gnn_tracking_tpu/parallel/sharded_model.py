"""Full track-condensation training across an intra-event graph partition.

Production wrapper around the pieces verified in ``parallel/halo.py`` and
``parallel/sharded_tc.py``: one full-detector event sharded over the
``graph`` mesh axis, with the ``ModularGraphTCN`` (no-EC / MLGC-pipeline
configuration, reference ``tcn.py:522-580``) computed per shard:

* node/edge encoders and output heads are pointwise — embarrassingly
  parallel over hit shards;
* the condensation interaction-network stack exchanges boundary-hit halos
  over ICI before every layer (all-to-all of only halo rows);
* the condensation loss reduces globally (per-particle CP argmax via pmax,
  potentials via psum).

The whole train step is one ``jit`` of a ``shard_map``; gradients transpose
through the collectives automatically.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.models.interaction_network import InteractionNetwork
from gnn_tracking_tpu.models.mlp import MLP, ResFCNN
from gnn_tracking_tpu.models.resin import sqconvex_combination
from gnn_tracking_tpu.parallel.halo import ShardedGraph, gather_halo_a2a
from gnn_tracking_tpu.parallel.sharded_tc import (
    ShardedCondensationData,
    sharded_condensation_loss,
)


class ShardedTCNBody(nn.Module):
    """Per-shard ModularGraphTCN body (ec=None configuration).

    Mirrors ``ModularGraphTCN`` (reference ``tcn.py:118-308``): ResFCNN node
    encoder (depth=1, alpha=0), MLP edge encoder, skip1 ResIN with halo
    exchange between layers, beta/cluster heads with eps clipping and
    learnable latent normalization.
    """

    h_dim: int = 8
    e_dim: int = 8
    h_outdim: int = 4
    hidden_dim: int = 40
    L_hc: int = 3
    alpha_hc: float = 0.5
    axis_name: str = "graph"
    #: promise per-shard edges are sorted by local target
    #: (``partition_event(sort_edges=True)``)
    sorted_edges: bool = False
    #: split the relational MLP first linear into node-level projections
    split_relational: bool = False

    @nn.compact
    def __call__(self, sg_local: ShardedGraph, n_local: int):
        x = ResFCNN(
            out_dim=self.h_dim,
            hidden_dim=self.hidden_dim,
            depth=1,
            bias=False,
            alpha=0.0,
            name="hc_node_encoder",
        )(sg_local.x)
        x = nn.relu(x)
        e = nn.relu(
            MLP(
                output_size=self.e_dim,
                hidden_dim=self.hidden_dim,
                L=2,
                bias=False,
                name="hc_edge_encoder",
            )(sg_local.edge_attr)
        )
        for i in range(self.L_hc):
            act = nn.relu if i > 0 else (lambda v: v)
            x_ext = gather_halo_a2a(act(x), sg_local, self.axis_name)
            delta_x, e = InteractionNetwork(
                node_outdim=self.h_dim,
                edge_outdim=self.e_dim,
                node_hidden_dim=self.hidden_dim,
                edge_hidden_dim=self.hidden_dim,
                sorted_edges=self.sorted_edges,
                split_relational=self.split_relational,
                name=f"hc_in_{i}",
            )(x_ext, sg_local.edge_index, act(e), sg_local.edge_mask)
            x = sqconvex_combination(
                delta=delta_x[:n_local], residue=x, alpha_residue=self.alpha_hc
            )
        beta = nn.sigmoid(
            MLP(output_size=1, hidden_dim=self.hidden_dim, L=3, name="p_beta")(x)
        )
        epsilon = 1e-6
        beta = epsilon + (1 - 2 * epsilon) * beta
        h = MLP(
            output_size=self.h_outdim, hidden_dim=self.hidden_dim, L=3, name="p_cluster"
        )(x)
        scale = self.param("latent_normalization", lambda k, s: jnp.ones(s), (1,))
        return h * scale, beta.squeeze(-1)


class ShardedGraphTCN(nn.Module):
    """Per-shard full GraphTCN: edge classifier + condensation network
    (reference ``tcn.py:311-386`` ``GraphTCN`` = ``ECForGraphTCN`` +
    ``ModularGraphTCN``), with halo exchanges replacing whole-graph message
    passing in BOTH interaction-network stacks.

    The EC cut stays a local edge mask (edges live with their target hit);
    edge weights, like every per-edge quantity, are shard-local. Returns
    ``(h, beta, w, ec_edge_mask)`` — per-shard, local rows only.
    """

    h_dim: int = 5
    e_dim: int = 4
    h_outdim: int = 2
    hidden_dim: int = 40
    L_ec: int = 3
    L_hc: int = 3
    alpha_ec: float = 0.5
    alpha_hc: float = 0.5
    ec_threshold: float = 0.5
    feed_edge_weights: bool = False
    axis_name: str = "graph"
    #: promise per-shard edges are sorted by local target
    #: (``partition_event(sort_edges=True)``)
    sorted_edges: bool = False
    #: split the relational MLP first linear into node-level projections
    split_relational: bool = False

    @nn.compact
    def __call__(self, sg_local: ShardedGraph, n_local: int):
        # ---- edge classifier (mirrors ECForGraphTCN, edge_classifier.py) ----
        h_ec = nn.relu(
            MLP(
                output_size=self.h_dim,
                hidden_dim=self.hidden_dim,
                L=2,
                bias=False,
                name="ec_node_encoder",
            )(sg_local.x)
        )
        e_ec = nn.relu(
            MLP(
                output_size=self.e_dim,
                hidden_dim=self.hidden_dim,
                L=2,
                bias=False,
                name="ec_edge_encoder",
            )(sg_local.edge_attr)
        )
        edge_attrs_ec = [e_ec]
        for i in range(self.L_ec):
            act = nn.relu if i > 0 else (lambda v: v)
            x_ext = gather_halo_a2a(act(h_ec), sg_local, self.axis_name)
            delta_x, e_ec = InteractionNetwork(
                node_outdim=self.h_dim,
                edge_outdim=self.e_dim,
                node_hidden_dim=self.hidden_dim,
                edge_hidden_dim=self.hidden_dim,
                sorted_edges=self.sorted_edges,
                split_relational=self.split_relational,
                name=f"ec_in_{i}",
            )(x_ext, sg_local.edge_index, act(e_ec), sg_local.edge_mask)
            h_ec = sqconvex_combination(
                delta=delta_x[:n_local], residue=h_ec, alpha_residue=self.alpha_ec
            )
            edge_attrs_ec.append(e_ec)
        h_ec_ext = gather_halo_a2a(h_ec, sg_local, self.axis_name)
        w_input = jnp.concatenate(
            [
                h_ec_ext[sg_local.edge_index[0]],
                h_ec_ext[sg_local.edge_index[1]],
                *edge_attrs_ec,
            ],
            axis=1,
        )
        eps = 0.001
        logits = MLP(output_size=1, hidden_dim=self.hidden_dim, L=3, name="ec_w")(
            w_input
        )
        w = (eps + (1 - 2 * eps) * nn.sigmoid(logits)).squeeze(-1)
        ec_edge_mask = sg_local.edge_mask & (w > self.ec_threshold)

        # ---- condensation network (mirrors ModularGraphTCN hc path) ----
        edge_feats = sg_local.edge_attr
        if self.feed_edge_weights:
            edge_feats = jnp.concatenate([edge_feats, w[:, None]], axis=1)
        x = nn.relu(
            ResFCNN(
                out_dim=self.h_dim,
                hidden_dim=self.hidden_dim,
                depth=1,
                bias=False,
                alpha=0.0,
                name="hc_node_encoder",
            )(sg_local.x)
        )
        e = nn.relu(
            MLP(
                output_size=self.e_dim,
                hidden_dim=self.hidden_dim,
                L=2,
                bias=False,
                name="hc_edge_encoder",
            )(edge_feats)
        )
        for i in range(self.L_hc):
            act = nn.relu if i > 0 else (lambda v: v)
            x_ext = gather_halo_a2a(act(x), sg_local, self.axis_name)
            delta_x, e = InteractionNetwork(
                node_outdim=self.h_dim,
                edge_outdim=self.e_dim,
                node_hidden_dim=self.hidden_dim,
                edge_hidden_dim=self.hidden_dim,
                sorted_edges=self.sorted_edges,
                split_relational=self.split_relational,
                name=f"hc_in_{i}",
            )(x_ext, sg_local.edge_index, act(e), ec_edge_mask)
            x = sqconvex_combination(
                delta=delta_x[:n_local], residue=x, alpha_residue=self.alpha_hc
            )
        beta = nn.sigmoid(
            MLP(output_size=1, hidden_dim=self.hidden_dim, L=3, name="p_beta")(x)
        )
        epsilon = 1e-6
        beta = epsilon + (1 - 2 * epsilon) * beta
        h = MLP(
            output_size=self.h_outdim, hidden_dim=self.hidden_dim, L=3, name="p_cluster"
        )(x)
        scale = self.param("latent_normalization", lambda k, s: jnp.ones(s), (1,))
        return h * scale, beta.squeeze(-1), w, ec_edge_mask


def sharded_edge_bce(
    w: jax.Array,
    y: jax.Array,
    edge_mask: jax.Array,
    axis_name: str = "graph",
) -> jax.Array:
    """Globally-reduced masked binary cross-entropy over sharded edge weights
    (the EC loss term of the full GraphTCN; reference
    ``metrics/losses/ec.py:19-42``). Per-shard masked sums, psum over the
    graph axis — exactly the unsharded masked mean."""
    m = edge_mask.astype(w.dtype)
    bce = -(y * jnp.log(w) + (1.0 - y) * jnp.log(1.0 - w))
    s = jax.lax.psum(jnp.sum(bce * m), axis_name)
    c = jax.lax.psum(jnp.sum(m), axis_name)
    return s / jnp.maximum(c, 1.0)


class ShardedTCTrainer:
    """Train a sharded TCN on intra-event-partitioned events."""

    def __init__(
        self,
        mesh: Mesh,
        *,
        model: ShardedTCNBody | None = None,
        q_min: float = 0.01,
        max_n_objects: int = 1024,
        loss_weights: dict[str, float] | None = None,
        optimizer: optax.GradientTransformation | None = None,
        axis_name: str = "graph",
    ):
        self.mesh = mesh
        self.model = model or ShardedTCNBody(axis_name=axis_name)
        self.q_min = q_min
        self.max_n_objects = max_n_objects
        self.loss_weights = loss_weights or {
            "attractive": 1.0,
            "repulsive": 1.0,
            "coward": 0.0,
            "noise": 0.0,
        }
        self.tx = optimizer or optax.adam(1e-3)
        self.axis_name = axis_name
        self.params = None
        self.opt_state = None
        self._step: Callable | None = None

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, sg: ShardedGraph) -> None:
        sg_local = jax.tree.map(lambda v: v[0], sg)
        # halo exchange needs the mesh axis: init under a 1-shard dummy by
        # replacing the collective with identity via eval_shape-free trick:
        # run the real init inside shard_map on the mesh.
        from jax import shard_map

        spec_s = P(self.axis_name)

        def body(rng, sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            return self.model.init(rng, sg_l, sg_l.x.shape[0])

        params = jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), jax.tree.map(lambda _: spec_s, sg)),
                out_specs=P(),
            )
        )(rng, sg)
        self.params = params["params"] if "params" in params else params
        self.opt_state = self.tx.init(self.params)

    # ------------------------------------------------------------------
    def _build_step(self, sg: ShardedGraph) -> Callable:
        from jax import shard_map

        spec_s, spec_r = P(self.axis_name), P()
        n_local = sg.n_local
        cd_specs = ShardedCondensationData(
            obj_col=spec_s,
            object_mask=spec_s,
            node_mask=spec_s,
            is_noise=spec_s,
            global_index=spec_s,
            obj_valid=spec_r,
            n_objects=spec_r,
            n_hits=spec_r,
            n_hits_oi=spec_r,
        )

        def loss_fn(params, sg_in, cd_in):
            def body(params, sg_blk, cd_blk):
                sg_l = jax.tree.map(lambda v: v[0], sg_blk)
                cd_l = ShardedCondensationData(
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
                h, beta = self.model.apply({"params": params}, sg_l, n_local)
                losses = sharded_condensation_loss(
                    beta,
                    h,
                    cd_l,
                    q_min=self.q_min,
                    max_n_objects=self.max_n_objects,
                    axis_name=self.axis_name,
                )
                total = sum(
                    self.loss_weights.get(k, 0.0) * v for k, v in losses.items()
                )
                return total, losses

            return shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    jax.tree.map(lambda _: spec_r, self.params),
                    jax.tree.map(lambda _: spec_s, sg_in),
                    cd_specs,
                ),
                out_specs=(spec_r, jax.tree.map(lambda _: spec_r, {
                    "attractive": 0, "repulsive": 0, "coward": 0, "noise": 0
                })),
            )(params, sg_in, cd_in)

        def step(params, opt_state, sg_in, cd_in):
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, sg_in, cd_in
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses["total"] = total
            return params, opt_state, losses

        return jax.jit(step, donate_argnums=(0, 1))

    def training_step(
        self, sg: ShardedGraph, cd: ShardedCondensationData
    ) -> dict[str, Any]:
        if self._step is None:
            self._step = self._build_step(sg)
        self.params, self.opt_state, losses = self._step(
            self.params, self.opt_state, sg, cd
        )
        return {k: float(v) for k, v in losses.items()}

    def forward(self, sg: ShardedGraph):
        """Per-shard forward: returns (h [P, N_loc, D], beta [P, N_loc])."""
        from jax import shard_map

        spec_s = P(self.axis_name)
        n_local = sg.n_local

        def body(params, sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            h, beta = self.model.apply({"params": params}, sg_l, n_local)
            return h[None], beta[None]

        return jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), jax.tree.map(lambda _: spec_s, sg)),
                out_specs=(spec_s, spec_s),
            )
        )(self.params, sg)


class ShardedGraphTCNTrainer(ShardedTCTrainer):
    """Train the full sharded GraphTCN: condensation + edge-classification
    losses, both globally reduced over the graph axis (the multi-chip analog
    of ``TCModule`` with ``GraphTCN``, reference ``training/tc.py`` +
    ``tcn.py:311-386``)."""

    def __init__(self, mesh: Mesh, *, model: ShardedGraphTCN | None = None, **kwargs):
        kwargs.setdefault(
            "loss_weights",
            {
                "attractive": 1.0,
                "repulsive": 1.0,
                "coward": 0.0,
                "noise": 0.0,
                "edge": 1.0,
            },
        )
        super().__init__(mesh, model=model or ShardedGraphTCN(), **kwargs)

    def _build_step(self, sg: ShardedGraph) -> Callable:
        from jax import shard_map

        spec_s, spec_r = P(self.axis_name), P()
        n_local = sg.n_local
        cd_specs = ShardedCondensationData(
            obj_col=spec_s,
            object_mask=spec_s,
            node_mask=spec_s,
            is_noise=spec_s,
            global_index=spec_s,
            obj_valid=spec_r,
            n_objects=spec_r,
            n_hits=spec_r,
            n_hits_oi=spec_r,
        )
        loss_keys = ["attractive", "repulsive", "coward", "noise", "edge"]

        def loss_fn(params, sg_in, cd_in):
            def body(params, sg_blk, cd_blk):
                sg_l = jax.tree.map(lambda v: v[0], sg_blk)
                cd_l = ShardedCondensationData(
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
                h, beta, w, _ = self.model.apply({"params": params}, sg_l, n_local)
                losses = sharded_condensation_loss(
                    beta,
                    h,
                    cd_l,
                    q_min=self.q_min,
                    max_n_objects=self.max_n_objects,
                    axis_name=self.axis_name,
                )
                losses["edge"] = sharded_edge_bce(
                    w, sg_l.y, sg_l.edge_mask, self.axis_name
                )
                total = sum(
                    self.loss_weights.get(k, 0.0) * v for k, v in losses.items()
                )
                return total, losses

            return shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    jax.tree.map(lambda _: spec_r, self.params),
                    jax.tree.map(lambda _: spec_s, sg_in),
                    cd_specs,
                ),
                out_specs=(spec_r, {k: spec_r for k in loss_keys}),
            )(params, sg_in, cd_in)

        def step(params, opt_state, sg_in, cd_in):
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, sg_in, cd_in
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses["total"] = total
            return params, opt_state, losses

        return jax.jit(step, donate_argnums=(0, 1))

    def forward(self, sg: ShardedGraph):
        """Per-shard forward: (h [P,N_loc,D], beta [P,N_loc], w [P,E_loc],
        ec_edge_mask [P,E_loc])."""
        from jax import shard_map

        spec_s = P(self.axis_name)
        n_local = sg.n_local

        def body(params, sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            h, beta, w, em = self.model.apply({"params": params}, sg_l, n_local)
            return h[None], beta[None], w[None], em[None]

        return jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), jax.tree.map(lambda _: spec_s, sg)),
                out_specs=(spec_s, spec_s, spec_s, spec_s),
            )
        )(self.params, sg)

