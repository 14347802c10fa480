"""Full track-condensation training across an intra-event graph partition.

One event sharded over the ``graph`` mesh axis, trained with the SAME model
modules as single-device runs: :class:`ShardedTCN` adapts any TCN module
(``GraphTCN``, ``GraphTCNForMLGCPipeline``, ``PreTrainedECGraphTCN``, bare
``ModularGraphTCN`` — every config: hetero encoders, skip2/skip_top,
feed_edge_weights, EC variants) by

* presenting the shard's local rows as a normal :class:`EventGraph`;
* passing the halo-exchange hook (``parallel/halo.gather_halo_a2a`` over ICI)
  as the model's ``exchange`` argument — the single seam the model stack
  exposes for graph parallelism (see ``ResIN.__call__``);
* the condensation/EC losses reduce globally (per-particle argmax via pmax,
  potentials/means via psum — ``parallel/sharded_tc.py``).

There is deliberately NO parallel fork of the network body (round-1 had one;
VERDICT #4): parameter trees are identical to single-device modules up to the
adapter's ``model/`` prefix, so checkpoints transfer verbatim in either
direction. The whole train step is one ``jit`` of a ``shard_map``; gradients
transpose through the collectives automatically.

Reference surface: ``tcn.py:118-580`` (the reference has no in-repo
distributed training; its full-detector answer is offline sectorization,
``preprocessing/point_cloud_builder.py:242``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCN,
    GraphTCNForMLGCPipeline,
)
from gnn_tracking_tpu.parallel.halo import ShardedGraph, gather_halo_a2a
from gnn_tracking_tpu.parallel.sharded_tc import (
    ShardedCondensationData,
    sharded_condensation_loss,
)


def shard_as_eventgraph(sg_local: ShardedGraph) -> EventGraph:
    """Present one shard's local slice as a normal :class:`EventGraph`.

    ``edge_index`` keeps its *extended-local* source coordinates (halo slots
    at ``>= n_local``) — only ever dereferenced after the model applies the
    ``exchange`` hook. Per-node truth fields are zeros: the sharded losses
    take truth from :class:`ShardedCondensationData`, not the graph.
    """
    n_loc = sg_local.x.shape[0]
    zi = jnp.zeros((n_loc,), jnp.int32)
    zf = jnp.zeros((n_loc,), jnp.float32)
    return EventGraph(
        x=sg_local.x,
        particle_id=zi,
        pt=zf,
        eta=zf,
        reconstructable=zf,
        node_mask=sg_local.node_mask,
        layer=sg_local.layer,
        sector=zi,
        batch=zi,
        edge_index=sg_local.edge_index,
        edge_attr=sg_local.edge_attr,
        y=sg_local.y,
        edge_mask=sg_local.edge_mask,
        true_edge_index=jnp.zeros((2, 1), jnp.int32),
        true_edge_mask=jnp.zeros((1,), bool),
        extras={},
    )


class ShardedTCN(nn.Module):
    """Run any single-device TCN module per shard with the halo hook.

    Parameters nest under ``model/`` — strip/add that prefix to move
    checkpoints between sharded and single-device runs (or use
    ``{"model": single_device_params}``).

    ``halo_impl``: ``"a2a"`` (default, always exact), ``"ring"``
    (neighbor-ppermute, minimal ICI traffic — requires
    ``halo.ring_halo_distance(sg) <= ring_max_dist``), or ``"all_gather"``.
    """

    model: nn.Module
    axis_name: str = "graph"
    halo_impl: str = "a2a"
    ring_max_dist: int = 1

    @nn.compact
    def __call__(
        self, sg_local: ShardedGraph, n_local: int
    ) -> dict[str, jax.Array | None]:
        from gnn_tracking_tpu.parallel.halo import HALO_IMPLS, gather_halo_ring

        data = shard_as_eventgraph(sg_local)
        if self.halo_impl == "ring":
            def exchange(a: jax.Array) -> jax.Array:
                return gather_halo_ring(
                    a, sg_local, self.axis_name, max_dist=self.ring_max_dist
                )
        else:
            fetch = HALO_IMPLS[self.halo_impl]

            def exchange(a: jax.Array) -> jax.Array:
                return fetch(a, sg_local, self.axis_name)

        return self.model(data, exchange=exchange)


def sharded_edge_bce(
    w: jax.Array,
    y: jax.Array,
    edge_mask: jax.Array,
    axis_name: str | None = "graph",
) -> jax.Array:
    """Globally-reduced masked binary cross-entropy over sharded edge weights
    (the EC loss term of the full GraphTCN; reference
    ``metrics/losses/ec.py:19-42``). Per-shard masked sums, psum over the
    graph axis — exactly the unsharded masked mean. ``axis_name=None``:
    single-shard mode (no collectives)."""
    m = edge_mask.astype(w.dtype)
    bce = -(y * jnp.log(w) + (1.0 - y) * jnp.log(1.0 - w))
    s = jnp.sum(bce * m)
    c = jnp.sum(m)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
    return s / jnp.maximum(c, 1.0)


class ShardedTCTrainer:
    """Train a TCN on intra-event-partitioned events (condensation loss).

    ``model`` is a SINGLE-DEVICE module (default: a small
    ``GraphTCNForMLGCPipeline``); it is wrapped in :class:`ShardedTCN` here.
    """

    #: losses this trainer produces (shard_map out_specs need the static set)
    loss_keys: tuple[str, ...] = ("attractive", "repulsive", "coward", "noise")
    use_ec_loss: bool = False

    def __init__(
        self,
        mesh: Mesh,
        *,
        model: nn.Module | None = None,
        q_min: float = 0.01,
        max_n_objects: int = 1024,
        loss_weights: dict[str, float] | None = None,
        optimizer: optax.GradientTransformation | None = None,
        axis_name: str = "graph",
        halo_impl: str = "a2a",
        ring_max_dist: int = 1,
    ):
        self.mesh = mesh
        inner = model if model is not None else self._default_model()
        self.model = ShardedTCN(
            model=inner, axis_name=axis_name,
            halo_impl=halo_impl, ring_max_dist=ring_max_dist,
        )
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

    @staticmethod
    def _default_model() -> nn.Module:
        return GraphTCNForMLGCPipeline(h_dim=8, e_dim=8, h_outdim=4, hidden_dim=40)

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, sg: ShardedGraph) -> None:
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
    @staticmethod
    def _local_cd(cd_blk: ShardedCondensationData) -> ShardedCondensationData:
        return ShardedCondensationData(
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

    def _cd_specs(self, spec_s, spec_r) -> ShardedCondensationData:
        return ShardedCondensationData(
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

    def _shard_losses(
        self,
        out: dict[str, jax.Array | None],
        sg_l,
        cd_l: ShardedCondensationData,
    ) -> dict[str, jax.Array]:
        losses = sharded_condensation_loss(
            out["B"],
            out["H"],
            cd_l,
            q_min=self.q_min,
            max_n_objects=self.max_n_objects,
            axis_name=self.axis_name,
        )
        if self.use_ec_loss:
            losses["edge"] = sharded_edge_bce(
                out["W"], sg_l.y, sg_l.edge_mask, self.axis_name
            )
        return losses

    def _build_step(self, sg: ShardedGraph) -> Callable:
        from jax import shard_map

        spec_s, spec_r = P(self.axis_name), P()
        n_local = sg.n_local
        cd_specs = self._cd_specs(spec_s, spec_r)
        loss_keys = list(self.loss_keys) + (["edge"] if self.use_ec_loss else [])

        def loss_fn(params, sg_in, cd_in):
            def body(params, sg_blk, cd_blk):
                sg_l = jax.tree.map(lambda v: v[0], sg_blk)
                cd_l = self._local_cd(cd_blk)
                out = self.model.apply({"params": params}, sg_l, n_local)
                losses = self._shard_losses(out, sg_l, cd_l)
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

    def training_step(
        self, sg: ShardedGraph, cd: ShardedCondensationData
    ) -> dict[str, Any]:
        if self._step is None:
            self._step = self._build_step(sg)
        self.params, self.opt_state, losses = self._step(
            self.params, self.opt_state, sg, cd
        )
        return {k: float(v) for k, v in losses.items()}

    #: output keys forward() returns, in order
    forward_keys: tuple[str, ...] = ("H", "B")

    def forward(self, sg: ShardedGraph):
        """Per-shard forward: tuple of ``forward_keys`` outputs, each with a
        leading shard axis (``H [P, N_loc, D]``, ``B [P, N_loc]``, ...)."""
        from jax import shard_map

        spec_s = P(self.axis_name)
        n_local = sg.n_local
        keys = self.forward_keys

        def body(params, sg_blk):
            sg_l = jax.tree.map(lambda v: v[0], sg_blk)
            out = self.model.apply({"params": params}, sg_l, n_local)
            return tuple(out[k][None] for k in keys)

        return jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), jax.tree.map(lambda _: spec_s, sg)),
                out_specs=tuple(spec_s for _ in keys),
            )
        )(self.params, sg)


class ShardedGraphTCNTrainer(ShardedTCTrainer):
    """Train the full GraphTCN sharded: condensation + edge-classification
    losses, both globally reduced over the graph axis (the multi-chip analog
    of ``TCModule`` with ``GraphTCN``, reference ``training/tc.py`` +
    ``tcn.py:311-386``)."""

    use_ec_loss = True
    forward_keys = ("H", "B", "W", "ec_edge_mask")

    def __init__(self, mesh: Mesh, *, model: nn.Module | None = None, **kwargs):
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
        super().__init__(mesh, model=model, **kwargs)

    @staticmethod
    def _default_model() -> nn.Module:
        return GraphTCN()
