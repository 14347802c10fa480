"""Two-level parallelism: a batch of events over the ``data`` mesh axis,
each event sharded over the ``graph`` mesh axis.

The reference's only scale-out is Lightning DDP (one whole event per GPU).
On a TPU pod slice, the natural layout is a 2-D mesh: full-detector events
too big for one chip shard over ``graph`` (halo exchange rides intra-slice
ICI), while independent events pipeline over ``data``. Gradients reduce over
both axes — XLA inserts the collectives from the ``pmean``/``psum`` in the
loss and the shard_map transpose.

Usage::

    mesh = make_data_graph_mesh(n_data=2, n_graph=4)
    sgs = stack_sharded([partition_event(g, 4, sort_edges=True) for g in events])
    cds = stack_sharded([partition_condensation(g, sg_i, max_n_objects=K) ...])
    trainer = DataGraphTCNTrainer(mesh, model=GraphTCN(...))
    trainer.init(rng, sgs)
    losses = trainer.training_step(sgs, cds)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.parallel.halo import ShardedGraph
from gnn_tracking_tpu.models.track_condensation_networks import GraphTCN
from gnn_tracking_tpu.parallel.sharded_model import (
    ShardedTCN,
    sharded_edge_bce,
)
from gnn_tracking_tpu.parallel.sharded_tc import (
    ShardedCondensationData,
    sharded_condensation_loss,
)


def make_data_graph_mesh(
    n_data: int, n_graph: int, *, devices=None
) -> Mesh:
    """A 2-D ``(data, graph)`` mesh. Lay the ``graph`` axis innermost so an
    event's halo exchange stays between neighboring devices (ICI), while
    the ``data`` axis only carries the gradient all-reduce."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_graph
    assert len(devices) >= need, (len(devices), need)
    grid = np.asarray(devices[:need]).reshape(n_data, n_graph)
    return Mesh(grid, ("data", "graph"))


def sharded_buckets(graphs: list, n_shards: int, **partition_kwargs) -> dict:
    """Common ``pad_to`` buckets so every event in ``graphs`` partitions to
    identical per-shard shapes (probe-partitions each event host-side)."""
    from gnn_tracking_tpu.parallel.halo import partition_event

    sizes = {"n_local": 0, "e_local": 0, "halo": 0, "halo_pair": 0}
    for g in graphs:
        sg = partition_event(g, n_shards, **partition_kwargs)
        sizes["n_local"] = max(sizes["n_local"], sg.x.shape[1])
        sizes["e_local"] = max(sizes["e_local"], sg.edge_index.shape[2])
        sizes["halo"] = max(sizes["halo"], sg.halo_mask.shape[1])
        sizes["halo_pair"] = max(sizes["halo_pair"], sg.send_local.shape[2])
    return sizes


def stack_sharded(items: list[Any]) -> Any:
    """Stack per-event pytrees (ShardedGraph / ShardedCondensationData) on a
    new leading ``data`` axis. All events must share padded shapes — use a
    common bucket (same hit/edge padding) upstream."""
    shapes = [jax.tree_util.tree_map(lambda v: v.shape, i) for i in items]
    assert all(s == shapes[0] for s in shapes[1:]), (
        "stack_sharded requires equal padded shapes across events; "
        "pad events to a common bucket before partitioning"
    )
    return jax.tree_util.tree_map(lambda *vs: jnp.stack(vs), *items)


class DataGraphTCNTrainer:
    """Full GraphTCN training over a ``(data, graph)`` mesh: per-event
    condensation + edge losses reduce over ``graph``; the batch averages
    over ``data``."""

    def __init__(
        self,
        mesh: Mesh,
        *,
        model=None,  # single-device TCN module; wrapped in ShardedTCN
        q_min: float = 0.01,
        max_n_objects: int = 1024,
        loss_weights: dict[str, float] | None = None,
        optimizer: optax.GradientTransformation | None = None,
        precision: str = "f32",
    ):
        assert mesh.axis_names == ("data", "graph"), mesh.axis_names
        if precision not in ("f32", "bf16"):
            msg = f"precision must be 'f32' or 'bf16', got {precision!r}"
            raise ValueError(msg)
        #: "bf16": model forward/backward in bfloat16 (params kept f32,
        #: cast at apply time — standard mixed precision; losses in f32)
        self.precision = precision
        self.mesh = mesh
        inner = model if model is not None else GraphTCN()
        self.model = ShardedTCN(model=inner, axis_name="graph")
        self.q_min = q_min
        self.max_n_objects = max_n_objects
        self.loss_weights = loss_weights or {
            "attractive": 1.0,
            "repulsive": 1.0,
            "coward": 0.0,
            "noise": 0.0,
            "edge": 1.0,
        }
        self.tx = optimizer or optax.adam(1e-3)
        self.params = None
        self.opt_state = None
        self._step: Callable | None = None

    # ------------------------------------------------------------------
    def _cd_specs(self):
        s2, s1, r = P("data", "graph"), P("data"), P("data")
        return ShardedCondensationData(
            obj_col=s2,
            object_mask=s2,
            node_mask=s2,
            is_noise=s2,
            global_index=s2,
            obj_valid=s1,
            n_objects=r,
            n_hits=r,
            n_hits_oi=r,
        )

    @staticmethod
    def _slice_local(sg_blk: ShardedGraph) -> ShardedGraph:
        # [1, 1, ...] block -> per-(event, shard) view
        return jax.tree_util.tree_map(lambda v: v[0][0], sg_blk)

    @staticmethod
    def _slice_cd(cd_blk: ShardedCondensationData) -> ShardedCondensationData:
        return ShardedCondensationData(
            obj_col=cd_blk.obj_col[0][0],
            object_mask=cd_blk.object_mask[0][0],
            node_mask=cd_blk.node_mask[0][0],
            is_noise=cd_blk.is_noise[0][0],
            global_index=cd_blk.global_index[0][0],
            obj_valid=cd_blk.obj_valid[0],
            n_objects=cd_blk.n_objects[0],
            n_hits=cd_blk.n_hits[0],
            n_hits_oi=cd_blk.n_hits_oi[0],
        )

    def init(self, rng: jax.Array, sgs: ShardedGraph) -> None:
        from jax import shard_map

        spec_sg = jax.tree_util.tree_map(lambda _: P("data", "graph"), sgs)
        n_local = sgs.x.shape[2]

        def body(rng, sg_blk):
            sg_l = self._slice_local(sg_blk)
            return self.model.init(rng, sg_l, n_local)

        params = jax.jit(
            shard_map(
                body, mesh=self.mesh, in_specs=(P(), spec_sg), out_specs=P()
            )
        )(rng, sgs)
        self.params = params["params"] if "params" in params else params
        self.opt_state = self.tx.init(self.params)

    # ------------------------------------------------------------------
    def _build_step_single(self, sgs: ShardedGraph) -> Callable:
        """1x1-mesh fast path: no shard_map, no halo exchange, identity
        collectives. Battery #26 (full-detector, 267k hits / 2.1M edges):
        the shard_map + halo machinery cost ~1.4 s/step with nothing to
        exchange — this path runs the same losses with axis_name=None on
        the plain EventGraph view."""
        from gnn_tracking_tpu.parallel.sharded_model import shard_as_eventgraph

        n_local = sgs.x.shape[2]
        loss_keys = ["attractive", "repulsive", "coward", "noise", "edge"]

        def loss_fn(params, sg_in, cd_in):
            sg_l = self._slice_local(sg_in)
            cd_l = self._slice_cd(cd_in)
            if self.precision == "bf16":

                def _cast(v):
                    if hasattr(v, "dtype") and v.dtype == jnp.float32:
                        return v.astype(jnp.bfloat16)
                    return v

                params = jax.tree.map(_cast, params)
                sg_l = jax.tree.map(_cast, sg_l)
            data = shard_as_eventgraph(sg_l)
            # inner module directly (params stay nested under model/ for
            # checkpoint compatibility with the sharded path)
            out = self.model.model.apply({"params": params["model"]}, data)
            h, beta, w = (
                out["H"].astype(jnp.float32),
                out["B"].astype(jnp.float32),
                out["W"].astype(jnp.float32),
            )
            losses = sharded_condensation_loss(
                beta, h, cd_l, q_min=self.q_min,
                max_n_objects=self.max_n_objects, axis_name=None,
            )
            losses["edge"] = sharded_edge_bce(
                w, sg_l.y, sg_l.edge_mask, None
            )
            total = sum(
                self.loss_weights.get(k, 0.0) * v for k, v in losses.items()
            )
            return total, {k: losses[k] for k in loss_keys}

        def step(params, opt_state, sg_in, cd_in):
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, sg_in, cd_in
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses["total"] = total
            return params, opt_state, losses

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_step(self, sgs: ShardedGraph) -> Callable:
        if self.mesh.devices.size == 1:
            return self._build_step_single(sgs)
        return self._build_step_sharded(sgs)

    def _build_step_sharded(self, sgs: ShardedGraph) -> Callable:
        from jax import shard_map

        spec_sg = jax.tree_util.tree_map(lambda _: P("data", "graph"), sgs)
        cd_specs = self._cd_specs()
        n_local = sgs.x.shape[2]
        loss_keys = ["attractive", "repulsive", "coward", "noise", "edge"]

        def loss_fn(params, sg_in, cd_in):
            def body(params, sg_blk, cd_blk):
                sg_l = self._slice_local(sg_blk)
                cd_l = self._slice_cd(cd_blk)
                if self.precision == "bf16":

                    def _cast(v):
                        if hasattr(v, "dtype") and v.dtype == jnp.float32:
                            return v.astype(jnp.bfloat16)
                        return v

                    params = jax.tree.map(_cast, params)
                    sg_l = jax.tree.map(_cast, sg_l)
                out = self.model.apply({"params": params}, sg_l, n_local)
                h, beta, w = (
                    out["H"].astype(jnp.float32),
                    out["B"].astype(jnp.float32),
                    out["W"].astype(jnp.float32),
                )
                losses = sharded_condensation_loss(
                    beta,
                    h,
                    cd_l,
                    q_min=self.q_min,
                    max_n_objects=self.max_n_objects,
                    axis_name="graph",
                )
                losses["edge"] = sharded_edge_bce(w, sg_l.y, sg_l.edge_mask, "graph")
                total = sum(
                    self.loss_weights.get(k, 0.0) * v for k, v in losses.items()
                )
                # batch average over events
                total = jax.lax.pmean(total, "data")
                losses = {k: jax.lax.pmean(v, "data") for k, v in losses.items()}
                return total, losses

            return shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    jax.tree_util.tree_map(lambda _: P(), self.params),
                    spec_sg,
                    cd_specs,
                ),
                out_specs=(P(), {k: P() for k in loss_keys}),
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
        self, sgs: ShardedGraph, cds: ShardedCondensationData
    ) -> dict[str, float]:
        if self._step is None:
            self._step = self._build_step(sgs)
        self.params, self.opt_state, losses = self._step(
            self.params, self.opt_state, sgs, cds
        )
        return {k: float(v) for k, v in jax.device_get(losses).items()}

    def forward(self, sgs: ShardedGraph):
        """Per-event per-shard forward: ``(h [S,P,N_loc,D], beta [S,P,N_loc],
        w [S,P,E_loc], ec_edge_mask [S,P,E_loc])`` — unpartition each event
        with ``halo.unpartition_nodes``/``unpartition_edges``."""
        from jax import shard_map

        spec_sg = jax.tree_util.tree_map(lambda _: P("data", "graph"), sgs)
        n_local = sgs.x.shape[2]
        out_spec = P("data", "graph")

        def body(params, sg_blk):
            sg_l = self._slice_local(sg_blk)
            out = self.model.apply({"params": params}, sg_l, n_local)
            return tuple(
                out[k][None, None] for k in ("H", "B", "W", "ec_edge_mask")
            )

        return jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), spec_sg),
                out_specs=(out_spec, out_spec, out_spec, out_spec),
            )
        )(self.params, sgs)
