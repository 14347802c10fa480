"""Data-parallel training over a device mesh.

Events are padded to common bucket shapes, stacked on a leading axis, and
sharded over the mesh's ``data`` axis; the model is vmapped over events and
parameters stay replicated. Under ``jit`` with these shardings XLA inserts
the gradient ``psum`` (riding ICI) automatically — no hand-written
collectives, per the standard JAX SPMD recipe. This replaces the reference's
Lightning-DDP/NCCL delegation (SURVEY §2.10).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.parallel.mesh import data_sharding, replicated


def stack_graphs(graphs: list[EventGraph]) -> EventGraph:
    """Stack equally-padded graphs along a new leading (event) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def make_dp_train_step(module, mesh) -> Callable:
    """Build a jitted sharded train step for a `TrackingModule`.

    The returned ``step(params, opt_state, batch, rng)`` consumes a stacked
    batch (leading axis = events, sharded over ``data``) and returns
    ``(params, opt_state, metrics)`` with replicated params and
    batch-averaged metrics.
    """
    repl = replicated(mesh)
    shard = data_sharding(mesh)

    def step(params, opt_state, batch: EventGraph, rng):
        n_events = batch.x.shape[0]
        rngs = jax.random.split(rng, n_events)

        def loss_fn(p):
            def per_event(graph, r):
                out, pdata = module.full_model.apply(
                    {"params": p}, graph, rngs=module._apply_rngs(r)
                )
                loss, metrics = module.get_losses(out, pdata, r)
                return loss, metrics

            losses, metrics = jax.vmap(per_event)(batch, rngs)
            mean_metrics = jax.tree.map(lambda v: jnp.mean(v.astype(jnp.float32)), metrics)
            return jnp.mean(losses), mean_metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = module.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = loss
        return params, opt_state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, repl, shard, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_dp_eval_step(module, mesh) -> Callable:
    """Sharded forward + loss evaluation over a stacked batch."""
    repl = replicated(mesh)
    shard = data_sharding(mesh)

    def step(params, batch: EventGraph, rng):
        n_events = batch.x.shape[0]
        rngs = jax.random.split(rng, n_events)

        def per_event(graph, r):
            out, pdata = module.full_model.apply(
                {"params": params}, graph, rngs=module._apply_rngs(r)
            )
            loss, metrics = module.get_losses(out, pdata, r)
            return loss, metrics, out

        losses, metrics, outs = jax.vmap(per_event)(batch, rngs)
        metrics = jax.tree.map(lambda v: jnp.mean(v.astype(jnp.float32)), metrics)
        metrics["total"] = jnp.mean(losses)
        return metrics, outs

    return jax.jit(step, in_shardings=(repl, shard, repl))


class DPTrainer:
    """Data-parallel fit loop reusing `TrackingModule` semantics.

    Consumes per-event graphs from a `GraphLoader`, groups them into
    device-count-sized stacked batches, shards them over the mesh's ``data``
    axis, and steps. All events in a stack must share a padding bucket (use a
    single-bucket `PaddingConfig` or sort your stream).
    """

    def __init__(self, module, mesh):
        self.module = module
        self.mesh = mesh
        self._step = make_dp_train_step(module, mesh)

    @property
    def events_per_step(self) -> int:
        return self.mesh.shape["data"]

    def _stacked_batches(self, loader):
        from gnn_tracking_tpu.parallel.mesh import shard_batch

        group: list[EventGraph] = []
        for g in loader:
            group.append(g)
            if len(group) == self.events_per_step:
                yield shard_batch(stack_graphs(group), self.mesh)
                group = []

    def fit_steps(self, batches, n_steps: int | None = None) -> dict[str, Any]:
        """Step over pre-stacked (and optionally pre-sharded) batches."""
        metrics = {}
        for i, batch in enumerate(batches):
            if n_steps is not None and i >= n_steps:
                break
            self.module.params, self.module.opt_state, metrics = self._step(
                self.module.params,
                self.module.opt_state,
                batch,
                self.module._next_rng(),
            )
            self.module.step += 1
        return {k: float(v) for k, v in metrics.items()}

    def fit(self, datamodule, *, max_epochs: int = 1) -> dict[str, Any]:
        """Epoch loop over a `TrackingDataModule`."""
        datamodule.setup("fit")
        metrics: dict[str, Any] = {}
        for _epoch in range(max_epochs):
            loader = datamodule.train_dataloader()
            first = next(iter(loader))
            self.module.setup_params(first)
            metrics = self.fit_steps(self._stacked_batches(datamodule.train_dataloader()))
        return metrics
