"""Training task modules: object condensation (TC), edge classification (EC),
metric learning (ML).

Capability parity: reference ``training/base.py`` (``TrackingModule``),
``training/tc.py`` (``TCModule``), ``training/ec.py`` (``ECModule``),
``training/ml.py`` (``MLModule``). Lightning's imperative step methods become
pure jitted step functions over (params, opt_state, graph, rng); optimizers
are optax transforms; metric uncertainties accumulate on the host.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

import optax
from flax import linen as nn

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.metrics.binary_classification import (
    get_maximized_bcs,
    get_roc_auc_scores,
)
from gnn_tracking_tpu.utils.dictionaries import add_key_suffix, to_floats
from gnn_tracking_tpu.utils.log import get_logger
from gnn_tracking_tpu.utils.nomenclature import denote_pt


class _PreprocModel(nn.Module):
    """Compose an optional data-preprocessing module (e.g.
    ``MLGraphConstruction``) with the main model so parameters live in one
    tree (reference ``TrackingModule.forward``, ``training/base.py:96-104``)."""

    model: nn.Module
    preproc: Optional[nn.Module] = None

    def __call__(self, data: EventGraph, **kwargs):
        if self.preproc is not None:
            data = self.preproc(data)
        return self.model(data), data


class TrackingModule:
    """Base training module: model + optional preproc + optax optimizer.

    The jitted ``train_step``/``val_step`` are built per instance; the loss
    function and model are static closure captures, the graph is a bucketed
    pytree, so each shape bucket compiles once.
    """

    #: rng stream names forwarded to ``Module.apply``
    RNG_STREAMS = ("perfect_ec", "dropout")

    def __init__(
        self,
        model: nn.Module,
        *,
        optimizer: optax.GradientTransformation | None = None,
        lr: float = 1e-3,
        preproc: nn.Module | None = None,
        frozen_prefixes: tuple[str, ...] = (),
        rng_seed: int = 42,
        precision: str = "f32",
    ):
        from gnn_tracking_tpu.training.precision import get_policy

        self.model = model
        self.preproc = preproc
        self.policy = get_policy(precision)
        self.full_model = _PreprocModel(model=model, preproc=preproc)
        if optimizer is None:
            optimizer = optax.adam(lr)
        if frozen_prefixes:
            optimizer = _freeze(optimizer, frozen_prefixes)
        self.tx = optimizer
        self.logg = get_logger("TM")
        self.params = None
        self.opt_state = None
        #: non-parameter model state (BatchNorm running averages); empty dict
        #: for stateless models
        self.batch_stats: dict = {}
        self.step = 0
        self._rng = jax.random.PRNGKey(rng_seed)
        self._train_step = None
        self._val_step = None

    # ------------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _apply_rngs(self, rng: jax.Array) -> dict[str, jax.Array]:
        keys = jax.random.split(rng, len(self.RNG_STREAMS))
        return dict(zip(self.RNG_STREAMS, keys))

    def setup_params(self, example: EventGraph) -> None:
        """Initialize parameters and optimizer state from an example graph."""
        if self.params is not None:
            return
        rng = self._next_rng()
        variables = self.full_model.init(
            {"params": rng, **self._apply_rngs(rng)}, example
        )
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

    def _variables(self, params) -> dict:
        v = {"params": params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def forward(self, data: EventGraph) -> dict[str, Any]:
        """Eval-mode forward (BatchNorm uses running averages)."""
        out, _ = self.full_model.apply(
            self._variables(self.params),
            data,
            rngs=self._apply_rngs(self._next_rng()),
        )
        return out

    __call__ = forward

    # -- to be provided by subclasses ----------------------------------
    def get_losses(
        self, out: dict[str, Any], data: EventGraph, rng: jax.Array
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _model_and_losses(self, p, bs, data: EventGraph, rngs, rng, *, train: bool):
        """Forward + loss with the precision policy applied: model compute in
        ``compute_dtype``, loss inputs cast back to ``output_dtype``.

        ``train=True`` applies with ``mutable=["batch_stats"]`` (BatchNorm
        normalizes with batch statistics and returns updated running
        averages); ``train=False`` normalizes with the stored running
        averages — torch train/eval parity without threading a ``train``
        flag through every model (see ``models/resin.py:MaskedBatchNorm``).
        """
        cp = self.policy.cast_to_compute(p)
        cdata = self.policy.cast_to_compute(data)
        variables = {"params": cp}
        if bs:
            variables["batch_stats"] = bs
        if train:
            (out, pdata), new_vars = self.full_model.apply(
                variables, cdata, rngs=rngs, mutable=["batch_stats"]
            )
            new_bs = new_vars.get("batch_stats", bs)
        else:
            out, pdata = self.full_model.apply(variables, cdata, rngs=rngs)
            new_bs = bs
        out = self.policy.cast_to_output(out)
        pdata = self.policy.cast_to_output(pdata)
        return self.get_losses(out, pdata, rng), out, pdata, new_bs

    def _build_train_step(self) -> Callable:
        def step(params, opt_state, batch_stats, data: EventGraph, rng):
            rngs = self._apply_rngs(rng)

            def loss_fn(p):
                (loss, metrics), _, _, new_bs = self._model_and_losses(
                    p, batch_stats, data, rngs, rng, train=True
                )
                return loss, (metrics, new_bs)

            (loss, (metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["total"] = loss
            return params, opt_state, new_bs, metrics

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_val_step(self) -> Callable:
        def step(params, batch_stats, data: EventGraph, rng):
            rngs = self._apply_rngs(rng)
            (loss, metrics), out, pdata, _ = self._model_and_losses(
                params, batch_stats, data, rngs, rng, train=False
            )
            metrics["total"] = loss
            return out, pdata, metrics

        return jax.jit(step)

    def training_step(self, data: EventGraph) -> dict[str, float]:
        """One optimization step; returns train metrics."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        self.params, self.opt_state, self.batch_stats, metrics = self._train_step(
            self.params, self.opt_state, self.batch_stats, data, self._next_rng()
        )
        self.step += 1
        # one batched device->host transfer (per-scalar float() costs a full
        # round trip each — dominant through high-latency device links)
        return to_floats(jax.device_get(metrics))

    def validation_step(self, data: EventGraph, batch_idx: int) -> dict[str, float]:
        if self._val_step is None:
            self._val_step = self._build_val_step()
        out, pdata, metrics = self._val_step(
            self.params, self.batch_stats, data, self._next_rng()
        )
        metrics = to_floats(jax.device_get(metrics))
        metrics |= self.validation_extra(out, pdata, batch_idx)
        return metrics

    # hook for task-specific validation metrics (scanners etc.)
    def validation_extra(
        self, out: dict[str, Any], data: EventGraph, batch_idx: int
    ) -> dict[str, float]:
        return {}

    def on_validation_epoch_end(self) -> dict[str, float]:
        return {}

    def highlight_metric(self, metric: str) -> bool:
        return False


def _freeze(
    tx: optax.GradientTransformation, prefixes: tuple[str, ...]
) -> optax.GradientTransformation:
    """Freeze parameter subtrees by top-level path prefix (the TPU analog of
    the reference's ``freeze()`` of restored submodules,
    ``utils/torch_utils.py:6-29``)."""

    def label(params):
        import flax

        flat = flax.traverse_util.flatten_dict(params)
        labels = {
            k: "frozen"
            if any("/".join(map(str, k)).startswith(p) for p in prefixes)
            else "trainable"
            for k in flat
        }
        return flax.traverse_util.unflatten_dict(labels)

    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, label
    )


class TCModule(TrackingModule):
    """Object-condensation training (reference ``training/tc.py``)."""

    def __init__(self, *, loss_fct, cluster_scanner=None, **kwargs):
        super().__init__(**kwargs)
        self.loss_fct = loss_fct
        self.cluster_scanner = cluster_scanner

    def get_losses(self, out, data: EventGraph, rng):
        losses = self.loss_fct(
            x=out["H"],
            particle_id=data.particle_id,
            beta=out["B"],
            pt=data.pt,
            reconstructable=data.reconstructable,
            eta=data.eta,
            ec_hit_mask=out.get("ec_hit_mask"),
            node_mask=data.node_mask,
            batch=data.batch,
            true_edge_index=data.true_edge_index,
            true_edge_mask=data.true_edge_mask,
            rng=rng,
        )
        metrics = dict(losses.loss_dct)
        metrics |= add_key_suffix(losses.weighted_losses, "_weighted")
        metrics |= dict(losses.extra_metrics)
        return losses.loss, metrics

    def validation_extra(self, out, data, batch_idx):
        if self.cluster_scanner is None:
            return {}
        self.cluster_scanner(data, {k: None if v is None else v for k, v in out.items()}, batch_idx)
        return {}

    def on_validation_epoch_end(self) -> dict[str, float]:
        if self.cluster_scanner is None:
            return {}
        return to_floats(self.cluster_scanner.get_foms())

    def highlight_metric(self, metric: str) -> bool:
        return metric in [
            "attractive",
            "repulsive",
            "trk.lhc_pt0.9",
            "trk.perfect_pt0.9",
            "trk.double_majority_pt0.9",
        ]


class ECModule(TrackingModule):
    """Edge-classification training (reference ``training/ec.py``)."""

    def __init__(self, *, loss_fct, pt_thlds=(0.0, 0.5, 0.9, 1.5), **kwargs):
        super().__init__(**kwargs)
        self.loss_fct = loss_fct
        self.pt_thlds = pt_thlds

    def get_losses(self, out, data: EventGraph, rng):
        loss = self.loss_fct(
            w=out["W"],
            y=data.y.astype(out["W"].dtype),
            pt=data.pt,
            edge_index=data.edge_index,
            edge_mask=data.edge_mask,
        )
        return loss, {}

    def validation_extra(self, out, data, batch_idx):
        metrics: dict[str, float] = {}
        w = out["W"]
        y = data.y
        for pt in self.pt_thlds:
            mask = data.edge_mask
            if pt > 0:
                mask = mask & (
                    (data.pt[data.edge_index[0]] > pt)
                    | (data.pt[data.edge_index[1]] > pt)
                )
            _metrics = get_roc_auc_scores(
                true=y, predicted=w, max_fprs=[None, 0.01, 0.001], mask=mask
            ) | get_maximized_bcs(y=y, output=w, mask=mask)
            metrics |= {denote_pt(k, pt): v for k, v in _metrics.items()}
        return metrics

    def highlight_metric(self, metric: str) -> bool:
        return metric in ["max_mcc_pt0.9", "total", "tpr_eq_tnr_pt0.9"]


class MLModule(TrackingModule):
    """Metric-learning (graph construction) training
    (reference ``training/ml.py``)."""

    def __init__(self, *, loss_fct, gc_scanner=None, **kwargs):
        super().__init__(**kwargs)
        self.loss_fct = loss_fct
        self.gc_scanner = gc_scanner

    def get_losses(self, out, data: EventGraph, rng):
        true_edge_index = data.true_edge_index
        true_edge_mask = data.true_edge_mask
        if true_edge_index.shape[1] == 0:
            # Point-cloud data stores true edges as edge_index
            # (reference training/ml.py:45-48)
            true_edge_index = data.edge_index
            true_edge_mask = data.edge_mask
        losses = self.loss_fct(
            x=out["H"],
            particle_id=data.particle_id,
            batch=data.batch,
            true_edge_index=true_edge_index,
            true_edge_mask=true_edge_mask,
            pt=data.pt,
            eta=data.eta,
            reconstructable=data.reconstructable,
            node_mask=data.node_mask,
        )
        metrics = dict(losses.loss_dct)
        metrics |= add_key_suffix(losses.weighted_losses, "_weighted")
        metrics |= dict(losses.extra_metrics)
        return losses.loss, metrics

    def validation_extra(self, out, data, batch_idx):
        if self.gc_scanner is not None:
            self.gc_scanner(data, batch_idx, latent=out["H"])
        return {}

    def on_validation_epoch_end(self) -> dict[str, float]:
        if self.gc_scanner is None:
            return {}
        return to_floats(self.gc_scanner.get_foms())

    def highlight_metric(self, metric: str) -> bool:
        return metric in [
            "n_edges_frac_segment50_95",
            "total",
            "attractive",
            "repulsive",
            "max_frac_segment50",
        ]
