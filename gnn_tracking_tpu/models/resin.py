"""Stacked interaction networks with residual connections.

Capability parity: reference ``models/resin.py``. Three skip schemes
(``skip1``, ``skip2``, ``skip_top``) with the sqrt-convex combination
``x = sqrt(alpha)*residue + sqrt(1-alpha)*delta`` (reference ``resin.py:17-42``)
and optional collection of per-layer edge embeddings for the EC head.

Note: the reference's ``Skip2ResidualNetwork`` iterates ``pairwise(range(L))``
(reference ``resin.py:157``), which overlaps blocks for L > 2 and disagrees
with its own ``concat_edge_embeddings_length`` formula; by default we
implement the documented non-overlapping two-layer blocks, which coincide
for L == 2. Set ``compat_overlap=True`` to reproduce the reference's
overlapping-block behavior bit-for-bit (layers shared between consecutive
blocks, L-1 blocks, L collected edge embeddings) — needed to reproduce a
reference skip2 checkpoint with L > 2.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tracking_tpu.models.interaction_network import InteractionNetwork


class MaskedBatchNorm(nn.Module):
    """Batch normalization over valid (unmasked) rows only.

    TPU-native replacement for the reference's ``nn.BatchNorm1d`` in
    ``Skip2ResidualNetwork`` (``resin.py:143-151``): on padded graphs, batch
    statistics must exclude padding or they are diluted.

    Running averages live in the ``batch_stats`` collection and follow torch's
    train/eval semantics by *mutability convention* (no ``train`` flag has to
    thread through every model signature):

    * ``apply(..., mutable=["batch_stats"])`` — training: normalize with
      batch statistics, update the running averages (torch momentum 0.1,
      unbiased batch variance for the running update);
    * ``apply({"params": p, "batch_stats": bs}, ...)`` — eval: normalize
      with the stored running averages;
    * ``apply({"params": p}, ...)`` (no collection provided) — stateless
      fallback: per-call batch statistics, nothing stored.
    """

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch BatchNorm1d default

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        if mask is None:
            mask = jnp.ones(x.shape[0], dtype=bool)
        feat = x.shape[-1]
        mutable = self.is_mutable_collection("batch_stats")
        has_ra = self.has_variable("batch_stats", "mean")
        if has_ra and not mutable:
            mean = self.get_variable("batch_stats", "mean")[None].astype(x.dtype)
            var = self.get_variable("batch_stats", "var")[None].astype(x.dtype)
        else:
            w = mask.astype(x.dtype)[:, None]
            n = jnp.maximum(w.sum(), 1.0)
            mean = jnp.sum(x * w, axis=0, keepdims=True) / n
            var = jnp.sum(w * (x - mean) ** 2, axis=0, keepdims=True) / n
            if mutable:
                ra_mean = self.variable(
                    "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
                )
                ra_var = self.variable(
                    "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
                )
                if not self.is_initializing():
                    m = self.momentum
                    unbiased = var[0] * n / jnp.maximum(n - 1.0, 1.0)
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean[0].astype(
                        jnp.float32
                    )
                    ra_var.value = (1 - m) * ra_var.value + m * unbiased.astype(
                        jnp.float32
                    )
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[:, None], y, x)


def sqconvex_combination(
    *, delta: jax.Array, residue: jax.Array | None, alpha_residue: float
) -> jax.Array:
    """``sqrt(alpha)*residue + sqrt(1-alpha)*delta`` (reference resin.py:17-42)."""
    if residue is None or math.isclose(alpha_residue, 0.0):
        return delta
    assert 0 <= alpha_residue <= 1
    return math.sqrt(alpha_residue) * residue + math.sqrt(1 - alpha_residue) * delta


class ResIN(nn.Module):
    """Stack of identical interaction networks with residual connections
    (reference ``resin.py:226-295`` plus the three ResidualNetwork subclasses).

    Returns (node embedding, last edge embedding, list of edge embeddings
    from all levels — including the input — or None).
    """

    node_dim: int
    edge_dim: int
    object_hidden_dim: int | None = 40
    relational_hidden_dim: int | None = 40
    alpha: float = 0.5
    n_layers: int = 1
    residual_type: str = "skip1"
    collect_hidden_edge_embeds: bool = True
    #: for skip_top: index of the layer whose input receives the residual
    connect_to: int = 1
    #: for skip2: add (masked) batch norm
    add_bn: bool = False
    #: for skip2: reproduce the reference's overlapping ``pairwise`` blocks
    #: (reference ``resin.py:157``) — L-1 blocks sharing layers between
    #: consecutive blocks — instead of the documented non-overlapping ones
    compat_overlap: bool = False
    #: promise that edge_index[1] is non-decreasing
    sorted_edges: bool = False
    #: aggregation implementation: "xla" or "pallas_sorted"
    segment_impl: str = "xla"
    #: split the relational MLP's first linear into node-level projections
    split_relational: bool = False
    #: slab-layout statics + compute dtype for segment_impl="fused"
    fused_window: int = 1024
    fused_block: int = 512
    fused_dtype: str = "bfloat16"
    #: fused_stack_t: save gathered endpoints in fwd, skip the backward
    #: gather recompute — measured slower on hardware (see
    #: InteractionNetwork.fused_save_acts); off by default
    fused_save_acts: bool = False
    #: fused_stack_t: run the inter-layer edge relu INSIDE the kernel
    #: (zero HBM cost) instead of as an XLA elementwise pass on the
    #: transposed stream (~0.1 ms per boundary). Off by default: the
    #: in-kernel-relu backward crashes the axon remote-compile helper
    #: (r3 battery stackfix); the math is identical either way.
    fused_kernel_relu: bool = False
    #: static boundary from ``partition_event(halo_edges_last=True)``
    #: (``ShardedGraph.e_split``): under an exchange hook, edges before it
    #: provably never read halo rows, so each layer computes their messages
    #: concurrently with the halo collective (compute/comm overlap). 0 = off.
    halo_edge_split: int = 0
    #: rematerialize each interaction layer in the backward pass
    #: (``jax.checkpoint``): activation memory drops from O(L·E·H) to
    #: O(E·H), letting bigger events/batches fit per chip at ~1/3 extra
    #: forward FLOPs
    remat: bool = False

    @property
    def concat_edge_embeddings_length(self) -> int:
        """Width of the concatenated per-level edge embeddings
        (reference ``resin.py:284-290``)."""
        if self.residual_type == "skip2":
            if self.compat_overlap:
                # input + (L-1) overlapping blocks (reference resin.py:157;
                # its :284 formula disagrees with its own forward for L > 2)
                return self.edge_dim * max(self.n_layers, 2)
            return self.edge_dim * (self.n_layers // 2 + 1)
        return self.edge_dim * (self.n_layers + 1)

    def _make_layer(self, i: int) -> InteractionNetwork:
        cls = nn.remat(InteractionNetwork) if self.remat else InteractionNetwork
        return cls(
            node_outdim=self.node_dim,
            edge_outdim=self.edge_dim,
            node_hidden_dim=self.object_hidden_dim,
            edge_hidden_dim=self.relational_hidden_dim,
            sorted_edges=self.sorted_edges,
            segment_impl=self.segment_impl,
            split_relational=self.split_relational,
            fused_window=self.fused_window,
            fused_block=self.fused_block,
            fused_dtype=self.fused_dtype,
            fused_save_acts=self.fused_save_acts,
            name=f"layer_{i}",
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_index: jax.Array,
        edge_attr: jax.Array,
        edge_mask: jax.Array | None = None,
        node_mask: jax.Array | None = None,
        extras: dict | None = None,
        exchange: "Callable[[jax.Array], jax.Array] | None" = None,
    ) -> tuple[jax.Array, jax.Array, list[jax.Array] | None]:
        """``exchange`` is the graph-parallel hook: it maps local node rows
        ``[N_loc, F]`` to the extended array ``[N_loc + halo, F]`` that
        ``edge_index`` sources reference (``parallel/halo.gather_halo_a2a``
        under ``shard_map``). ``None`` = single device: identity, and the
        post-layer truncation back to ``x.shape[0]`` rows is a no-op. This
        single hook is what lets every ResIN/TCN config train sharded from
        the one module tree (no parallel fork of the model)."""
        collect = self.collect_hidden_edge_embeds
        edge_attrs: list[jax.Array] | None = [edge_attr] if collect else None
        n_local = x.shape[0]
        ex = exchange if exchange is not None else (lambda v: v)
        split = self.halo_edge_split if exchange is not None else 0
        layer_kw = {"n_local": n_local, "halo_split": split or None}

        stack = self.segment_impl == "fused_stack_t"
        if stack:
            # cross-layer-fused stack: the edge stream rides TRANSPOSED
            # ([pad8(F), E_pad]) through every layer — one transpose in, one
            # per collected embedding out, zero relayouts between layers.
            # Inter-layer edge relus run inside the kernel (relu_edge).
            assert not self.add_bn, "fused_stack_t does not support add_bn"
            assert not self.remat, (
                "fused_stack_t threads a static relu_edge call flag that "
                "nn.remat cannot treat as static; use remat=False"
            )
            fe_true = edge_attr.shape[1]
            fe8 = fe_true + (-fe_true) % 8
            edge_attr = jnp.pad(edge_attr.T, ((0, fe8 - fe_true), (0, 0)))
            extras = dict(extras or {})
            extras["stack_fe"] = fe_true

        def run_layer(layer, x_in, e_in, relu_in, **kw):
            """Pre-layer activation: relu on x stays XLA (node side is
            small); the edge relu is deferred into the kernel in stack
            mode so it never touches HBM."""
            xi = nn.relu(x_in) if relu_in else x_in
            if stack:
                kernel_relu = relu_in and self.fused_kernel_relu
                if relu_in and not kernel_relu:
                    e_in = nn.relu(e_in)  # elementwise, layout-free
                return layer(
                    ex(xi), edge_index, e_in, edge_mask, extras,
                    relu_edge=kernel_relu, **kw,
                )
            ei = nn.relu(e_in) if relu_in else e_in
            return layer(ex(xi), edge_index, ei, edge_mask, extras, **kw)

        if self.residual_type == "skip1":
            for i in range(self.n_layers):
                delta_x, edge_attr = run_layer(
                    self._make_layer(i), x, edge_attr, i > 0, **layer_kw
                )
                x = sqconvex_combination(
                    delta=delta_x[:n_local], residue=x, alpha_residue=self.alpha
                )
                if collect:
                    edge_attrs.append(edge_attr)
        elif self.residual_type == "skip2":
            if self.n_layers % 2 != 0:
                msg = "skip2 requires an even number of layers"
                raise ValueError(msg)
            if self.compat_overlap:
                # reference-compat: overlapping pairwise blocks sharing
                # layer/bn modules between consecutive blocks
                # (reference resin.py:157)
                layers = [self._make_layer(i) for i in range(self.n_layers)]
                if self.add_bn:
                    node_bns = [
                        MaskedBatchNorm(name=f"node_bn_{i}")
                        for i in range(self.n_layers)
                    ]
                    edge_bns = [
                        MaskedBatchNorm(name=f"edge_bn_{i}")
                        for i in range(self.n_layers)
                    ]
                blocks = [
                    (i, i + 1) for i in range(self.n_layers - 1)
                ]
            else:
                blocks = [
                    (2 * b, 2 * b + 1) for b in range(self.n_layers // 2)
                ]
            for i0, i1 in blocks:
                if self.compat_overlap:
                    x_in, e_in = x, edge_attr
                    if self.add_bn:
                        x_in = node_bns[i0](x_in, node_mask)
                        e_in = edge_bns[i0](e_in, edge_mask)
                    hidden_x, hidden_e = run_layer(
                        layers[i0], x_in, e_in, i0 > 0, **layer_kw
                    )
                    hidden_x = hidden_x[:n_local]
                    if self.add_bn:
                        hidden_x = node_bns[i1](hidden_x, node_mask)
                        hidden_e = edge_bns[i1](hidden_e, edge_mask)
                    delta_x, edge_attr = run_layer(
                        layers[i1], hidden_x, hidden_e, True, **layer_kw
                    )
                    x = sqconvex_combination(
                        delta=delta_x[:n_local], residue=x,
                        alpha_residue=self.alpha,
                    )
                    if collect:
                        edge_attrs.append(edge_attr)
                    continue
                x_in, e_in = x, edge_attr
                if self.add_bn:
                    x_in = MaskedBatchNorm(name=f"node_bn_{i0}")(x_in, node_mask)
                    e_in = MaskedBatchNorm(name=f"edge_bn_{i0}")(e_in, edge_mask)
                hidden_x, hidden_e = run_layer(
                    self._make_layer(i0), x_in, e_in, i0 > 0, **layer_kw
                )
                hidden_x = hidden_x[:n_local]
                if self.add_bn:
                    hidden_x = MaskedBatchNorm(name=f"node_bn_{i1}")(hidden_x, node_mask)
                    hidden_e = MaskedBatchNorm(name=f"edge_bn_{i1}")(hidden_e, edge_mask)
                delta_x, edge_attr = run_layer(
                    self._make_layer(i1), hidden_x, hidden_e, True, **layer_kw
                )
                x = sqconvex_combination(
                    delta=delta_x[:n_local], residue=x, alpha_residue=self.alpha
                )
                if collect:
                    edge_attrs.append(edge_attr)
        elif self.residual_type == "skip_top":
            assert self.connect_to <= self.n_layers
            x_residue = None
            for i in range(self.n_layers):
                if i == self.connect_to:
                    x_residue = x
                delta_x, edge_attr = run_layer(
                    self._make_layer(i), x, edge_attr, i > 0, **layer_kw
                )
                if x_residue is not None:
                    x = sqconvex_combination(
                        delta=delta_x[:n_local], residue=x_residue, alpha_residue=self.alpha
                    )
                else:
                    x = delta_x[:n_local]
                if collect:
                    edge_attrs.append(edge_attr)
        else:
            msg = f"Unknown residual type: {self.residual_type}"
            raise ValueError(msg)

        if stack:
            # back to natural layout: one transpose for the final edge
            # embedding + one per collected intermediate (entry [0] was
            # stored natural before the stack transpose)
            fo = self.edge_dim
            edge_attr = edge_attr[:fo].T
            if collect:
                edge_attrs = [edge_attrs[0]] + [t[:fo].T for t in edge_attrs[1:]]
        return x, edge_attr, edge_attrs
