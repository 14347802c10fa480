"""Interaction network — the core message-passing op.

Capability parity: reference ``models/interaction_network.py``. The PyG
``MessagePassing.propagate`` (native scatter-add) becomes the TPU pattern:
gather endpoints → relational MLP over the [E, ·] batch (MXU) → masked
segment-sum at targets → object MLP. The edge validity mask makes this exact
on padded graphs and implements the reference's dynamic ``edge_subgraph``
cuts as masking.
"""

from __future__ import annotations

import jax
from flax import linen as nn
import jax.numpy as jnp

from gnn_tracking_tpu.models.mlp import MLP
from gnn_tracking_tpu.ops.segment import (
    masked_segment_sum,
    sorted_take,
    take_sorted_by,
)


def _src_take(x, src, extras):
    """x[src] with a sorted-scatter backward.

    Uses the precomputed source-sort auxiliary when the graph carries it
    (``EventGraph.sort_edges_by_target``); otherwise computes the
    permutation in-graph — ``argsort`` is jit-traceable, XLA CSEs the
    identical sort across the layer stack, and the ``indices_are_sorted``
    promise holds because the indices really are sorted at runtime. Either
    way the cotangent rides the sorted segment-sum instead of the serial
    unsorted scatter-add (the EC step's backward bottleneck).
    """
    if extras is not None and "src_perm" in extras:
        return take_sorted_by(x, src, extras["src_perm"], extras["src_sorted"])
    perm = jnp.argsort(src).astype(jnp.int32)
    return take_sorted_by(x, src, perm, src[perm])


class InteractionNetwork(nn.Module):
    """Relational + object model message passing (reference
    ``interaction_network.py:12-103``).

    Message for edge (j → i): ``e' = MLP_R([x_i, x_j, e])``; aggregation:
    sum of messages at target i; update: ``x' = MLP_O([x, agg])``.
    Returns (node embedding, edge embedding).
    """

    node_outdim: int = 3
    edge_outdim: int = 4
    node_hidden_dim: int | None = 40
    edge_hidden_dim: int | None = 40
    aggr: str = "add"
    #: promise that edge_index[1] is non-decreasing (cheaper scatter lowering)
    sorted_edges: bool = False
    #: "xla", "pallas_sorted" (windowed one-hot matmul aggregation + dst
    #: gather; requires sorted_edges, E % 1024 == 0, bounded window spread),
    #: "fused" (single Pallas kernel for gather→relational MLP→segment-add;
    #: requires the slab edge layout from ``ops.pallas.slab_layout`` whose
    #: metadata arrives via the ``extras`` call argument), or "fused_flat"
    #: (same kernel over the variable-blocks-per-slab layout, fill ~0.97 —
    #: needs ``apply_flat_slab_layout`` / ``PaddingConfig(slab_layout="flat")``)
    segment_impl: str = "xla"
    #: slab-layout statics for segment_impl="fused"/"fused_flat"
    fused_window: int = 1024
    fused_block: int = 512
    #: kernel compute dtype for segment_impl="fused"
    fused_dtype: str = "bfloat16"
    #: fused_stack_t only: save the gathered endpoint streams in the
    #: forward kernel so the backward skips the gather recompute
    #: (identical gradients). Measured SLOWER on hardware (r3 battery:
    #: 15.9 vs 11.0 ms fwd+bwd — the backward is pipeline-bound, not
    #: MXU-bound), so off by default; kept for future hardware.
    fused_save_acts: bool = False
    #: compute the relational MLP's first linear as three split matmuls —
    #: the node-side projections run at NODE level ([N,F]@[F,H] instead of
    #: [E,2F]@[2F,H]) and are gathered per edge, skipping the [E, 3F] concat.
    #: Mathematically identical to the fused layer (the three kernel blocks
    #: are the row-split of the concat kernel); cuts first-layer FLOPs by
    #: ~2·(E−N)/3E and the concat's HBM round trip. Parameter tree differs
    #: (relational_{dst,src,edge} + relational_rest instead of
    #: relational_model).
    split_relational: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_index: jax.Array,
        edge_attr: jax.Array,
        edge_mask: jax.Array | None = None,
        extras: dict | None = None,
        *,
        n_local: int | None = None,
        halo_split: int | None = None,
        relu_edge: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        num_nodes = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        if self.segment_impl in (
            "fused", "fused_flat", "fused_flat_t", "fused_stack_t"
        ):
            return self._fused(
                x, edge_index, edge_attr, extras, edge_mask,
                relu_edge=relu_edge,
            )
        assert not relu_edge, "relu_edge is a fused_stack_t-only call option"
        if halo_split is not None and n_local is not None:
            return self._halo_overlap(
                x, edge_index, edge_attr, edge_mask,
                n_local=n_local, halo_split=halo_split,
            )
        if self.segment_impl not in ("xla", "pallas_sorted"):
            msg = (
                f"segment_impl={self.segment_impl!r} unknown; expected "
                "'xla', 'pallas_sorted', 'fused', 'fused_flat', or "
                "'fused_flat_t'"
            )
            raise ValueError(msg)
        use_pallas = self.segment_impl == "pallas_sorted"
        if use_pallas:
            from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_gather

            assert self.sorted_edges, "pallas_sorted requires sorted_edges"

        # x_i = receiving node (target), x_j = sending node (source) —
        # matches reference flow="source_to_target".
        if self.split_relational:
            from gnn_tracking_tpu.models.mlp import TorchLinear

            hidden = self.edge_hidden_dim
            if hidden is None:
                hidden = max(2 * x.shape[-1] + edge_attr.shape[-1], self.edge_outdim)
            p_dst = TorchLinear(hidden, name="relational_dst")(x)
            p_src = TorchLinear(hidden, use_bias=False, name="relational_src")(x)
            p_e = TorchLinear(hidden, use_bias=False, name="relational_edge")(
                edge_attr
            )
            if use_pallas:
                g_dst = sorted_gather(p_dst, dst)
            elif self.sorted_edges:
                # sorted-scatter backward (the EC step is bwd-scatter bound)
                g_dst = sorted_take(p_dst, dst)
            else:
                g_dst = p_dst[dst]
            m1 = nn.relu(g_dst + _src_take(p_src, src, extras) + p_e)
            # remaining layers of the (L=3) relational MLP
            e_tilde = MLP(
                output_size=self.edge_outdim,
                hidden_dim=hidden,
                L=2,
                name="relational_rest",
            )(m1)
        else:
            if use_pallas:
                x_dst = sorted_gather(x, dst)
            elif self.sorted_edges:
                x_dst = sorted_take(x, dst)
            else:
                x_dst = x[dst]
            m = jnp.concatenate([x_dst, _src_take(x, src, extras), edge_attr], axis=1)
            e_tilde = MLP(
                output_size=self.edge_outdim,
                hidden_dim=self.edge_hidden_dim,
                name="relational_model",
            )(m)
        if self.aggr != "add":
            from gnn_tracking_tpu.ops.segment import scatter_edges_to_nodes

            agg = scatter_edges_to_nodes(
                e_tilde, edge_index, num_nodes, edge_mask, aggr=self.aggr
            )
        elif use_pallas:
            from gnn_tracking_tpu.ops.pallas.csr_segment import sorted_segment_sum

            masked = e_tilde
            if edge_mask is not None:
                masked = jnp.where(edge_mask[:, None], e_tilde, 0)
            agg = sorted_segment_sum(masked, dst, num_nodes)
        else:
            agg = masked_segment_sum(
                e_tilde, dst, num_nodes, edge_mask, indices_are_sorted=self.sorted_edges
            )
        x_tilde = MLP(
            output_size=self.node_outdim,
            hidden_dim=self.node_hidden_dim,
            name="object_model",
        )(jnp.concatenate([x, agg], axis=1))
        return x_tilde, e_tilde

    def _halo_overlap(
        self, x, edge_index, edge_attr, edge_mask, *, n_local, halo_split
    ):
        """Compute/communication-overlapped message pass for sharded graphs.

        ``x`` is the exchange-extended array ``concat([x_local, halo])`` and
        edges are laid out ``[local-source block | halo-source block]``
        with the static boundary ``halo_split``
        (``parallel.halo.partition_event(halo_edges_last=True)``). The local
        block's messages read only ``x[:n_local]`` — XLA's simplifier folds
        that slice back to the pre-collective operand, so the latency-hiding
        scheduler can run the halo ppermutes/all-to-all concurrently with
        the local relational MLP; only the (small) halo block waits on the
        wire. Same math as the plain path, block order preserved.
        """
        assert self.aggr == "add", "halo overlap supports add aggregation"
        assert self.segment_impl == "xla", (
            "halo overlap is an XLA-path feature (the fused kernel is "
            "single-device)"
        )
        if self.split_relational:
            msg = "halo_split + split_relational is not implemented"
            raise NotImplementedError(msg)
        num_nodes = x.shape[0]
        x_loc = x[:n_local]
        src, dst = edge_index[0], edge_index[1]
        rel = MLP(
            output_size=self.edge_outdim,
            hidden_dim=self.edge_hidden_dim,
            name="relational_model",
        )
        s_l, d_l = src[:halo_split], dst[:halo_split]
        s_h, d_h = src[halo_split:], dst[halo_split:]
        # local block: every source is provably < n_local
        take_d = sorted_take if self.sorted_edges else (lambda a, i: a[i])
        m_l = jnp.concatenate(
            [take_d(x_loc, d_l), x_loc[s_l], edge_attr[:halo_split]], axis=1
        )
        et_l = rel(m_l)
        # halo block: sources may index the exchanged rows
        m_h = jnp.concatenate(
            [take_d(x_loc, d_h), x[s_h], edge_attr[halo_split:]], axis=1
        )
        et_h = rel(m_h)  # same module instance -> shared parameters
        mask_l = edge_mask[:halo_split] if edge_mask is not None else None
        mask_h = edge_mask[halo_split:] if edge_mask is not None else None
        agg = masked_segment_sum(
            et_l, d_l, num_nodes, mask_l, indices_are_sorted=self.sorted_edges
        ) + masked_segment_sum(
            et_h, d_h, num_nodes, mask_h, indices_are_sorted=self.sorted_edges
        )
        e_tilde = jnp.concatenate([et_l, et_h], axis=0)
        x_tilde = MLP(
            output_size=self.node_outdim,
            hidden_dim=self.node_hidden_dim,
            name="object_model",
        )(jnp.concatenate([x, agg], axis=1))
        return x_tilde, e_tilde

    def _fused(self, x, edge_index, edge_attr, extras, edge_mask=None,
               relu_edge=False):
        """Single-kernel edge pipeline (``ops.pallas.fused_relational``).

        ``segment_impl="fused_stack_t"`` is the cross-layer-stack mode:
        ``edge_attr`` arrives TRANSPOSED (``[pad8(Fe), E_pad]``, the previous
        layer's ``eout_t`` or the stack entry transpose) and ``e_tilde`` is
        returned transposed — the full ResIN stack's edge stream never
        relayouts through HBM between layers. The true edge feature count
        rides statically in ``extras["stack_fe"]``; ``relu_edge`` applies the
        inter-layer activation inside the kernel.

        Parameter tree: one fused first-layer kernel ``relational_w1``
        ([2*Fx+Fe, H], split into per-input blocks for the kernel) instead of
        the XLA path's ``relational_model`` MLP tree — same math, same torch
        init; ``utils.param_convert`` maps between the two layouts.

        A dynamic ``edge_mask`` (e.g. the EC cut in the HC stack) folds into
        the kernel's runtime ``inwin`` stream — masked edges contribute
        nothing to the aggregation, exactly like the XLA path's
        ``masked_segment_sum``. NOTE: the XLA path leaves masked edges'
        ``e_tilde`` values intact (they are only ever consumed under the
        same mask downstream); here they come out zeroed. Everything
        observable through the mask is identical.
        """
        from gnn_tracking_tpu.models.mlp import torch_bias_init, torch_linear_init
        from gnn_tracking_tpu.ops.pallas.fused_relational import (
            fused_relational,
            fused_relational_flat,
        )
        from gnn_tracking_tpu.ops.pallas.fused_relational_t import (
            fused_relational_flat_t,
            fused_relational_layer_tt,
        )

        stack = self.segment_impl == "fused_stack_t"
        flat = stack or self.segment_impl in ("fused_flat", "fused_flat_t")
        assert self.aggr == "add", "fused path supports add aggregation only"
        assert extras is not None and "slab_srcloc" in extras, (
            f"segment_impl={self.segment_impl!r} needs a slab-layout graph "
            "(ops.pallas.slab_layout.apply_slab_layout / apply_flat_slab_layout)"
        )
        if flat:
            assert "slab_block_slab" in extras, (
                "segment_impl='fused_flat' needs the flat slab layout "
                "(ops.pallas.slab_layout.apply_flat_slab_layout or "
                "PaddingConfig(slab_layout='flat'))"
            )
        if stack:
            assert "stack_fe" in extras, (
                "fused_stack_t receives transposed edge features; the caller "
                "(ResIN stack mode) must record the true edge feature count "
                "in extras['stack_fe']"
            )
            fe = extras["stack_fe"]
        else:
            assert not relu_edge, "relu_edge is a fused_stack_t-only option"
            fe = edge_attr.shape[-1]
        fx, fo = x.shape[-1], self.edge_outdim
        fan1 = 2 * fx + fe
        h = self.edge_hidden_dim or max(fan1, fo)
        w1 = self.param("relational_w1", torch_linear_init(), (fan1, h))
        b1 = self.param(
            "relational_b1", lambda k, s: torch_bias_init(k, s, fan_in=fan1), (h,)
        )
        w2 = self.param("relational_w2", torch_linear_init(), (h, h))
        b2 = self.param(
            "relational_b2", lambda k, s: torch_bias_init(k, s, fan_in=h), (h,)
        )
        w3 = self.param("relational_w3", torch_linear_init(), (h, fo))
        b3 = self.param(
            "relational_b3", lambda k, s: torch_bias_init(k, s, fan_in=h), (fo,)
        )
        weights = {
            "w1d": w1[:fx], "w1s": w1[fx : 2 * fx], "w1e": w1[2 * fx :],
            "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3,
        }
        inwin = extras["slab_inwin"]
        if edge_mask is not None:
            inwin = inwin * edge_mask.astype(inwin.dtype)
        if stack:
            e_tilde, agg = fused_relational_layer_tt(
                self.fused_window, self.fused_block, self.fused_dtype, None,
                relu_edge, self.fused_save_acts,
                x, edge_attr, extras["slab_srcloc"], extras["slab_dstloc"],
                inwin, extras["slab_block_slab"], weights,
            )
        elif flat:
            flat_fn = (
                fused_relational_flat_t
                if self.segment_impl == "fused_flat_t"
                else fused_relational_flat
            )
            e_tilde, agg = flat_fn(
                self.fused_window, self.fused_block, self.fused_dtype, None,
                x, edge_attr, extras["slab_srcloc"], extras["slab_dstloc"],
                inwin, extras["slab_block_slab"], weights,
            )
        else:
            e_tilde, agg = fused_relational(
                self.fused_window, self.fused_block, self.fused_dtype, None,
                x, edge_attr, extras["slab_srcloc"], extras["slab_dstloc"],
                inwin, weights,
            )
        # overflow edges (source beyond the 3W halo / spilled slabs): XLA
        of_pos, of_mask = extras["slab_of_pos"], extras["slab_of_mask"]
        e_pad = edge_attr.shape[1] if stack else edge_attr.shape[0]
        ofp = jnp.minimum(of_pos, e_pad - 1)
        of_dst = edge_index[1][ofp]
        if stack:
            ea_of = edge_attr[:fe, ofp].T
            if relu_edge:
                ea_of = nn.relu(ea_of)
        else:
            ea_of = edge_attr[ofp]
        m_of = jnp.concatenate([x[of_dst], x[edge_index[0][ofp]], ea_of], axis=1)
        h1 = nn.relu(m_of @ w1 + b1)
        h2 = nn.relu(h1 @ w2 + b2)
        of_scale = of_mask.astype(x.dtype)
        if edge_mask is not None:
            of_scale = of_scale * edge_mask[ofp].astype(x.dtype)
        et_of = (h2 @ w3 + b3) * of_scale[:, None]
        if stack:
            e_tilde = e_tilde.at[:fo, of_pos].add(
                et_of.T.astype(e_tilde.dtype), mode="drop"
            )
        else:
            e_tilde = e_tilde.at[of_pos].add(
                et_of.astype(e_tilde.dtype), mode="drop"
            )
        agg = agg + jax.ops.segment_sum(
            et_of, of_dst, num_segments=x.shape[0]
        ).astype(agg.dtype)
        x_tilde = MLP(
            output_size=self.node_outdim,
            hidden_dim=self.node_hidden_dim,
            name="object_model",
        )(jnp.concatenate([x, agg], axis=1))
        return x_tilde, e_tilde
