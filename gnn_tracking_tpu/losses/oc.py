"""Object-condensation losses, TPU-native.

Re-implements the reference's two condensation-loss strategies
(``metrics/losses/oc.py``) with static shapes:

* ``condensation_loss`` — the dense strategy ("tiger",
  reference ``oc.py:252-347``): hits × objects matrices. The dynamic
  ``torch.unique`` over particle ids becomes a sort-based dense-id compaction
  with a static object-count cap ``max_n_objects``; invalid columns are
  masked. ``torch.cdist`` becomes a blocked pairwise distance.
* ``radius_graph_condensation_loss`` — the scalable strategy ("rg",
  reference ``oc.py:87-161``): repulsion only along a fixed-degree radius
  graph, attraction via a per-hit condensation-point lookup. This is the
  production path for full-detector events where N×K would blow HBM.

Both reproduce the reference's pinned values (our tests/test_losses.py) to
float64 precision.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from gnn_tracking_tpu.losses import MultiLossFct, MultiLossFctReturn
from gnn_tracking_tpu.ops.knn import radius_graph
from gnn_tracking_tpu.ops.unique import dense_unique as dense_object_index
from gnn_tracking_tpu.utils.graph_masks import get_good_node_mask_tensors

_EPS = 1e-9


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_n_objects",
        "max_n_rep",
        "noise_threshold",
        "object_block_size",
    ),
)
def condensation_loss(
    *,
    beta: jax.Array,
    x: jax.Array,
    object_id: jax.Array,
    object_mask: jax.Array,
    q_min: float,
    max_n_objects: int,
    node_mask: jax.Array | None = None,
    noise_threshold: int = 0,
    max_n_rep: int = 0,
    rng: jax.Array | None = None,
    object_block_size: int | None = None,
) -> tuple[dict[str, jax.Array], dict[str, Any]]:
    """Dense ("tiger") condensation loss. Semantics: reference ``oc.py:252-347``.

    Args:
        beta: [N] condensation likelihood in (0, 1)
        x: [N, D] clustering-space coordinates
        object_id: [N] particle id (0 = noise, < 0 = padding)
        object_mask: [N] mask of hits whose particles define objects
        q_min: minimum charge
        max_n_objects: static cap on the number of objects (columns)
        node_mask: [N] validity mask for padded graphs
        noise_threshold: ids <= threshold are noise
        max_n_rep: subsample repulsive pairs to ~this many (0 = no sampling)
        rng: PRNG key, required if max_n_rep > 0

    Returns:
        (loss_dct, extra_dct) with attractive/repulsive/coward/noise losses.
    """
    n = beta.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    object_mask = object_mask & node_mask

    unique_ids, obj_valid, n_objects = dense_object_index(
        object_id, object_mask, max_n_objects
    )
    q = jnp.arctanh(beta) ** 2 + q_min

    def block_terms(uids_blk, valid_blk, sample_rng, sampling_freq):
        """Partial loss terms for one block of objects; [N, B] matrices.

        The [hits × objects] matrices are the memory hot spot
        (SURVEY §2.9: torch.cdist n² — never materialize on HBM for big
        events); blocking bounds them to N×B.
        """
        # hits of object k attract each other — note this includes hits of
        # the object that fail the mask (reference oc.py:286 matches all).
        attractive_mask = (
            (object_id[:, None] == uids_blk[None, :])
            & node_mask[:, None]
            & valid_blk[None, :]
        )
        # Condensation point: hit with maximum charge (oc.py:292).
        alphas = jnp.argmax(q[:, None] * attractive_mask, axis=0)  # [B]
        q_k = q[alphas][None, :]
        qw = q[:, None] * q_k
        # Distances via the MXU-friendly expansion — never materializes the
        # [hits, objects, dim] difference tensor (torch.cdist replacement,
        # SURVEY §2.9).
        x_k = x[alphas]
        dist_sq = (
            jnp.sum(x * x, axis=1)[:, None]
            + jnp.sum(x_k * x_k, axis=1)[None, :]
            - 2.0 * x @ x_k.T
        )
        dist_sq = jnp.maximum(dist_sq, 0.0)
        # Safe norm: zero-distance pairs (each CP to itself) must have zero
        # gradient, like torch.cdist's backward, not NaN from sqrt'(0).
        nonzero = dist_sq > 0
        dist = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, dist_sq, 1.0)), 0.0)

        v_att = jnp.sum(jnp.where(attractive_mask, qw * dist_sq, 0.0))
        repulsive_mask = (
            (~attractive_mask) & (dist < 1) & node_mask[:, None] & valid_blk[None, :]
        )
        n_rep_blk = repulsive_mask.sum()
        if max_n_rep > 0:
            sample = jax.random.uniform(sample_rng, repulsive_mask.shape) < sampling_freq
            repulsive_mask = repulsive_mask & sample
        v_rep = jnp.sum(jnp.where(repulsive_mask, qw * (1 - dist), 0.0))
        coward = jnp.sum(jnp.where(valid_blk, 1 - beta[alphas], 0.0))
        return v_att, v_rep, n_rep_blk, coward

    n_hits = node_mask.sum()
    n_hits_oi = object_mask.sum()
    # every hit has a rep edge to every other CP except its own (oc.py:309)
    norm_rep = _EPS + (n_objects - 1) * n_hits
    # subtract n_objects to avoid double counting (oc.py:311)
    norm_att = _EPS + n_hits_oi - n_objects

    if max_n_rep > 0 and rng is None:
        msg = "max_n_rep > 0 requires an rng key"
        raise ValueError(msg)

    if object_block_size is None or object_block_size >= max_n_objects:
        sampling_freq = 1.0
        n_rep = 0
        if max_n_rep > 0:
            # count pass without sampling to determine the frequency
            _, _, n_rep, _ = block_terms(unique_ids, obj_valid, rng, 1.0)
            sampling_freq = jnp.minimum(max_n_rep / jnp.maximum(n_rep, 1), 1.0)
            sampling_freq = jnp.where(n_rep > max_n_rep, sampling_freq, 1.0)
        v_att, v_rep, n_rep_r, coward_sum = block_terms(
            unique_ids,
            obj_valid,
            rng if rng is not None else jax.random.PRNGKey(0),
            sampling_freq if max_n_rep > 0 else 1.0,
        )
        n_rep = n_rep_r if max_n_rep == 0 else n_rep
    else:
        if max_n_objects % object_block_size != 0:
            msg = "max_n_objects must be divisible by object_block_size"
            raise ValueError(msg)
        n_blocks = max_n_objects // object_block_size
        uids_b = unique_ids.reshape(n_blocks, object_block_size)
        valid_b = obj_valid.reshape(n_blocks, object_block_size)
        base_rng = rng if rng is not None else jax.random.PRNGKey(0)
        rngs_b = jax.random.split(base_rng, n_blocks)

        if max_n_rep > 0:
            counts = jax.lax.map(
                lambda args: block_terms(args[0], args[1], args[2], 1.0)[2],
                (uids_b, valid_b, rngs_b),
            )
            n_rep = counts.sum()
            sampling_freq = jnp.minimum(max_n_rep / jnp.maximum(n_rep, 1), 1.0)
            sampling_freq = jnp.where(n_rep > max_n_rep, sampling_freq, 1.0)
        else:
            sampling_freq = 1.0

        partials = jax.lax.map(
            lambda args: block_terms(args[0], args[1], args[2], sampling_freq),
            (uids_b, valid_b, rngs_b),
        )
        v_att = partials[0].sum()
        v_rep = partials[1].sum()
        n_rep = partials[2].sum() if max_n_rep == 0 else n_rep
        coward_sum = partials[3].sum()

    if max_n_rep > 0:
        norm_rep = norm_rep * sampling_freq
    v_att = v_att / norm_att
    v_rep = v_rep / norm_rep
    l_coward = coward_sum / jnp.maximum(n_objects, 1)
    is_noise = (object_id <= noise_threshold) & (object_id >= 0) & node_mask
    l_noise = jnp.sum(jnp.where(is_noise, beta, 0.0)) / jnp.maximum(is_noise.sum(), 1)

    loss_dct = {
        "attractive": v_att,
        "repulsive": v_rep,
        "coward": l_coward,
        "noise": l_noise,
    }
    extra_dct = {"n_rep": n_rep}
    return loss_dct, extra_dct


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_n_objects",
        "max_num_neighbors",
        "noise_threshold",
        # static so the survivor-filter radius kernel (fixed trace-time τ)
        # is reachable from inside this jit — ops/knn.py radius_graph
        # dispatch; a traced radius would silently fall back to full top-k
        "radius_threshold",
    ),
)
def radius_graph_condensation_loss(
    *,
    beta: jax.Array,
    x: jax.Array,
    object_id: jax.Array,
    object_mask: jax.Array,
    q_min: float,
    radius_threshold: float,
    max_num_neighbors: int,
    max_n_objects: int,
    node_mask: jax.Array | None = None,
    noise_threshold: int = 0,
) -> tuple[dict[str, jax.Array], dict[str, Any]]:
    """Radius-graph ("rg") condensation loss. Semantics: reference
    ``oc.py:87-161``: repulsion only along radius-graph edges touching a
    condensation point; attraction of each masked hit to its own CP.
    """
    n = beta.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    object_mask = object_mask & node_mask

    unique_ids, obj_valid, n_objects = dense_object_index(
        object_id, object_mask, max_n_objects
    )
    # CP selection among *masked* hits only (oc.py:33-43: sorted beta over
    # mask). beta→q is monotone, so argmax beta == argmax q.
    member_mask = (
        (object_id[:, None] == unique_ids[None, :])
        & object_mask[:, None]
        & obj_valid[None, :]
    )
    q = jnp.arctanh(beta) ** 2 + q_min
    # Shift scores to be positive so argmax ignores non-members (q > 0).
    alphas = jnp.argmax(q[:, None] * member_mask, axis=0)  # [K]
    is_cp = jnp.zeros((n,), dtype=bool).at[jnp.where(obj_valid, alphas, n)].set(
        True, mode="drop"
    )

    # --- attraction: every masked non-CP hit to its object's CP ---
    # column of each hit's object (valid only where a member)
    col = jnp.argmax(member_mask, axis=1)
    has_col = member_mask.any(axis=1)
    cp_of_hit = alphas[col]
    d2_att = jnp.sum((x - x[cp_of_hit]) ** 2, axis=-1)
    att_mask = has_col & ~is_cp
    va = jnp.sum(jnp.where(att_mask, d2_att * q * q[cp_of_hit], 0.0))

    # --- repulsion along the radius graph (oc.py:46-69) ---
    edge_index, edge_mask, dists = radius_graph(
        x,
        radius_threshold,
        max_num_neighbors=max_num_neighbors,
        node_mask=node_mask,
        loop=False,
    )
    src, dst = edge_index[0], edge_index[1]
    rep_mask = (
        edge_mask
        & is_cp[src]
        & (object_id[src] != object_id[dst])
    )
    # sqrt(eps + d²) guards the gradient at 0 (oc.py:57)
    guarded = jnp.sqrt(_EPS + dists**2)
    vr = jnp.sum(jnp.where(rep_mask, (radius_threshold - guarded) * q[src] * q[dst], 0.0))
    vr = jnp.where(jnp.isnan(vr), 0.0, vr)

    n_hits = node_mask.sum()
    n_hits_oi = object_mask.sum()
    norm_rep = _EPS + (n_objects - 1) * n_hits
    norm_att = _EPS + n_hits_oi - n_objects

    l_coward = jnp.sum(jnp.where(obj_valid, 1 - beta[alphas], 0.0)) / jnp.maximum(
        n_objects, 1
    )
    is_noise = (object_id <= noise_threshold) & (object_id >= 0) & node_mask
    l_noise = jnp.sum(jnp.where(is_noise, beta, 0.0)) / jnp.maximum(is_noise.sum(), 1)

    losses = {
        "attractive": va / norm_att,
        "repulsive": vr / norm_rep,
        "coward": l_coward,
        "noise": l_noise,
    }
    return losses, {}


class _CondensationLossBase(MultiLossFct):
    def __init__(
        self,
        *,
        lw_repulsive: float = 1.0,
        lw_noise: float = 0.0,
        lw_coward: float = 0.0,
        q_min: float = 0.01,
        pt_thld: float = 0.9,
        max_eta: float = 4.0,
        sample_pids: float = 1.0,
        max_n_objects: int = 1024,
    ):
        self.lw_repulsive = lw_repulsive
        self.lw_noise = lw_noise
        self.lw_coward = lw_coward
        self.q_min = q_min
        self.pt_thld = pt_thld
        self.max_eta = max_eta
        self.sample_pids = sample_pids
        self.max_n_objects = max_n_objects

    def _mask(self, *, pt, particle_id, reconstructable, eta, node_mask, rng):
        mask = get_good_node_mask_tensors(
            pt=pt,
            particle_id=particle_id,
            reconstructable=reconstructable,
            eta=eta,
            pt_thld=self.pt_thld,
            max_eta=self.max_eta,
        )
        if node_mask is not None:
            mask = mask & node_mask
        if self.sample_pids < 1:
            if rng is None:
                msg = "sample_pids < 1 requires an rng key"
                raise ValueError(msg)
            mask = mask & (jax.random.uniform(rng, mask.shape) < self.sample_pids)
        return mask

    def _weights(self):
        return {
            "attractive": 1.0,
            "repulsive": self.lw_repulsive,
            "noise": self.lw_noise,
            "coward": self.lw_coward,
        }


class CondensationLossTiger(_CondensationLossBase):
    """Dense condensation loss (reference ``CondensationLossTiger``,
    ``oc.py:350-436``)."""

    def __init__(
        self, *, max_n_rep: int = 0, object_block_size: int | None = None, **kwargs
    ):
        super().__init__(**kwargs)
        self.max_n_rep = max_n_rep
        self.object_block_size = object_block_size

    def __call__(
        self,
        *,
        beta: jax.Array,
        x: jax.Array,
        particle_id: jax.Array,
        reconstructable: jax.Array,
        pt: jax.Array,
        eta: jax.Array,
        node_mask: jax.Array | None = None,
        ec_hit_mask: jax.Array | None = None,
        rng: jax.Array | None = None,
        **kwargs: Any,
    ) -> MultiLossFctReturn:
        if ec_hit_mask is not None:
            # Model applied a post-EC node mask; fold it into the validity mask
            # (reference removes the hits instead — oc.py:394-401).
            node_mask = ec_hit_mask if node_mask is None else node_mask & ec_hit_mask
        mask = self._mask(
            pt=pt,
            particle_id=particle_id,
            reconstructable=reconstructable,
            eta=eta,
            node_mask=node_mask,
            rng=rng,
        )
        losses, extra = condensation_loss(
            beta=beta,
            x=x,
            object_id=particle_id,
            object_mask=mask,
            node_mask=node_mask,
            q_min=self.q_min,
            noise_threshold=0,
            max_n_rep=self.max_n_rep,
            max_n_objects=self.max_n_objects,
            rng=rng,
            object_block_size=self.object_block_size,
        )
        return MultiLossFctReturn(
            loss_dct=losses, weight_dct=self._weights(), extra_metrics=extra
        )


class CondensationLossRG(_CondensationLossBase):
    """Radius-graph condensation loss (reference ``CondensationLossRG``,
    ``oc.py:164-248``)."""

    def __init__(self, *, max_num_neighbors: int = 256, **kwargs):
        super().__init__(**kwargs)
        self.max_num_neighbors = max_num_neighbors

    def __call__(
        self,
        *,
        beta: jax.Array,
        x: jax.Array,
        particle_id: jax.Array,
        reconstructable: jax.Array,
        pt: jax.Array,
        eta: jax.Array,
        node_mask: jax.Array | None = None,
        ec_hit_mask: jax.Array | None = None,
        rng: jax.Array | None = None,
        **kwargs: Any,
    ) -> MultiLossFctReturn:
        if ec_hit_mask is not None:
            node_mask = ec_hit_mask if node_mask is None else node_mask & ec_hit_mask
        mask = self._mask(
            pt=pt,
            particle_id=particle_id,
            reconstructable=reconstructable,
            eta=eta,
            node_mask=node_mask,
            rng=rng,
        )
        losses, extra = radius_graph_condensation_loss(
            beta=beta,
            x=x,
            object_id=particle_id,
            object_mask=mask,
            node_mask=node_mask,
            q_min=self.q_min,
            radius_threshold=1.0,
            max_num_neighbors=self.max_num_neighbors,
            max_n_objects=self.max_n_objects,
        )
        return MultiLossFctReturn(
            loss_dct=losses, weight_dct=self._weights(), extra_metrics=extra
        )


@functools.partial(jax.jit, static_argnames=("mode", "max_n_objects"))
def object_loss(
    *,
    pred: jax.Array,
    beta: jax.Array,
    truth: jax.Array,
    particle_id: jax.Array,
    mode: str = "efficiency",
    max_n_objects: int = 1024,
    node_mask: jax.Array | None = None,
) -> jax.Array:
    """β-weighted MSE on predicted per-track properties
    (reference ``ObjectLoss.object_loss``, ``oc.py:449-468``)."""
    n = beta.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    mse = jnp.sum((pred - truth) ** 2, axis=1)
    xi_base = jnp.arctanh(beta) ** 2
    if mode == "purity":
        not_noise = (particle_id != 0) & node_mask
        xi = jnp.where(not_noise, xi_base, 0.0)
        # torch.mean over the (boolean-indexed) hit array → divide by the
        # number of valid hits
        n_valid = jnp.maximum(node_mask.sum(), 1)
        return jnp.sum(xi * mse) / n_valid / jnp.sum(xi)
    if mode == "efficiency":
        unique_ids, obj_valid, n_objects = dense_object_index(
            particle_id, (particle_id > 0) & node_mask, max_n_objects
        )
        pid_masks = (
            (particle_id[:, None] == unique_ids[None, :])
            & node_mask[:, None]
            & obj_valid[None, :]
        )
        xi_p = jnp.where(pid_masks, xi_base[:, None], 0.0)
        xi_p_norm = jnp.sum(xi_p, axis=0)
        terms = jnp.sum(mse[:, None] * xi_p, axis=0)
        ratios = jnp.where(obj_valid, terms / jnp.where(obj_valid, xi_p_norm, 1.0), 0.0)
        return jnp.sum(ratios) / jnp.maximum(n_objects, 1)
    msg = f"Unknown mode: {mode}"
    raise ValueError(msg)


class ObjectLoss:
    """Loss on predicted object properties (reference ``ObjectLoss``,
    ``oc.py:439-489``)."""

    def __init__(self, mode: str = "efficiency", max_n_objects: int = 1024):
        self.mode = mode
        self.max_n_objects = max_n_objects

    def object_loss(self, *, pred, beta, truth, particle_id, node_mask=None):
        return object_loss(
            pred=pred,
            beta=beta,
            truth=truth,
            particle_id=particle_id,
            mode=self.mode,
            max_n_objects=self.max_n_objects,
            node_mask=node_mask,
        )

    def __call__(
        self,
        *,
        beta,
        pred,
        particle_id,
        track_params,
        reconstructable,
        node_mask=None,
        **kwargs,
    ):
        # The reference indexes by `reconstructable > 0` (oc.py:483-489); we
        # fold it into the validity mask instead.
        mask = reconstructable > 0
        if node_mask is not None:
            mask = mask & node_mask
        return self.object_loss(
            pred=pred,
            beta=beta,
            truth=track_params,
            particle_id=particle_id,
            node_mask=mask,
        )
