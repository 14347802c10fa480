"""Object-condensation loss across an intra-event graph partition.

Completes the context-parallel training story (SURVEY §5.7): with one
full-detector event sharded over the ``graph`` mesh axis
(``parallel/halo.py``), the condensation loss needs *global* per-particle
reductions — the condensation point is an argmax of charge over ALL of a
particle's hits, wherever they live. This module computes the dense
("tiger") condensation loss inside ``shard_map``:

* per-object local charge maxima → ``pmax`` over the graph axis;
* condensation-point features/likelihoods → masked ``psum`` scatter;
* attractive/repulsive partial sums and normalizations → ``psum``.

Everything data-dependent but *static per event* (good-node mask, dense
object indices, counts) is precomputed on the host at partition time
(`partition_condensation`), so the device code is pure masked linear algebra.
Bit-compatible with ``losses.oc.condensation_loss`` (tested on a virtual
mesh).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.parallel.halo import ShardedGraph

_EPS = 1e-9


@struct.dataclass
class ShardedCondensationData:
    """Static per-event truth tables, sharded like the hits [P, N_loc]."""

    #: dense object column of each hit (-1 if its particle is not selected)
    obj_col: jax.Array
    #: hit counts toward the attractive normalization (good-node mask)
    object_mask: jax.Array
    #: valid (non-padding) hits
    node_mask: jax.Array
    #: noise hits (particle_id == 0)
    is_noise: jax.Array
    #: global index of each hit (tie-breaking for the CP argmax)
    global_index: jax.Array
    #: [K] object-column validity (replicated)
    obj_valid: jax.Array
    #: scalar counts (replicated)
    n_objects: jax.Array
    n_hits: jax.Array
    n_hits_oi: jax.Array


def partition_condensation(
    graph,
    sg: ShardedGraph,
    *,
    max_n_objects: int,
    pt_thld: float = 0.9,
    max_eta: float = 4.0,
    subsample_seed: int | None = None,
) -> ShardedCondensationData:
    """Host-side: build the static truth tables for the sharded loss.

    ``subsample_seed``: when the event has more good particles than
    ``max_n_objects``, randomly keep ``max_n_objects`` of them as objects
    (their hits attract; every hit still repels all condensation points) —
    the per-event static analog of the reference's ``sample_pids``
    subsampling (reference ``metrics/losses/oc.py:410-415``), which keeps
    full-detector events trainable without an [N, n_particles] blowup.
    ``None`` keeps the strict behavior (assert)."""
    pid = np.asarray(graph.particle_id)
    pt = np.asarray(graph.pt)
    eta = np.asarray(graph.eta)
    reco = np.asarray(graph.reconstructable)
    node_mask = np.asarray(graph.node_mask)

    good = (pt > pt_thld) & (pid > 0) & (reco > 0) & (np.abs(eta) < max_eta) & node_mask
    unique = np.unique(pid[good])
    if len(unique) > max_n_objects and subsample_seed is not None:
        sel = np.random.default_rng(subsample_seed).choice(
            unique, size=max_n_objects, replace=False
        )
        unique = np.sort(sel)
        good = good & np.isin(pid, unique)
    assert len(unique) <= max_n_objects, (len(unique), max_n_objects)
    col = np.searchsorted(unique, pid)
    col = np.where(
        (col < len(unique)) & (unique[np.clip(col, 0, len(unique) - 1)] == pid),
        col,
        -1,
    )
    # reference semantics: ALL hits of a selected particle attract (oc.py:286)
    obj_valid = np.arange(max_n_objects) < len(unique)

    gi = np.asarray(sg.global_index)  # [P, N_loc]
    sm = np.asarray(sg.node_mask)

    def shard_nodes(arr, fill=0):
        out = np.full(gi.shape, fill, dtype=np.asarray(arr).dtype)
        out[sm] = np.asarray(arr)[gi[sm]]
        return jnp.asarray(out)

    return ShardedCondensationData(
        obj_col=shard_nodes(col.astype(np.int32), -1),
        object_mask=shard_nodes(good, False),
        node_mask=jnp.asarray(sm),
        is_noise=shard_nodes((pid == 0) & node_mask, False),
        global_index=jnp.asarray(gi.astype(np.int32)),
        obj_valid=jnp.asarray(obj_valid),
        n_objects=jnp.asarray(len(unique), dtype=jnp.int32),
        n_hits=jnp.asarray(int(node_mask.sum()), dtype=jnp.int32),
        n_hits_oi=jnp.asarray(int(good.sum()), dtype=jnp.int32),
    )


def sharded_condensation_loss(
    beta_local: jax.Array,
    x_local: jax.Array,
    cd_local: ShardedCondensationData,
    *,
    q_min: float = 0.01,
    max_n_objects: int,
    axis_name: str | None = "graph",
) -> dict[str, jax.Array]:
    """Per-shard body (call inside ``shard_map``): the tiger condensation
    loss with cross-shard reductions. Inputs are this shard's slices
    ([N_loc], [N_loc, D], per-shard `ShardedCondensationData` views).
    Returns the (replicated) loss dict.

    ``axis_name=None``: single-shard mode — all collectives become
    identities, so the SAME loss body runs unsharded (the 1x1-mesh fast
    path; battery #26: shard_map machinery cost ~1.4 s/step at
    full-detector scale with nothing to exchange).
    """
    if axis_name is None:
        _pmax = _pmin = _psum = lambda v, _axis: v
    else:
        _pmax, _pmin, _psum = jax.lax.pmax, jax.lax.pmin, jax.lax.psum
    k = max_n_objects
    col = cd_local.obj_col  # [N_loc], -1 if not a member
    member = col >= 0
    col_safe = jnp.where(member, col, k)

    q = jnp.arctanh(beta_local) ** 2 + q_min
    q = jnp.where(cd_local.node_mask, q, 0.0)

    # ---- global condensation point per object: argmax q over ALL hits ----
    # The selection itself is non-differentiable (argmax semantics, as in the
    # reference); gradients flow through the selected values (beta_k) below.
    q_sel = jax.lax.stop_gradient(q)
    local_max = jax.ops.segment_max(
        jnp.where(member, q_sel, -jnp.inf), col_safe, num_segments=k + 1
    )[:k]
    local_max = jnp.where(jnp.isfinite(local_max), local_max, -jnp.inf)
    global_max = _pmax(local_max, axis_name)  # [K]

    # tie-break toward the smallest global hit index
    is_max_hit = member & (q_sel == global_max[col_safe.clip(0, k - 1)])
    cand_idx = jnp.where(is_max_hit, cd_local.global_index, jnp.int32(2**30))
    local_best_idx = jax.ops.segment_min(cand_idx, col_safe, num_segments=k + 1)[:k]
    global_best_idx = _pmin(local_best_idx, axis_name)  # [K]
    is_cp = is_max_hit & (cd_local.global_index == global_best_idx[col_safe.clip(0, k - 1)])

    # ---- CP features via psum scatter ----
    def cp_reduce(values):
        vals = jnp.where(is_cp.reshape((-1,) + (1,) * (values.ndim - 1)), values, 0)
        local = jax.ops.segment_sum(vals, col_safe, num_segments=k + 1)[:k]
        return _psum(local, axis_name)

    x_k = cp_reduce(x_local)  # [K, D]
    beta_k = cp_reduce(beta_local)  # [K]
    q_k = jnp.arctanh(beta_k.clip(0.0, 1.0 - 1e-12)) ** 2 + q_min
    q_k = jnp.where(cd_local.obj_valid, q_k, 0.0)

    # ---- distances of local hits to all CPs (MXU expansion) ----
    dist_sq = (
        jnp.sum(x_local * x_local, axis=1)[:, None]
        + jnp.sum(x_k * x_k, axis=1)[None, :]
        - 2.0 * x_local @ x_k.T
    )
    dist_sq = jnp.maximum(dist_sq, 0.0)
    nonzero = dist_sq > 0
    dist = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, dist_sq, 1.0)), 0.0)

    attractive = (
        (col[:, None] == jnp.arange(k)[None, :]) & member[:, None]
    ) & cd_local.obj_valid[None, :]
    qw = q[:, None] * q_k[None, :]
    v_att = _psum(
        jnp.sum(jnp.where(attractive, qw * dist_sq, 0.0)), axis_name
    )

    repulsive = (
        (~attractive)
        & (dist < 1)
        & cd_local.node_mask[:, None]
        & cd_local.obj_valid[None, :]
    )
    v_rep = _psum(
        jnp.sum(jnp.where(repulsive, qw * (1 - dist), 0.0)), axis_name
    )

    coward = jnp.sum(jnp.where(cd_local.obj_valid, 1 - beta_k, 0.0)) / jnp.maximum(
        cd_local.n_objects, 1
    )
    noise_sum = _psum(
        jnp.sum(jnp.where(cd_local.is_noise, beta_local, 0.0)), axis_name
    )
    noise_count = _psum(cd_local.is_noise.sum(), axis_name)

    n_obj = cd_local.n_objects
    norm_rep = _EPS + (n_obj - 1) * cd_local.n_hits
    norm_att = _EPS + cd_local.n_hits_oi - n_obj
    return {
        "attractive": v_att / norm_att,
        "repulsive": v_rep / norm_rep,
        "coward": coward,
        "noise": noise_sum / jnp.maximum(noise_count, 1),
    }


def make_sharded_condensation(
    mesh: Mesh,
    *,
    max_n_objects: int,
    q_min: float = 0.01,
    axis_name: str = "graph",
) -> Callable:
    """jitted ``(beta [P, N_loc], x [P, N_loc, D], cd) -> loss dict`` over the
    graph mesh axis."""
    from jax import shard_map

    spec_sharded = P(axis_name)
    spec_repl = P()

    cd_specs = ShardedCondensationData(
        obj_col=spec_sharded,
        object_mask=spec_sharded,
        node_mask=spec_sharded,
        is_noise=spec_sharded,
        global_index=spec_sharded,
        obj_valid=spec_repl,
        n_objects=spec_repl,
        n_hits=spec_repl,
        n_hits_oi=spec_repl,
    )

    def body(beta, x, cd):
        # sharded entries arrive with a leading singleton block axis;
        # replicated ones arrive unsliced
        cd_local = ShardedCondensationData(
            obj_col=cd.obj_col[0],
            object_mask=cd.object_mask[0],
            node_mask=cd.node_mask[0],
            is_noise=cd.is_noise[0],
            global_index=cd.global_index[0],
            obj_valid=cd.obj_valid,
            n_objects=cd.n_objects,
            n_hits=cd.n_hits,
            n_hits_oi=cd.n_hits_oi,
        )
        return sharded_condensation_loss(
            beta[0],
            x[0],
            cd_local,
            q_min=q_min,
            max_n_objects=max_n_objects,
            axis_name=axis_name,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_sharded, spec_sharded, cd_specs),
        out_specs=jax.tree.map(lambda _: spec_repl, {
            "attractive": 0, "repulsive": 0, "coward": 0, "noise": 0
        }),
    )
    return jax.jit(fn)
