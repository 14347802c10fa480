"""Physics-exact data augmentation for training.

Tracking is azimuthally symmetric: rotating every hit by a common angle δ
around the beam axis produces an equally valid event, so a model trained on
a φ wedge (one azimuthal sector) must be exposed to rotated copies to
generalize to unseen wedges. The reference trains on many full events and
never needs this; the single-bundled-event loop here (and any
sector-partitioned training) does — round-3 held-out drill: the TC stage
memorized the 3 train sectors' φ range and scored double_majority = 0 on
the held-out sector.

The rotation acts on node features only (reference feature layout
``preprocessing/point_cloud_builder.py`` DEFAULT_FEATURES):
* ``phi`` (col 1, stored as φ/π): shifted by δ and re-wrapped;
* ``u``/``v`` (cols 4/5, conformal x/(x²+y²), y/(x²+y²), common scale):
  rotated as a 2-vector;
* ``gphi`` (col 13, global cell-direction azimuth): shifted and re-wrapped;
* everything else (r, z, η, local-frame cell features) is invariant.
Edge attributes are φ-DIFFERENCES (dr, dφ, dz, dR — reference
``graph_builder.py``) and stay untouched, as do all truth arrays.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

#: (column, kind) map of the φ-dependent DEFAULT_FEATURES entries
PHI_COLUMN = 1
UV_COLUMNS = (4, 5)
GPHI_COLUMN = 13
PHI_SCALE = float(np.pi)  # phi is stored as φ/π by the graph builder


def _wrap(angle: jax.Array) -> jax.Array:
    """Wrap to [-π, π)."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


@functools.partial(jax.jit, static_argnames=("phi_scale",))
def rotate_phi(
    x: jax.Array, delta: jax.Array, *, phi_scale: float = PHI_SCALE
) -> jax.Array:
    """Rotate the φ-dependent node-feature columns of ``x`` by ``delta``.

    ``phi_scale`` is the stored-φ convention of column 1: graph-stage
    features store φ/π (``graph_builder.py`` feature_scale), so the
    default is π; POINT-CLOUD stage features store raw radians
    (``point_cloud_builder.py`` unit feature_scale), so pass 1.0 there —
    with the wrong scale the wrap maps raw φ into [-1, 1) and the column
    no longer matches the u/v rotation (or the untransformed val data).
    """
    n_cols = x.shape[1]
    phi = _wrap(x[:, PHI_COLUMN] * phi_scale + delta) / phi_scale
    x = x.at[:, PHI_COLUMN].set(phi.astype(x.dtype))
    if n_cols > max(UV_COLUMNS):
        c, s = jnp.cos(delta), jnp.sin(delta)
        u, v = x[:, UV_COLUMNS[0]], x[:, UV_COLUMNS[1]]
        x = x.at[:, UV_COLUMNS[0]].set((c * u - s * v).astype(x.dtype))
        x = x.at[:, UV_COLUMNS[1]].set((s * u + c * v).astype(x.dtype))
    if n_cols > GPHI_COLUMN:
        gphi = _wrap(x[:, GPHI_COLUMN] + delta)
        x = x.at[:, GPHI_COLUMN].set(gphi.astype(x.dtype))
    return x


@dataclasses.dataclass
class PhiRotation:
    """Trainer ``train_transform``: random global φ rotation per step.

    Deterministic in (seed, step) so resumed runs replay the same
    augmentation stream. Rotates ``batch.x`` only — edge attributes and
    truth are rotation-invariant by construction (see module docstring).
    ``phi_scale``: see :func:`rotate_phi` — π for graph-stage features
    (φ stored as φ/π), 1.0 for point-cloud-stage features (raw radians).
    """

    seed: int = 0
    phi_scale: float = PHI_SCALE

    def __call__(self, batch, step: int):
        # SeedSequence entropy list keys the stream by (seed, step) without
        # overlap — a packed integer key collides across seeds at high step.
        delta = float(
            np.random.default_rng([self.seed, int(step)]).uniform(
                -np.pi, np.pi
            )
        )
        x = rotate_phi(batch.x, jnp.float32(delta), phi_scale=self.phi_scale)
        extras = batch.extras
        if extras and "cell_refl" in extras and x.shape[1] > GPHI_COLUMN:
            # keep the stored mirror-partner gphi (raw radians, same scale
            # as the gphi column) in the rotated frame, so a ZReflection
            # composed AFTER the rotation is still exact — the transform
            # order no longer matters.
            refl = extras["cell_refl"]
            extras = dict(extras)
            wrapped = (
                (refl[:, 1] + delta + np.pi) % (2.0 * np.pi) - np.pi
            ).astype(refl.dtype)
            if isinstance(refl, np.ndarray):  # host-ETL numpy leaves
                refl = refl.copy()
                refl[:, 1] = wrapped
            else:
                refl = refl.at[:, 1].set(wrapped)
            extras["cell_refl"] = refl
        return batch.replace(x=x, extras=extras)

#: z-dependent DEFAULT_FEATURES columns (see module docstring for layout)
Z_COLUMN = 2
ETA_RZ_COLUMN = 3
GETA_COLUMN = 12
#: graph-stage edge_attr layout is (dr, dphi, dz, dR) — only dz is z-odd
#: (dR = sqrt(deta^2 + dphi^2) is even; reference ``graph_builder.py``)
EDGE_DZ_COLUMN = 2


@jax.jit
def reflect_z(batch):
    """Reflect the event through the z=0 plane (exact detector symmetry).

    Feature action: ``z`` and ``eta_rz`` flip sign; ``geta``/``gphi`` are
    REPLACED by the precomputed mirror-module values in
    ``extras["cell_refl"]`` (the local frames of z-mirror module pairs
    differ by an in-plane axis flip, so the naive ``geta -> -geta,
    gphi -> gphi`` mapping errs by up to ~2 rad in gphi — see
    ``preprocessing/exatrkx_cell_features.py``); local cluster extents
    (leta, lphi, lx, ly, lz) are intrinsic positives and invariant; the
    truth ``eta`` flips; edge ``dz`` flips. The swap writes the OLD
    (geta, gphi) back into ``cell_refl``, making the transform an exact
    involution.

    Graphs without ``cell_refl`` (built before round 4) fall back to the
    approximate ``geta -> -geta`` mapping.
    """
    x = batch.x
    n_cols = x.shape[1]
    x = x.at[:, Z_COLUMN].multiply(-1.0)
    if n_cols > ETA_RZ_COLUMN:
        x = x.at[:, ETA_RZ_COLUMN].multiply(-1.0)
    extras = dict(batch.extras)
    if "cell_refl" in extras and n_cols > GPHI_COLUMN:
        refl = extras["cell_refl"]
        old = jnp.stack([x[:, GETA_COLUMN], x[:, GPHI_COLUMN]], axis=1)
        x = x.at[:, GETA_COLUMN].set(refl[:, 0].astype(x.dtype))
        x = x.at[:, GPHI_COLUMN].set(refl[:, 1].astype(x.dtype))
        extras["cell_refl"] = old.astype(refl.dtype)
    elif n_cols > GETA_COLUMN:
        x = x.at[:, GETA_COLUMN].multiply(-1.0)
    edge_attr = batch.edge_attr
    if edge_attr.ndim == 2 and edge_attr.shape[1] > EDGE_DZ_COLUMN:
        edge_attr = edge_attr.at[:, EDGE_DZ_COLUMN].multiply(-1.0)
    return batch.replace(
        x=x, edge_attr=edge_attr, eta=-batch.eta, extras=extras
    )


@dataclasses.dataclass
class ZReflection:
    """Trainer ``train_transform``: reflect the event in z with
    probability ``p`` per step (deterministic in (seed, step)).

    Doubles the effective φ-rotation group to the full O(2)×Z2 detector
    symmetry. Order within a ``Compose`` is immaterial: ``PhiRotation``
    co-rotates the stored mirror-frame ``cell_refl`` gphi, so reflection
    before or after a rotation yields the same exact features.
    """

    p: float = 0.5
    seed: int = 0
    _warned: bool = dataclasses.field(default=False, repr=False)

    def __call__(self, batch, step: int):
        coin = np.random.default_rng(
            [self.seed + 2_000_003, int(step)]
        ).random()
        if coin >= self.p:
            return batch
        if "cell_refl" not in (batch.extras or {}) and not self._warned:
            from gnn_tracking_tpu.utils.log import get_logger

            get_logger("ZReflection").warning(
                "batch has no cell_refl extra (graphs predate round 4?); "
                "geta/gphi use the approximate sign-flip mapping — rebuild "
                "point clouds for the exact mirror-module features"
            )
            self._warned = True
        return reflect_z(batch)


@jax.jit
def drop_hits(batch, keep: jax.Array):
    """Mask-level hit dropout: ``keep`` [N] bool is ANDed into the node
    mask, and edges / true edges incident to a dropped hit are masked out.
    Pure masking — shapes are untouched, so no recompiles (SURVEY §7:
    dynamic shapes become masks)."""
    node_mask = batch.node_mask & keep
    src, dst = batch.edge_index[0], batch.edge_index[1]
    edge_mask = batch.edge_mask & node_mask[src] & node_mask[dst]
    ta, tb = batch.true_edge_index[0], batch.true_edge_index[1]
    true_edge_mask = batch.true_edge_mask & node_mask[ta] & node_mask[tb]
    return batch.replace(
        node_mask=node_mask,
        edge_mask=edge_mask,
        true_edge_mask=true_edge_mask,
    )


@dataclasses.dataclass
class HitDropout:
    """Trainer ``train_transform``: drop each hit independently with
    probability ``p`` per step (deterministic in (seed, step)).

    Changes the graph TOPOLOGY every step (edges incident to dropped hits
    vanish), which regularizes models that would otherwise memorize
    individual hits of a small dataset — the detector analog of feature
    dropout. Physics note: real events genuinely differ in hit efficiency,
    so subsampled events are valid events (cf. the reference's
    ``PerfectEdgeClassification(tpr<1)`` noise injection,
    ``models/edge_classifier.py:124-163``).
    """

    p: float = 0.1
    seed: int = 0

    def __call__(self, batch, step: int):
        n = batch.node_mask.shape[0]
        keep_np = np.random.default_rng([self.seed + 1_000_003, int(step)]).random(n) >= self.p
        return drop_hits(batch, jnp.asarray(keep_np))


@dataclasses.dataclass
class Compose:
    """Chain train transforms left to right."""

    transforms: list

    def __post_init__(self):
        # accept {class_path, init_args} specs from YAML configs
        resolved = []
        for t in self.transforms:
            if isinstance(t, dict) and "class_path" in t:
                from gnn_tracking_tpu.training.config import obj_from_config

                t = obj_from_config(t)
            resolved.append(t)
        self.transforms = resolved

    def __call__(self, batch, step: int):
        for t in self.transforms:
            batch = t(batch, step)
        return batch
