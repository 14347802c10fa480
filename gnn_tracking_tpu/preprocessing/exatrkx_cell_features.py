"""Detector-geometry cluster-shape features (ExaTrkX-style).

Capability parity: reference ``preprocessing/exatrkx_cell_features.py``
(itself adapted from the public ExaTrkX preprocessing). Computes, per hit,
the local and global cluster-shape direction angles (leta, lphi, lx, ly, lz,
geta, gphi) from the detector's per-module rotation matrices, thicknesses,
and pixel pitches.

TPU-first design notes: detector tables are dense ``[V, L, M, ...]`` numpy
arrays (as in the reference) built **vectorized** (no per-row iterrows loop)
and cached as ``.npz`` next to the detector CSV.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from gnn_tracking_tpu.utils.log import get_logger

cf_logger = get_logger("CF")


def preprocess_detector(detector: pd.DataFrame) -> dict[str, np.ndarray]:
    """Build dense per-(volume, layer, module) lookup arrays from the
    detector table: rotation matrices [V,L,M,3,3], thicknesses [V,L,M],
    pixel pitches [V,L,M,2]. Vectorized (reference iterates rows:
    ``exatrkx_cell_features.py:94-98,130-133,152-156``).

    Also builds ``mirror_rotations`` [V,L,M,3,3]: the rotation matrix of
    each module's z-mirror partner (the module nearest to the reflected
    center ``(cx, cy, -cz)``; every TrackML module has one within 0.5 mm
    — barrel stagger). Used for the exact z-reflection augmentation: the
    cluster-shape extents (l_u, l_v, l_w) are reflection-invariant, but
    the GLOBAL direction of the mirrored cluster is the MIRROR module's
    rotation applied to those extents, NOT ``diag(1,1,-1) @ g`` (the local
    frames of mirror pairs differ by a u- or v-axis sign flip; the naive
    mapping errs by up to 2.1 rad in gphi on the bundled event).
    """
    v = detector["volume_id"].to_numpy(dtype=int)
    l = detector["layer_id"].to_numpy(dtype=int)
    m = detector["module_id"].to_numpy(dtype=int)
    max_v, max_l, max_m = v.max() + 1, l.max() + 1, m.max() + 1

    rot = np.zeros((max_v, max_l, max_m, 3, 3))
    rot_cols = np.stack(
        [
            detector[c].to_numpy()
            for c in (
                "rot_xu", "rot_xv", "rot_xw",
                "rot_yu", "rot_yv", "rot_yw",
                "rot_zu", "rot_zv", "rot_zw",
            )
        ],
        axis=1,
    ).reshape(-1, 3, 3)
    rot[v, l, m] = rot_cols

    thicknesses = np.zeros((max_v, max_l, max_m))
    thicknesses[v, l, m] = detector["module_t"].to_numpy()

    pixel_size = np.zeros((max_v, max_l, max_m, 2))
    pixel_size[v, l, m, 0] = detector["pitch_u"].to_numpy()
    pixel_size[v, l, m, 1] = detector["pitch_v"].to_numpy()

    centers = detector[["cx", "cy", "cz"]].to_numpy(dtype=float)
    props = detector[["pitch_u", "pitch_v", "module_t"]].to_numpy(dtype=float)
    mirror_rot_rows = _mirror_rotation_rows(centers, rot_cols, props)
    mirror_rot = np.zeros((max_v, max_l, max_m, 3, 3))
    mirror_rot[v, l, m] = mirror_rot_rows

    return {
        "rotations": rot,
        "thicknesses": thicknesses,
        "pixel_size": pixel_size,
        "mirror_rotations": mirror_rot,
    }


#: matching tolerance for z-mirror module centers (mm). TrackML mirror
#: partners land within 0.5 mm of the reflected center (barrel stagger).
_MIRROR_TOL_MM = 1.0


def _mirror_rotation_rows(
    centers: np.ndarray, rotations: np.ndarray, props: np.ndarray | None = None
) -> np.ndarray:
    """Per detector row, the rotation of the z-mirror partner module.

    Falls back to ``diag(1,1,-1) @ R`` (flip the global z of the
    direction) for modules with no partner within tolerance — none in
    TrackML, but keeps non-mirror-symmetric geometries functional.
    ``props`` rows are (pitch_u, pitch_v, module_t): pushing the original
    cluster extents through the partner's rotation is only exact when the
    partner shares pixel pitch and thickness, so a property mismatch also
    demotes the pair to the approximation (with the warning below).
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(centers)
    dist, j = tree.query(centers * np.array([1.0, 1.0, -1.0]))
    out = rotations[j].copy()
    missing = dist > _MIRROR_TOL_MM
    if props is not None:
        missing |= ~np.isclose(props, props[j], rtol=1e-6).all(axis=1)
    if missing.any():
        n_far = int((dist > _MIRROR_TOL_MM).sum())
        cf_logger.warning(
            "%d modules use the diag(1,1,-1) z-reflection approximation "
            "(%d with no partner within %.1f mm, %d with a partner whose "
            "pitch/thickness differs)",
            int(missing.sum()),
            n_far,
            _MIRROR_TOL_MM,
            int(missing.sum()) - n_far,
        )
        flip = np.diag([1.0, 1.0, -1.0])
        out[missing] = np.einsum("ij,njk->nik", flip, rotations[missing])
    return out


#: process-level memo: (resolved path, mtime) -> (csv table, dense arrays).
#: Re-constructing a builder (bench reps, per-range SLURM workers, tests)
#: skips the ~0.7 s decompress of the dense cache.
_DETECTOR_MEMO: dict[tuple[str, float], tuple[pd.DataFrame, dict]] = {}


def load_detector(detector_path: Path) -> tuple[pd.DataFrame, dict[str, np.ndarray]]:
    """Load the detector CSV + cached dense arrays (cache written atomically
    via a temp file + rename; the reference tolerates a write race with "xb"
    mode — ``exatrkx_cell_features.py:24-45``)."""
    detector_path = Path(detector_path)
    key = (str(detector_path.resolve()), detector_path.stat().st_mtime)
    if key in _DETECTOR_MEMO:
        return _DETECTOR_MEMO[key]
    detector_orig = pd.read_csv(detector_path)
    cache = detector_path.parent / (detector_path.stem + "_dense.npz")
    if cache.exists():
        with np.load(cache) as data:
            dense = {k: data[k] for k in data.files}
        # cache written before mirror_rotations existed: rebuild below
        if "mirror_rotations" in dense:
            out = detector_orig, dense
            _DETECTOR_MEMO[key] = out
            return out
        cf_logger.info("Detector cache lacks mirror_rotations; rebuilding")
    cf_logger.info("Building dense detector arrays...")
    detector = preprocess_detector(detector_orig)
    tmp = cache.with_suffix(f".tmp{np.random.randint(1 << 31)}.npz")
    try:
        np.savez_compressed(tmp, **detector)
        tmp.rename(cache)
    except OSError:
        cf_logger.warning("Could not write detector cache (continuing without)")
    _DETECTOR_MEMO[key] = (detector_orig, detector)
    return detector_orig, detector


def cartesian_to_spherical(x, y, z):
    r3 = np.sqrt(x**2 + y**2 + z**2)
    phi = np.arctan2(y, x)
    theta = np.arccos(z / r3)
    return r3, theta, phi


def theta_to_eta(theta):
    return -np.log(np.tan(0.5 * theta))


def get_cluster_shapes(
    hits: pd.DataFrame, cells: pd.DataFrame, detector: dict[str, np.ndarray]
) -> pd.DataFrame:
    """Per-hit cluster extents in local module coordinates and their local /
    global direction angles (reference ``get_all_local_angles`` +
    ``get_all_rotated`` + ``extract_dir_new``,
    ``exatrkx_cell_features.py:174-250``)."""
    grouped = cells.groupby("hit_id")
    ch0 = grouped["ch0"].agg(["min", "max"])
    ch1 = grouped["ch1"].agg(["min", "max"])
    nb_u = (ch0["max"] - ch0["min"] + 1).reindex(hits["hit_id"]).to_numpy()
    nb_v = (ch1["max"] - ch1["min"] + 1).reindex(hits["hit_id"]).to_numpy()

    vols = hits["volume_id"].to_numpy(dtype=int)
    layers = hits["layer_id"].to_numpy(dtype=int)
    modules = hits["module_id"].to_numpy(dtype=int)

    pitch = detector["pixel_size"][vols, layers, modules]
    thickness = detector["thicknesses"][vols, layers, modules]

    l_u = nb_u * pitch[:, 0]
    l_v = nb_v * pitch[:, 1]
    l_w = 2 * thickness

    dirs = np.stack([l_u, l_v, l_w], axis=1)[:, :, None]
    rotations = detector["rotations"][vols, layers, modules]
    g_dirs = np.matmul(rotations, dirs).squeeze(2)

    _, g_theta, g_phi = cartesian_to_spherical(*g_dirs.T)
    _, l_theta, l_phi = cartesian_to_spherical(l_u, l_v, l_w)

    out = pd.DataFrame(
        {
            "hit_id": hits["hit_id"].to_numpy(),
            "leta": theta_to_eta(l_theta),
            "lphi": l_phi,
            "lx": l_u,
            "ly": l_v,
            "lz": l_w,
            "geta": theta_to_eta(g_theta),
            "gphi": g_phi,
        }
    )
    # Exact z-reflection companions: the global cluster direction this hit
    # would have in the z-mirrored event — the MIRROR module's rotation
    # applied to the (reflection-invariant) local extents. Consumed by the
    # ZReflection augmentation (utils/augmentation.py) via the point
    # cloud's ``cell_refl`` extra.
    if "mirror_rotations" in detector:
        m_rot = detector["mirror_rotations"][vols, layers, modules]
        g_refl = np.matmul(m_rot, dirs).squeeze(2)
        _, gr_theta, gr_phi = cartesian_to_spherical(*g_refl.T)
        out["geta_refl"] = theta_to_eta(gr_theta)
        out["gphi_refl"] = gr_phi
    return out


def augment_hit_features(
    hits: pd.DataFrame, cells: pd.DataFrame, detector_proc: dict[str, np.ndarray]
) -> pd.DataFrame:
    """Attach cell counts/values and cluster-shape angles to the hits table
    (reference ``augment_hit_features``, ``exatrkx_cell_features.py:253-267``)."""
    grouped = cells.groupby("hit_id")["value"]
    counts = grouped.count().reindex(hits["hit_id"]).to_numpy(dtype=np.float32)
    vals = grouped.sum().reindex(hits["hit_id"]).to_numpy(dtype=np.float32)
    angles = get_cluster_shapes(hits, cells, detector_proc)
    hits = hits.merge(angles, on="hit_id", how="left")
    hits["cell_count"] = counts
    hits["cell_val"] = vals
    return hits
