"""ctypes bindings for the native (C++/OpenMP) runtime components.

The shared library is compiled on demand from ``csrc/`` with g++ and cached
next to the sources. Falls back gracefully (callers check ``available()``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from gnn_tracking_tpu.utils.log import logger

_CSRC = Path(__file__).parent.parent / "csrc"
_LIB_PATH = _CSRC / "libedgejoin.so"
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    sources = [_CSRC / "edge_join.cpp"]
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
        *[str(s) for s in sources],
        "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("Could not build native library: %s", e)
        return False
    return True


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = _CSRC / "edge_join.cpp"
    if not _LIB_PATH.exists() or (
        src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.select_edges_run.restype = ctypes.c_void_p
    lib.select_edges_run.argtypes = [
        i64p, ctypes.c_int64, i64p, ctypes.c_int64,
        f64p, f64p, f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
    ]
    lib.select_edges_count.restype = ctypes.c_int64
    lib.select_edges_count.argtypes = [ctypes.c_void_p]
    lib.select_edges_copy.restype = None
    lib.select_edges_copy.argtypes = [ctypes.c_void_p, i64p, i64p, f64p, f64p, f64p, f64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def select_edges_native(
    idx1: np.ndarray,
    idx2: np.ndarray,
    r: np.ndarray,
    phi: np.ndarray,
    z: np.ndarray,
    *,
    phi_slope_max: float,
    z0_max: float,
    dR_max: float,
    intersect_layer_r: float | None = None,
    intersect_z_bound: float = 490.975,
) -> dict[str, np.ndarray]:
    """Native layer-pair edge join. Same semantics as
    ``GraphBuilder.select_edges`` (see ``csrc/edge_join.cpp``)."""
    lib = _load()
    assert lib is not None

    idx1 = np.ascontiguousarray(idx1, dtype=np.int64)
    idx2 = np.ascontiguousarray(idx2, dtype=np.int64)
    r = np.ascontiguousarray(r, dtype=np.float64)
    phi = np.ascontiguousarray(phi, dtype=np.float64)
    z = np.ascontiguousarray(z, dtype=np.float64)

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)

    handle = lib.select_edges_run(
        idx1.ctypes.data_as(i64p), len(idx1),
        idx2.ctypes.data_as(i64p), len(idx2),
        r.ctypes.data_as(f64p), phi.ctypes.data_as(f64p), z.ctypes.data_as(f64p),
        phi_slope_max, z0_max, dR_max,
        int(intersect_layer_r is not None),
        intersect_layer_r if intersect_layer_r is not None else 0.0,
        intersect_z_bound,
    )
    n = lib.select_edges_count(handle)
    out = {
        "index_1": np.empty(n, dtype=np.int64),
        "index_2": np.empty(n, dtype=np.int64),
        "dr": np.empty(n, dtype=np.float64),
        "dphi": np.empty(n, dtype=np.float64),
        "dz": np.empty(n, dtype=np.float64),
        "dR": np.empty(n, dtype=np.float64),
    }
    lib.select_edges_copy(
        handle,
        out["index_1"].ctypes.data_as(i64p),
        out["index_2"].ctypes.data_as(i64p),
        out["dr"].ctypes.data_as(f64p),
        out["dphi"].ctypes.data_as(f64p),
        out["dz"].ctypes.data_as(f64p),
        out["dR"].ctypes.data_as(f64p),
    )
    return out
