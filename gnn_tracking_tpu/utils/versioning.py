"""Version/commit helpers (capability parity: reference utils/versioning.py),
implemented with plain git subprocess calls (no gitpython dependency)."""

from __future__ import annotations

import subprocess
from pathlib import Path

import gnn_tracking_tpu
from gnn_tracking_tpu.utils.log import logger


def get_commit_hash(path=None) -> str:
    """Git commit hash of the repository containing ``path``."""
    if path is None:
        path = Path(gnn_tracking_tpu.__file__).parent
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=str(path),
            capture_output=True,
            text=True,
            timeout=10,
            check=True,
        )
    except (subprocess.SubprocessError, FileNotFoundError):
        logger.warning("Could not find git repository at %s.", path)
        return "invalid"
    dirty = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=str(path),
        capture_output=True,
        text=True,
        timeout=10,
    ).stdout.strip()
    if dirty:
        logger.warning("Repository %s is dirty, commit hash may not be accurate.", path)
    return out.stdout.strip()


def _parse_version(v: str) -> tuple[int, ...]:
    return tuple(int(p) for p in v.split(".") if p.isdigit())


def assert_version_geq(require: str) -> None:
    assert _parse_version(gnn_tracking_tpu.__version__) >= _parse_version(require), (
        f"Please update gnn_tracking_tpu from {gnn_tracking_tpu.__version__} "
        f"to at least version {require}."
    )
