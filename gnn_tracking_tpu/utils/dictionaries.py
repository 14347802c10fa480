"""Dictionary helpers (capability parity: reference utils/dictionaries.py)."""

from __future__ import annotations

import itertools
from typing import Any, Iterable, Mapping, Sequence

import numpy as np


def add_key_prefix(dct: Mapping[str, Any], prefix: str = "") -> dict[str, Any]:
    """Return a copy of the dictionary with the prefix added to all keys."""
    return {f"{prefix}{k}": v for k, v in dct.items()}


def add_key_suffix(dct: Mapping[str, Any], suffix: str = "") -> dict[str, Any]:
    """Return a copy of the dictionary with the suffix added to all keys."""
    return {f"{k}{suffix}": v for k, v in dct.items()}


def subdict_with_prefix_stripped(dct: Mapping[str, Any], prefix: str = "") -> dict[str, Any]:
    """Return all entries whose key starts with ``prefix``, with it removed."""
    return {k[len(prefix) :]: v for k, v in dct.items() if k.startswith(prefix)}


def expand_grid(grid: Mapping[str, Sequence[Any]]) -> list[dict[str, Any]]:
    """Expand a dict of lists into a list of dicts (cartesian product)."""
    keys = list(grid)
    return [dict(zip(keys, vals)) for vals in itertools.product(*grid.values())]


def pivot_record_list(records: Iterable[Mapping[str, Any]]) -> dict[str, list[Any]]:
    """Turn a list of records into a dict of lists."""
    records = list(records)
    keys = set().union(*(r.keys() for r in records)) if records else set()
    return {k: [r.get(k) for r in records] for k in sorted(keys)}


def to_floats(dct: Mapping[str, Any]) -> dict[str, Any]:
    """Convert all array/scalar values in a (possibly nested) dict to floats."""
    out: dict[str, Any] = {}
    for k, v in dct.items():
        if isinstance(v, Mapping):
            out[k] = to_floats(v)
        elif hasattr(v, "item"):
            out[k] = float(np.asarray(v).item())
        elif isinstance(v, (int, float)):
            out[k] = float(v)
        else:
            out[k] = v
    return out


def separate_init_kwargs(
    kwargs: Mapping[str, Any], init_keys: Iterable[str]
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Split kwargs into (init kwargs, remaining kwargs)."""
    init_keys = set(init_keys)
    init = {k: v for k, v in kwargs.items() if k in init_keys}
    rest = {k: v for k, v in kwargs.items() if k not in init_keys}
    return init, rest
