"""Small math helpers (capability parity: reference utils/math.py)."""

from __future__ import annotations


def zero_division_gives_nan(numerator: float, denominator: float) -> float:
    """Division that returns NaN on zero denominator instead of raising."""
    if denominator == 0:
        return float("nan")
    return numerator / denominator
