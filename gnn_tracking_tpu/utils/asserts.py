"""Shape assertions (capability parity: reference utils/asserts.py)."""

from __future__ import annotations


def assert_feat_dim(feat_vec, dim: int) -> None:
    assert (
        feat_vec.shape[-1] == dim
    ), f"Expected feature dimension {dim}, got {feat_vec.shape[-1]}"
