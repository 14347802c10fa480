"""Convert parameter trees between the XLA and fused interaction-network
layouts.

``segment_impl="xla"`` stores the relational MLP as a nested flax MLP
(``relational_model/TorchLinear_{0,1,2}/{kernel,bias}``); the fused kernel
path stores flat tensors (``relational_w1/b1/w2/b2/w3/b3``). Same math, same
shapes — these helpers re-nest checkpoints so models trained with one
implementation evaluate with the other.
"""

from __future__ import annotations

from typing import Any


def _is_fused_layer(d: dict) -> bool:
    return "relational_w1" in d


def _is_mlp_layer(d: dict) -> bool:
    return "relational_model" in d


def fused_to_mlp(tree: Any) -> Any:
    """Rewrite every fused relational block into the nested-MLP layout."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        out[k] = fused_to_mlp(v)
    if _is_fused_layer(out):
        out["relational_model"] = {
            "TorchLinear_0": {
                "kernel": out.pop("relational_w1"),
                "bias": out.pop("relational_b1"),
            },
            "TorchLinear_1": {
                "kernel": out.pop("relational_w2"),
                "bias": out.pop("relational_b2"),
            },
            "TorchLinear_2": {
                "kernel": out.pop("relational_w3"),
                "bias": out.pop("relational_b3"),
            },
        }
    return out


def mlp_to_fused(tree: Any) -> Any:
    """Rewrite every nested relational MLP into the fused flat layout."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        out[k] = mlp_to_fused(v)
    if _is_mlp_layer(out) and "object_model" in out:
        mlp = out.pop("relational_model")
        if set(mlp) != {"TorchLinear_0", "TorchLinear_1", "TorchLinear_2"}:
            out["relational_model"] = mlp  # e.g. deeper MLP: leave untouched
            return out
        out["relational_w1"] = mlp["TorchLinear_0"]["kernel"]
        out["relational_b1"] = mlp["TorchLinear_0"]["bias"]
        out["relational_w2"] = mlp["TorchLinear_1"]["kernel"]
        out["relational_b2"] = mlp["TorchLinear_1"]["bias"]
        out["relational_w3"] = mlp["TorchLinear_2"]["kernel"]
        out["relational_b3"] = mlp["TorchLinear_2"]["bias"]
    return out
